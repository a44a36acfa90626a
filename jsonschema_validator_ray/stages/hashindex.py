"""Persisted content-hash index for INCREMENTAL cross-run exact dedup:
dedupe each new crawl against everything already ingested WITHOUT rescanning
the existing corpus.

This is the 100-TB shape of exact dedup over a growing corpus. A naive
re-dedup of `old ∪ new` rescans (and reshuffles) the full history every run
— at 100 TB/crawl that is O(total) per increment. The index instead stores
one 16-byte ``(content_hash, key)`` row per DISTINCT document, laid out as
``gen-<g>/hash_bucket=<b>/`` Parquet partitions:

- **bucketed** — bucket = ``content_hash & (num_buckets - 1)``, the same
  modulus the dedup shuffle uses, so a probe task reads exactly one bucket
  directory per generation (I/O ∝ index/num_buckets, parallelism =
  num_buckets regardless of corpus size);
- **generational** — each ingest appends a new ``gen-<g>/`` directory and
  atomically rewrites ``meta.json``; no in-place mutation, so a killed
  update leaves the previous index intact and readers never see a partial
  generation. Compaction = rewrite all gens as one (``compact_hash_index``).

Hashes are ``pd.util.hash_pandas_object`` (SipHash, fixed key) — stable
across processes, workers and runs, which is what makes a PERSISTED index
sound. Collision risk is ~n²/2⁶⁵ (negligible below ~10⁹ distinct docs, as
stages/dedup.dedup_exact documents); for 10¹² keys store a second
independent hash column and probe on the pair.

Sizing: at 10¹² distinct docs and ``num_buckets=65536`` a bucket is ~250 MB
per full compaction — one task's working set. ``num_buckets`` is fixed at
index creation (recorded in meta.json) so every later run buckets the same
way.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .dedup import content_hash_batch
from .util import fresh_dir, no_meta
from .util import read_meta as _read_meta
from .util import write_meta as _write_meta


def _bucket_expr(h: pa.Array, num_buckets: int) -> pa.Array:
    # mask must be a uint64 scalar: a bare python int makes Arrow try to
    # promote the uint64 column to int64 and overflow
    return pc.cast(
        pc.bit_wise_and(h, pa.scalar(num_buckets - 1, pa.uint64())),
        pa.int32())


def _distinct_hash_rows(ds, key: str, column: str, *, num_buckets: int,
                        batch_size: int):
    """→ Dataset of (content_hash, key, hash_bucket): min key per distinct
    content hash, grouped per bucket so the reduce is num_buckets pandas
    C-path tasks (never one Ray group per hash)."""

    def add(b: pa.Table) -> pa.Table:
        h = content_hash_batch(b, column)
        return pa.table({key: b.column(key), "content_hash": h,
                         "hash_bucket": _bucket_expr(h, num_buckets)})

    hashed = ds.select_columns([key, column]).map_batches(
        add, batch_format="pyarrow", batch_size=batch_size)

    def mins(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("content_hash", sort=False, as_index=False)[key].min()
        out["hash_bucket"] = g["hash_bucket"].iloc[0]
        return out

    return hashed.groupby("hash_bucket").map_groups(
        mins, batch_format="pandas")


def write_hash_index(ds, path: str, *, key: str, column: str,
                     num_buckets: int = 64, batch_size: int = 32768) -> None:
    """Create a new index at ``path`` (generation 0) from a corpus that is
    already internally deduplicated (or whose per-hash min key is the wanted
    canonical — the builder keeps min ``key`` per distinct hash either way)."""
    assert num_buckets & (num_buckets - 1) == 0, "num_buckets must be 2^k"
    rows = _distinct_hash_rows(ds, key, column, num_buckets=num_buckets,
                               batch_size=batch_size)
    gen_dir = fresh_dir(os.path.join(path, "gen-000000"))
    rows.write_parquet(gen_dir, partition_cols=["hash_bucket"])
    _write_meta(path, {"num_buckets": num_buckets, "key": key,
                       "generations": ["gen-000000"]})


def update_hash_index(ds, path: str, *, column: str,
                      batch_size: int = 32768) -> None:
    """Append a new generation with ``ds``'s distinct hashes (pass the
    SURVIVORS of :func:`dedup_exact_incremental` so the index stays one row
    per distinct content). Atomic: data lands fully before ``meta.json`` is
    replaced, so a crash mid-update leaves the old index valid."""
    meta = _read_meta(path)
    gen = f"gen-{len(meta['generations']):06d}"
    rows = _distinct_hash_rows(ds, meta["key"], column,
                               num_buckets=meta["num_buckets"],
                               batch_size=batch_size)
    rows.write_parquet(fresh_dir(os.path.join(path, gen)),
                       partition_cols=["hash_bucket"])
    meta["generations"].append(gen)
    _write_meta(path, meta)


def _bucket_hashes(path: str, generations: list[str], bucket: int
                   ) -> np.ndarray:
    """All indexed hashes of one bucket across generations — the ONLY index
    I/O a probe task does (partition-pruned directory reads)."""
    parts = []
    for gen in generations:
        d = Path(path) / gen / f"hash_bucket={bucket}"
        if d.is_dir():
            parts.append(pq.read_table(d, columns=["content_hash"])
                         .column("content_hash").to_numpy())
    if not parts:
        return np.array([], dtype=np.uint64)
    return np.concatenate(parts).astype(np.uint64, copy=False)


def dedup_exact_incremental(ds, index_path: str, *, column: str,
                            batch_size: int = 32768):
    """→ Dataset of ``ds`` rows that survive exact dedup against BOTH the
    persisted index and ``ds`` itself (min ``key`` per content value within
    the new batch, as stages/dedup.dedup_exact).

    One all-to-all exchange of the NEW data only; each bucket task loads its
    bucket's slice of the index (partition-pruned read) and drops new rows
    whose hash is already indexed via a vectorized ``np.isin``. Within the
    new data, grouping is by the VALUE, so collisions cannot merge distinct
    new contents; vs the index the hash itself is the identity (see module
    docstring for the collision budget)."""
    meta = _read_meta(index_path)
    key, num_buckets = meta["key"], meta["num_buckets"]
    generations = list(meta["generations"])

    def add_bucket(b: pa.Table) -> pa.Table:
        h = content_hash_batch(b, column)
        return (no_meta(b).append_column("content_hash", h)
                .append_column("__hb", _bucket_expr(h, num_buckets)))

    hashed = ds.map_batches(add_bucket, batch_format="pyarrow",
                            batch_size=batch_size)

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        seen = _bucket_hashes(index_path, generations,
                              int(g["__hb"].iloc[0]))
        keep = g.groupby(column, sort=False, dropna=False)[key].transform("min")
        g = g[g[key] == keep]
        fresh = ~np.isin(g["content_hash"].to_numpy().astype(np.uint64), seen)
        return g[fresh].drop(columns=["content_hash", "__hb"])

    return hashed.groupby("__hb").map_groups(survivors, batch_format="pandas")


def compact_hash_index(path: str, *, batch_size: int = 32768) -> None:
    """Merge all generations into one (min key per hash — idempotent), then
    atomically swap meta to the compacted generation. Old generation data is
    removed only AFTER the meta swap; a crash in between leaves unreferenced
    directories, never a broken index."""
    import shutil

    import ray.data

    meta = _read_meta(path)
    if len(meta["generations"]) <= 1:
        return
    old_gens = list(meta["generations"])
    # explicit file list: read_parquet accepts multiple DIRECTORIES poorly
    # (pyarrow treats list entries as files); the hive column is recomputed
    # from content_hash below so losing the dir-encoded value is fine
    files = sorted(str(f) for g in old_gens
                   for f in Path(path, g).rglob("*.parquet"))
    ds = ray.data.read_parquet(files)

    def rebucket(b: pa.Table) -> pa.Table:
        # partition column comes back from the hive layout; recompute to be
        # robust to readers that return it as a dictionary/string type
        h = pc.cast(b.column("content_hash"), pa.uint64())
        return pa.table({meta["key"]: b.column(meta["key"]),
                         "content_hash": h,
                         "hash_bucket": _bucket_expr(h, meta["num_buckets"])})

    rebucketed = ds.map_batches(rebucket, batch_format="pyarrow",
                                batch_size=batch_size)

    def mins(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("content_hash", sort=False,
                        as_index=False)[meta["key"]].min()
        out["hash_bucket"] = g["hash_bucket"].iloc[0]
        return out

    compacted = f"gen-{len(old_gens):06d}-compact"
    rebucketed.groupby("hash_bucket").map_groups(
        mins, batch_format="pandas").write_parquet(
        fresh_dir(os.path.join(path, compacted)),
        partition_cols=["hash_bucket"])
    meta["generations"] = [compacted]
    _write_meta(path, meta)
    for g in old_gens:
        shutil.rmtree(os.path.join(path, g), ignore_errors=True)


def index_size(path: str) -> int:
    """Total distinct hashes indexed (sums Parquet row counts — metadata
    only, no data read)."""
    meta = _read_meta(path)
    n = 0
    for gen in meta["generations"]:
        for f in Path(os.path.join(path, gen)).rglob("*.parquet"):
            n += pq.ParquetFile(f).metadata.num_rows
    return n
