"""Persisted vocabulary store: INCREMENTAL corpus term statistics.

Token totals and document frequencies are an exact monoid (counts add), so
a growing corpus's vocabulary can advance one ingest at a time without
rescanning history — the same generational contract as stages/hashindex:

- each generation holds one pre-aggregated ``(token, n_total, n_docs)``
  row per distinct token of that ingest, laid out as
  ``gen-<g>/vocab_bucket=<b>/`` Parquet partitions (bucket = stable hash
  of the token, fixed at creation);
- ``meta.json`` swaps atomically after the data lands;
- reads (top-k, lookups) fold the per-generation rows per bucket — a
  token lives in exactly one bucket, so per-bucket heads merged on the
  driver give the exact global top-k (stages/vocab.vocab_topk's shape,
  sourced from the store instead of the corpus).

The incremental result is arithmetic-identical to refitting on the union
(integer sums), which is what the driver query's SQL oracle checks.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

from .util import fresh_dir
from .util import read_meta as _read_meta
from .util import write_meta as _write_meta
from .vocab import _token_partials


def _gen_rows(ds, column: str, num_buckets: int, batch_size: int):
    partials = ds.map_batches(
        lambda b: _token_partials(b, column, num_buckets),
        batch_format="pyarrow", batch_size=batch_size)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("token", sort=False, as_index=False).agg(
            n_total=("n_total", "sum"), n_docs=("n_docs", "sum"))
        agg["vocab_bucket"] = np.int32(g["__bucket"].iloc[0])
        return agg

    return partials.groupby("__bucket").map_groups(fold,
                                                   batch_format="pandas")


def write_vocab_store(ds, path: str, *, column: str, num_buckets: int = 64,
                      batch_size: int = 8192) -> None:
    """Create the store at ``path`` (generation 0) from the initial
    corpus."""
    os.makedirs(path, exist_ok=True)
    gen = "gen-000000"
    _gen_rows(ds, column, num_buckets, batch_size).write_parquet(
        fresh_dir(os.path.join(path, gen)), partition_cols=["vocab_bucket"])
    _write_meta(path, {"column": column, "num_buckets": num_buckets,
                       "generations": [gen]})


def update_vocab_store(ds, path: str, *, batch_size: int = 8192) -> None:
    """Fold a new ingest's token counts into the store — one pass over the
    new rows only; atomic meta swap."""
    meta = _read_meta(path)
    gen = f"gen-{len(meta['generations']):06d}"
    _gen_rows(ds, meta["column"], meta["num_buckets"], batch_size) \
        .write_parquet(fresh_dir(os.path.join(path, gen)),
                       partition_cols=["vocab_bucket"])
    meta["generations"].append(gen)
    _write_meta(path, meta)


def _store_files(path: str, meta: dict) -> list[str]:
    return sorted(str(f) for g in meta["generations"]
                  for f in Path(path, g).rglob("*.parquet"))


def vocab_topk_from_store(path: str, k: int) -> pd.DataFrame:
    """Exact global top-k ``(token, n_total, n_docs)`` across all
    generations, ordered by ``(n_total desc, token asc)`` — identical to
    refitting stages/vocab.vocab_topk on the accumulated corpus. Reads
    only the store (distinct tokens), never the corpus; the per-bucket
    fold recomputes the bucket from the token so hive-partition readback
    types don't matter."""
    import ray.data

    meta = _read_meta(path)
    nb = meta["num_buckets"]
    ds = ray.data.read_parquet(_store_files(path, meta),
                               columns=["token", "n_total", "n_docs"])

    def rebucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column("token").to_pandas(), index=False).to_numpy()
        return b.append_column(
            "__bucket", pa.array((h % np.uint64(nb)).astype(np.int32)))

    def head_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("token", sort=False, as_index=False).agg(
            n_total=("n_total", "sum"), n_docs=("n_docs", "sum"))
        return agg.sort_values(["n_total", "token"],
                               ascending=[False, True],
                               kind="mergesort").head(k)

    heads = ds.map_batches(rebucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(head_in_bucket,
                                        batch_format="pandas").to_pandas()
    if "token" not in heads.columns:
        return pd.DataFrame({"token": pd.Series([], dtype=object),
                             "n_total": pd.Series([], dtype=np.int64),
                             "n_docs": pd.Series([], dtype=np.int64)})
    out = heads.sort_values(["n_total", "token"], ascending=[False, True],
                            kind="mergesort").head(k)
    out["n_total"] = out["n_total"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out[["token", "n_total", "n_docs"]].reset_index(drop=True)


def compact_vocab_store(path: str, *, batch_size: int = 8192) -> None:
    """Merge all generations into one (sums per token — idempotent), then
    swap meta. Keeps read cost O(distinct tokens), not O(ingests)."""
    import shutil

    import ray.data

    meta = _read_meta(path)
    if len(meta["generations"]) <= 1:
        return
    old = list(meta["generations"])
    nb = meta["num_buckets"]
    ds = ray.data.read_parquet(_store_files(path, meta),
                               columns=["token", "n_total", "n_docs"])

    def rebucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column("token").to_pandas(), index=False).to_numpy()
        return b.append_column(
            "__bucket", pa.array((h % np.uint64(nb)).astype(np.int32)))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("token", sort=False, as_index=False).agg(
            n_total=("n_total", "sum"), n_docs=("n_docs", "sum"))
        agg["vocab_bucket"] = np.int32(g["__bucket"].iloc[0])
        return agg

    compacted = f"gen-{len(old):06d}-compact"
    ds.map_batches(rebucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(fold, batch_format="pandas") \
        .write_parquet(fresh_dir(os.path.join(path, compacted)),
                       partition_cols=["vocab_bucket"])
    meta["generations"] = [compacted]
    _write_meta(path, meta)
    for g in old:
        shutil.rmtree(os.path.join(path, g), ignore_errors=True)
