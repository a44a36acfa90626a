"""Range-partitioned, globally-sorted Parquet output — the external-sort
primitive for merge-ready corpus layouts (binary-searchable key ranges,
sorted-merge joins against other sorted corpora, resumable range scans).

A full ``Dataset.sort`` is an all-to-all exchange whose reduce side holds
entire sorted runs; this sink keeps the classic sample-sort shape instead:

1. **sample** — one column-pruned pass collects a deterministic systematic
   sample of the key (first/evenly-spaced values per batch — no RNG, so
   reruns partition identically);
2. **splitters** — driver-side quantiles of the sample pick
   ``num_partitions - 1`` split values (frequency-balanced; a single
   mega-key still lands in one partition, as in any range partitioner);
3. **assign + exchange** — each row's partition is
   ``searchsorted(splitters, key)`` (equal keys always map to the same
   partition, so ranges never interleave), one hash-free range exchange;
4. **sort-within-partition + write** — each partition task sorts its slice
   once (stable mergesort over ``[key] + tiebreak``) and writes
   ``part-<p>.parquet`` via a temp-file + atomic rename, then the manifest
   (per-partition rows + key min/max) swaps last, so readers never see a
   partial layout and a crashed write is re-runnable.

Reading the shards in partition order yields a GLOBALLY sorted stream
(partition p's max key ≤ p+1's min by construction); ``read_sorted``
returns exactly that.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

_MANIFEST = "sorted_manifest.json"


def _sample_keys(ds, key: str, per_block: int, batch_size: int):
    """Deterministic systematic sample of the key column: up to
    ``per_block`` evenly-spaced values per batch."""
    def pick(b: pa.Table) -> pa.Table:
        col = b.column(key)
        n = len(col)
        if n == 0:
            return pa.table({key: col})
        idx = np.unique(np.linspace(0, n - 1, min(per_block, n),
                                    dtype=np.int64))
        return pa.table({key: col.take(pa.array(idx))})

    return ds.select_columns([key]).map_batches(
        pick, batch_format="pyarrow", batch_size=batch_size).to_pandas()


def write_sorted_parquet(ds, out_dir: str, key: str, *,
                         tiebreak: list[str] | None = None,
                         num_partitions: int = 64,
                         sample_per_block: int = 256,
                         batch_size: int = 65536) -> dict:
    """Write ``ds`` as ``num_partitions`` range-partitioned Parquet shards,
    each sorted by ``[key] + tiebreak`` — globally sorted when read in
    partition order. Returns the manifest dict."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    sample = _sample_keys(ds, key, sample_per_block, batch_size)
    vals = (sample[key].dropna().sort_values().to_numpy()
            if len(sample) and key in sample.columns else np.array([]))
    if len(vals) and num_partitions > 1:
        qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
        idx = np.minimum((qs * len(vals)).astype(np.int64), len(vals) - 1)
        splitters = np.unique(vals[idx])
    else:
        splitters = vals[:0]
    order_cols = [key] + list(tiebreak or [])

    def assign(b: pa.Table) -> pa.Table:
        k = b.column(key).to_numpy(zero_copy_only=False)
        p = np.searchsorted(splitters, k, side="right") \
            if len(splitters) else np.zeros(len(k), np.int64)
        return b.append_column("__p", pa.array(p.astype(np.int32)))

    def sort_write(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g["__p"].iloc[0])
        g = g.sort_values(order_cols, kind="mergesort") \
            .drop(columns=["__p"])
        final = os.path.join(out_dir, f"part-{p:05d}.parquet")
        tmp = final + ".tmp"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, final)                 # atomic, re-run-safe
        return pd.DataFrame({"partition": [p], "n_rows": [len(g)],
                             "key_min": [g[key].iloc[0]],
                             "key_max": [g[key].iloc[-1]]})

    acks = ds.map_batches(assign, batch_format="pyarrow",
                          batch_size=batch_size) \
        .groupby("__p").map_groups(sort_write, batch_format="pandas") \
        .to_pandas()
    manifest = {
        "key": key, "tiebreak": list(tiebreak or []),
        "partitions": sorted(
            ({"partition": int(r.partition), "n_rows": int(r.n_rows),
              "key_min": r.key_min if not isinstance(r.key_min, np.generic)
              else r.key_min.item(),
              "key_max": r.key_max if not isinstance(r.key_max, np.generic)
              else r.key_max.item()}
             for r in acks.itertuples()), key=lambda d: d["partition"]),
    }
    tmp = os.path.join(out_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, default=str)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))  # manifest swaps LAST
    return manifest


def sorted_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        return json.load(f)


def _sorted_files(out_dir: str) -> list[str]:
    return [os.path.join(out_dir, f"part-{p['partition']:05d}.parquet")
            for p in sorted_manifest(out_dir)["partitions"]]


def read_sorted(out_dir: str):
    """The layout back as one Dataset — same CONTENT, each block internally
    sorted, but no cross-block order guarantee: Ray's streaming executor
    does not preserve inter-file block order through consumption (measured:
    both ``read_parquet(files)`` and per-file ``union`` interleave). Use
    :func:`iter_sorted_batches` for the globally-ordered stream, or process
    partitions in parallel and order BETWEEN them via the manifest's key
    ranges."""
    import ray.data

    return ray.data.read_parquet(_sorted_files(out_dir))


def iter_sorted_batches(out_dir: str, *, batch_size: int = 65536):
    """Yield Arrow record batches in GLOBAL key order: shards are consumed
    in partition order and each shard is already internally sorted, so this
    is a pure sequential stream (no merge, no Ray session needed) — the
    natural consumption shape for a global sort (the parallel shape is
    per-partition tasks ordered by the manifest)."""
    import pyarrow.parquet as pq

    for f in _sorted_files(out_dir):
        yield from pq.ParquetFile(f).iter_batches(batch_size=batch_size)
