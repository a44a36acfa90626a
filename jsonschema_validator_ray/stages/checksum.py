"""Order-independent table checksums — cross-run / cross-engine integrity
verification (the "did the migration/resume/compaction lose or duplicate a
row?" primitive a validation engine needs next to its verdict tables).

Definition (engine-portable by construction): each row canonicalizes to
the ``chr(31)``-joined string of its checksum columns with NULLs SKIPPED
(SQL ``concat_ws`` semantics; Arrow ``binary_join_element_wise`` with
``null_handling='skip'``), hashes to the first 15 hex chars of its md5
(60 bits — sums stay exact in DuckDB's HUGEINT and Python ints alike),
and the table checksum is the SUM of row hashes mod 2^61. Addition is
commutative, so the checksum is independent of row order, partitioning,
and block boundaries — two tables agree iff their multisets of canonical
rows agree (modulo md5 collisions and the 2^61 fold).

Scale shape: ONE streaming scan; each batch emits (group, n, sum) partial
rows bounded by the group cardinality, and the driver folds Python ints
(exchange-free at any corpus size for bounded group counts; hash-bucket
the group key first if groups are unbounded).

The md5 row loop is the deliberate cost of ENGINE-PORTABILITY: every SQL
engine has md5, so the oracle can recompute the identical checksum. A
single-engine production variant would swap in a vectorized 64-bit hash
(stages/dedup.content_hash_batch) at ~20x the throughput.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MOD = 1 << 61
_SEP = chr(31)


def _canonical(batch: pa.Table, cols: list[str]) -> list[str | None]:
    arrs = []
    for c in cols:
        a = batch.column(c)
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if not pa.types.is_string(a.type):
            a = pc.cast(a, pa.string())
        arrs.append(a)
    joined = pc.binary_join_element_wise(
        *arrs, pa.scalar(_SEP), null_handling="skip")
    return joined.to_pylist()


def _row_hashes(strings) -> np.ndarray:
    return np.fromiter(
        (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
         for s in strings), np.int64, len(strings))


class ChecksumPartial:
    """Per-batch partial: (group..., n, hsum) with hsum already folded
    mod 2^61 inside the batch."""

    def __init__(self, cols: list[str], group_cols: list[str] | None):
        self.cols = cols
        self.group_cols = group_cols or []

    def __call__(self, b: pa.Table) -> pa.Table:
        gc = self.group_cols
        empty = {g: pa.array([], b.schema.field(g).type
                             if g in b.column_names else pa.string())
                 for g in gc}
        if b.num_rows == 0:
            return pa.table({**empty,
                             "n": pa.array([], pa.int64()),
                             "hsum": pa.array([], pa.int64())})
        h = _row_hashes(_canonical(b, self.cols))
        if not gc:
            return pa.table({
                "n": pa.array([np.int64(len(h))]),
                "hsum": pa.array([np.int64(int(h.astype(object).sum())
                                           % _MOD)])})
        df = b.select(gc).to_pandas()
        df["__h"] = h
        agg = df.groupby(gc, sort=False, dropna=False)["__h"].agg(
            n="size", hsum=lambda s: int(s.astype(object).sum()) % _MOD) \
            .reset_index()
        out = {g: pa.array(agg[g]) for g in gc}
        out["n"] = pa.array(agg["n"].to_numpy().astype(np.int64))
        out["hsum"] = pa.array(agg["hsum"].to_numpy().astype(np.int64))
        return pa.table(out)


def table_checksum(ds, cols: list[str],
                   group_cols: list[str] | None = None) -> pa.Table:
    """ONE scan -> checksum table. Without ``group_cols``: one row
    (n_rows, checksum). With them: one row per group, sorted by the group
    columns. ``ds`` is a Dataset or FusedParquetScan."""
    gc = group_cols or []
    parts = ds.map_batches(ChecksumPartial(cols, gc),
                           batch_format="pyarrow").to_pandas()
    if not gc:
        n = int(parts["n"].sum()) if len(parts) else 0
        hs = int(parts["hsum"].astype(object).sum()) % _MOD if len(parts) \
            else 0
        return pa.table({"n_rows": pa.array([n], pa.int64()),
                         "checksum": pa.array([hs], pa.int64())})
    if not len(parts):
        return pa.table({**{g: pa.array([], pa.string()) for g in gc},
                         "n_rows": pa.array([], pa.int64()),
                         "checksum": pa.array([], pa.int64())})
    agg = parts.groupby(gc, sort=False, dropna=False).agg(
        n_rows=("n", "sum"),
        checksum=("hsum", lambda s: int(s.astype(object).sum()) % _MOD)) \
        .reset_index().sort_values(gc, kind="mergesort") \
        .reset_index(drop=True)
    agg["n_rows"] = agg["n_rows"].astype(np.int64)
    agg["checksum"] = agg["checksum"].astype(np.int64)
    return pa.Table.from_pandas(agg, preserve_index=False) \
        .replace_schema_metadata(None)
