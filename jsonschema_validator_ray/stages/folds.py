"""Shared bounded-cell partial fold: driver-side under the block gate,
ONE hash-bucket exchange past it.

Several pipeline queries share one shape: a fused scan whose per-batch
``partial`` tables are small cell histograms (a low-cardinality key
tuple carrying additive counts or OR-able flags) that must combine to
GLOBAL cells before tiny driver math.  Under the block gate the partials
gather driver-side and fold on the pandas C-path — measured cheaper than
any exchange at ≤512 blocks (Ray's ~2 s sort scheduling floor on tiny
data; see CLAUDE.md).  PAST the gate the partials hash-exchange on a
bucket of the cell key: every cell lands in exactly one bucket, so the
per-bucket pandas fold is already global for its cells, and only the
(cardinality-bounded) folded cells gather.  Both paths return the same
frame up to row order; path equality is pinned at ``block_gate=0`` in
tests/test_fold_cells.py.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def fold_cells(scan, partial, keys: Sequence[str], sums: Sequence[str] = (),
               maxs: Sequence[str] = (), *, block_gate: int = 512,
               n_buckets: int = 64) -> pd.DataFrame:
    """Global cells of ``partial`` over ``scan``, as a pandas frame.

    ``scan`` is a FusedParquetScan (``num_blocks()`` + ``map_batches``);
    ``partial`` maps one Arrow batch to a cell table keyed by ``keys``
    with sum-combinable columns ``sums`` and max-combinable ``maxs``.
    Row order is unspecified — callers sort.
    """
    keys = list(keys)
    aggmap = {c: "sum" for c in sums} | {c: "max" for c in maxs}

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False, sort=False).agg(aggmap)

    parts_ds = scan.map_batches(partial)
    if scan.num_blocks() <= block_gate:
        parts = parts_ds.to_pandas()
        return _fold(parts) if len(parts) else parts

    mod = np.uint64(n_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.select(keys).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "__b", pa.array((h % mod).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        out = _fold(g.drop(columns="__b"))
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    return parts_ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas") \
        .to_pandas()
