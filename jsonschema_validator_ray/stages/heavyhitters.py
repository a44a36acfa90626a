"""Approximate heavy hitters: count-min sketch + candidate top-k.

The standard distributed recipe (Cormode & Muthukrishnan 2005): each batch
emits ONE partial row — a serialized count-min sketch of its value counts
plus its local top candidates — and the driver folds the bounded partials
(sketch bytes + ≤ 2k scalars per batch, never the column): merged-sketch
estimates over the union of local candidates pick the global top k. Any
value that is a global heavy hitter is a local top candidate in at least
one batch, so the candidate union can't miss it; CMS estimates only ever
OVERcount, so ranking by estimate keeps every true heavy hitter in view.

Use over ``vocab_topk`` (exact, one shuffle) when the value space is too
large to exchange even as distinct partials and an ε·N overcount is
acceptable — the heavy-hitter sibling of profile()'s HLL distinct.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state.cms import CountMinSketch


def _partial(column: str, candidates_per_batch: int, depth: int, width: int):
    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # drop nulls BEFORE counting: a null candidate would crash the
        # driver's sorted() candidate union (None < str) and a null is
        # not a value
        vc = col.drop_null().value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        vals = pc.struct_field(vc, "values")
        cnts = pc.struct_field(vc, "counts").to_numpy(zero_copy_only=False)
        cms = CountMinSketch(depth, width)
        pyvals = vals.to_pylist()
        cms.add_values(pyvals, cnts)
        order = np.argsort(-cnts, kind="stable")[:candidates_per_batch]
        return pa.table({
            "cms": pa.array([cms.to_bytes()], type=pa.binary()),
            "cand_vals": pa.array([[pyvals[i] for i in order]]),
        })
    return fn


def heavy_hitters(ds, column: str, k: int = 10, *, depth: int = 5,
                  width: int = 16384, candidates_per_batch: int | None = None,
                  batch_size: int = 65536) -> pd.DataFrame:
    """→ DataFrame ``(value, est_count)`` of the top-``k`` values by
    merged-CMS estimate, descending (ties by value for determinism)."""
    cand = candidates_per_batch or max(2 * k, 16)
    parts = ds.map_batches(_partial(column, cand, depth, width),
                           batch_format="pyarrow",
                           batch_size=batch_size).to_pandas()
    if parts.empty:
        return pd.DataFrame({"value": [], "est_count": []})
    merged = CountMinSketch.from_bytes(parts["cms"].iloc[0])
    for b in parts["cms"].iloc[1:]:
        merged.merge(CountMinSketch.from_bytes(b))
    candidates = sorted({v for vs in parts["cand_vals"] for v in vs})
    est = merged.estimate(candidates)
    out = pd.DataFrame({"value": candidates, "est_count": est})
    return out.sort_values(["est_count", "value"],
                           ascending=[False, True], kind="mergesort") \
        .head(k).reset_index(drop=True)


def grouped_mode(ds, group: str, value: str, *, num_buckets: int = 32,
                 batch_size: int = 65536):
    """→ Dataset (group, mode_value, mode_count): each group's most
    frequent value — the EXACT per-group heavy hitter (k=1). Count ties
    break to the smallest value, so the result is deterministic and the
    SQL oracle (row_number OVER count DESC, value ASC) matches exactly.

    Distributed shape: per-batch (group, value) partial counts (raw rows
    never shuffle), hash bucket of the GROUP so every value of a group
    meets in one task, one pandas C-path argmax pass per bucket."""

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([group, value]).to_pandas()
        # dropna=False: SQL GROUP BY keeps NULL groups/values — pandas'
        # default would silently drop those rows (latent, testdata is
        # null-free; same rule as contingency.py)
        cells = (df.groupby([group, value], sort=False, dropna=False)
                   .size().reset_index(name="c"))
        h = pd.util.hash_pandas_object(cells[group], index=False).to_numpy()
        cells["__kb"] = (h.astype(np.uint64)
                         % np.uint64(num_buckets)).astype(np.int32)
        return pa.Table.from_pandas(cells, preserve_index=False)

    def mode_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        full = (g.groupby([group, value], sort=False, as_index=False,
                          dropna=False)["c"].sum())
        full = full.sort_values([group, "c", value], kind="mergesort",
                                ascending=[True, False, True])
        out = full.drop_duplicates(group, keep="first")
        return pd.DataFrame({
            group: out[group].to_numpy(),
            "mode_value": out[value].to_numpy(),
            "mode_count": out["c"].to_numpy().astype(np.int64)})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size)
              .groupby("__kb")
              .map_groups(mode_in_bucket, batch_format="pandas"))
