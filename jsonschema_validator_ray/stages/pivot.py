"""Pivot (long → wide conditional aggregation).

``pivot_table(ds, index, pivot, values)`` turns one row per (index, pivot)
observation into one row per index with a column per pivot value — the
cross-tab every validation report wants (verdict counts per source,
violation counts per constraint per partition, revenue per status…).

Scale shape:
1. **partial** — each batch pre-aggregates with an Arrow ``group_by((index,
   pivot))``, so the exchange carries one row per (index, pivot, batch),
   never the input;
2. **pivot values** — the small partials dataset is materialized once
   (bounded by groups × batches) and its distinct pivot values become the
   global wide-column set (or pass ``pivot_values`` to skip the pass);
3. **final** — partials hash-exchange on ``index`` into ``num_buckets``
   Ray groups; each bucket folds every one of its index keys in one pandas
   C-path ``pivot_table`` (never one task per key) and emits the full
   column set, zero-filled, so block schemas agree.

Aggregations: ``sum`` / ``count`` / ``min`` / ``max`` (partial-able; count
partials fold with a final sum).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .util import no_meta

_PARTIAL_AGG = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def pivot_table(ds, index: str, pivot: str, values: str, *,
                agg: str = "sum", pivot_values: list | None = None,
                num_buckets: int = 32, fill=0):
    """→ Dataset with one row per ``index`` and a column ``{values}_{v}``
    per pivot value ``v`` (sorted), aggregated with ``agg``."""
    if agg not in _PARTIAL_AGG:
        raise ValueError(f"agg must be one of {sorted(_PARTIAL_AGG)}")

    def partial(b: pa.Table) -> pa.Table:
        g = no_meta(b).select([index, pivot, values]) \
            .group_by([index, pivot]).aggregate([(values, agg)])
        return g.rename_columns([index, pivot, "__v"])

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()

    if pivot_values is None:
        pivot_values = sorted(v for v in partials.unique(pivot)
                              if v is not None)
    out_cols = [f"{values}_{v}" for v in pivot_values]
    final = _PARTIAL_AGG[agg]

    def add_bucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column(index).to_pandas(), index=False).to_numpy()
        return b.append_column("__b", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: a null INDEX key is a group (SQL GROUP BY keeps
        # the NULL group); null PIVOT values are excluded from the column
        # set above, matching an explicit SQL PIVOT ... IN list
        wide = g.pivot_table(index=index, columns=pivot, values="__v",
                             aggfunc=final, fill_value=fill, dropna=False)
        wide = wide.reindex(columns=pivot_values, fill_value=fill)
        wide.columns = out_cols
        return wide.reset_index().drop(columns=[], errors="ignore")

    return partials.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas")
