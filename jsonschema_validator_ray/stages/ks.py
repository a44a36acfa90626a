"""Kolmogorov–Smirnov two-sample test, exact and distributed.

Complements the PSI/KL drift check (stages/drift.py): KS needs no binning
choice and is sensitive to any ECDF divergence. The statistic is computed
EXACTLY in integer arithmetic — ``D = max|F_a - F_b|`` is reported as the
cross-multiplied numerator ``d_num = max|cum_a·N_b - cum_b·N_a|`` with
denominator ``N_a·N_b`` — so results are bit-identical to a SQL oracle
(no float accumulation anywhere).

Scale shape:
1. **partial** — one pandas C-path groupby per batch → (value, n_a, n_b)
   rows; the exchange carries per-value counts, never the input;
2. **combine** — per-value counts hash-exchange on value into
   ``num_buckets`` groups and fold with one vectorized groupby per bucket;
3. **order** — the combined counts (one row per DISTINCT value) go through
   a distributed ``Dataset.sort`` on value;
4. **scan** — the driver streams the sorted counts once via
   ``iter_batches`` holding O(1) state (running cumulatives + max).

The only driver-side pass is over distinct values, already aggregated and
streamed block-by-block — for continuous 100-TB columns, quantize upstream
(e.g. cents) or sample; the statistic is exact for the values given.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .util import no_meta


def _per_value_counts(ds, column: str, side_col: str, side_a, side_b,
                      num_buckets: int):
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[column].notna()]
        g = pd.DataFrame({
            "v": df[column],
            "na": (df[side_col] == side_a).astype(np.int64),
            "nb": (df[side_col] == side_b).astype(np.int64),
        }).groupby("v", sort=False, observed=True).sum().reset_index()
        return g[(g["na"] > 0) | (g["nb"] > 0)]

    partials = ds.map_batches(partial, batch_format="pandas")

    def add_bucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column("v").to_pandas(), index=False).to_numpy()
        return no_meta(b).append_column("__b", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int32)))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("v", sort=False, observed=True)[["na", "nb"]] \
            .sum().reset_index()

    return partials.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(fold, batch_format="pandas")


def ks_two_sample(ds, column: str, side_col: str, side_a, side_b, *,
                  num_buckets: int = 32) -> pd.DataFrame:
    """KS test between the ``column`` distributions of rows where
    ``side_col == side_a`` vs ``== side_b`` (nulls in ``column`` dropped).

    → one-row DataFrame ``(d_num, n_a, n_b)`` with
    ``D = d_num / (n_a * n_b)`` (also returned as float ``d``)."""
    counts = _per_value_counts(ds, column, side_col, side_a, side_b,
                               num_buckets).materialize()
    totals = counts.sum(["na", "nb"]) or {"sum(na)": 0, "sum(nb)": 0}
    ta, tb = int(totals["sum(na)"]), int(totals["sum(nb)"])
    d_num, ca, cb = 0, 0, 0
    # the cross-multiplied gap tops out at ta·tb; past ~2^62 int64 numpy
    # arithmetic would silently wrap, so big sides drop to exact
    # object-dtype Python ints (per DISTINCT value, not per row — slow
    # only in proportion to the value space)
    exact = ta * tb > (1 << 62)
    if ta and tb:
        for b in counts.sort("v").iter_batches(batch_format="pandas"):
            na = b["na"].to_numpy(np.int64)
            nb = b["nb"].to_numpy(np.int64)
            cum_a = ca + np.cumsum(na)
            cum_b = cb + np.cumsum(nb)
            if exact:
                gap = np.abs(cum_a.astype(object) * tb
                             - cum_b.astype(object) * ta)
            else:
                gap = np.abs(cum_a * tb - cum_b * ta)
            d_num = max(d_num, int(gap.max()))
            ca, cb = int(cum_a[-1]), int(cum_b[-1])
    return pd.DataFrame([{
        "d_num": d_num, "n_a": ta, "n_b": tb,
        "d": (d_num / (ta * tb)) if ta and tb else float("nan"),
    }])


def ks_two_datasets(ds_a, ds_b, column: str, *,
                    num_buckets: int = 32) -> pd.DataFrame:
    """KS test between the same column of two datasets (e.g. yesterday's
    partition vs today's): tag each side and union — one shuffle total."""
    def tag(side: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                column: b.column(column),
                "__side": pa.array([side] * b.num_rows),
            })
        return fn

    both = ds_a.map_batches(tag("a"), batch_format="pyarrow").union(
        ds_b.map_batches(tag("b"), batch_format="pyarrow"))
    return ks_two_sample(both, column, "__side", "a", "b",
                         num_buckets=num_buckets)
