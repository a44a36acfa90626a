"""Chi-square contingency (independence) check between two categorical
columns — the fourth member of the distribution-check family (PSI, KL, KS
live in stages/drift and stages/ks): are ``lang`` and ``source`` (host,
shard, crawl…) independent, or does some source carry a skewed language
mix?

Distributed shape: per-batch pandas ``groupby.size`` partials (a few-KB
table per batch — raw rows never shuffle), folded per hash bucket of the
cell pair, then the FINAL cell table (|A|×|B| rows — bounded by the
category-pair count, not the corpus) is gathered to the driver for the
marginal totals, which need every cell by definition.

Float contract (repo conventions): the per-cell contribution is a pure expression
of integer counts — ``e = (rt · ct) / n`` in float64 (marginals cast to
float BEFORE the product so 10^12-row marginals cannot overflow int64),
``contrib = (o − e)·(o − e)/e`` — with NO accumulation, so the SQL oracle
spelling the identical expression tree matches bitwise. The summed
statistic is the checked column's sum; callers compare it to the
chi-square critical value for (|A|−1)(|B|−1) degrees of freedom.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def contingency_counts(ds, col_a: str, col_b: str, *,
                       num_buckets: int = 16, batch_size: int = 65536):
    """→ Dataset of (col_a, col_b, observed): exact cell counts of the
    contingency table, via per-batch partial counts + per-bucket fold
    (never one Ray group per cell). Null category values count as their
    own cell only if present in the data — they are kept verbatim."""

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([col_a, col_b]).to_pandas()
        cells = (df.groupby([col_a, col_b], sort=False, dropna=False)
                   .size().reset_index(name="observed"))
        h = pd.util.hash_pandas_object(
            cells[[col_a, col_b]], index=False).to_numpy()
        cells["__kb"] = (h.astype(np.uint64)
                         % np.uint64(num_buckets)).astype(np.int32)
        return pa.Table.from_pandas(cells, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby([col_a, col_b], sort=False, dropna=False,
                         as_index=False)["observed"].sum())
        out["observed"] = out["observed"].astype(np.int64)
        return out

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size)
              .groupby("__kb").map_groups(fold, batch_format="pandas"))


def _chi_finish(cells: pd.DataFrame, col_a: str,
                col_b: str) -> pd.DataFrame:
    """Marginal totals + per-cell expected/contrib over a GLOBAL cell
    frame (needs every cell by definition; the frame is |A|·|B|-bounded)."""
    if cells.empty:
        return pd.DataFrame(columns=[col_a, col_b, "observed", "expected",
                                     "contrib"])
    n = np.float64(cells["observed"].sum())
    rt = cells.groupby(col_a, dropna=False)["observed"].transform("sum")
    ct = cells.groupby(col_b, dropna=False)["observed"].transform("sum")
    e = rt.to_numpy(np.float64) * ct.to_numpy(np.float64) / n
    o = cells["observed"].to_numpy(np.float64)
    cells = cells[[col_a, col_b, "observed"]].copy()
    cells["expected"] = e
    cells["contrib"] = (o - e) * (o - e) / e
    return cells.sort_values([col_a, col_b]).reset_index(drop=True)


def chi_square_cells(ds, col_a: str, col_b: str, *,
                     num_buckets: int = 16,
                     batch_size: int = 65536) -> pd.DataFrame:
    """→ pandas DataFrame (col_a, col_b, observed, expected, contrib):
    per-cell chi-square contributions of the independence test. The final
    table is cell-count-sized (bounded by |A|·|B|), so the driver gather is
    safe at any corpus scale."""
    cells = contingency_counts(ds, col_a, col_b, num_buckets=num_buckets,
                               batch_size=batch_size).to_pandas()
    cells["observed"] = cells["observed"].astype(np.int64)
    return _chi_finish(cells, col_a, col_b)


def chi_square_cells_scan(scan, col_a: str, col_b: str, *,
                          block_gate: int = 512) -> pd.DataFrame:
    """Gated sibling of :func:`chi_square_cells` over a FusedParquetScan:
    per-batch cell partials fold DRIVER-SIDE under the block gate
    (skipping Ray's ~2 s sort-exchange floor on tiny cell tables —
    measured 2.4 s → ~0.4 s at sf0.1) and through the shared
    ``fold_cells`` hash-bucket exchange past it. Same output frame."""
    from .folds import fold_cells

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([col_a, col_b]).to_pandas()
        cells = (df.groupby([col_a, col_b], sort=False, dropna=False)
                   .size().reset_index(name="observed"))
        cells["observed"] = cells["observed"].astype(np.int64)
        return pa.Table.from_pandas(cells, preserve_index=False) \
            .replace_schema_metadata(None)

    cells = fold_cells(scan, partial, [col_a, col_b], sums=["observed"],
                       block_gate=block_gate)
    if len(cells):
        cells["observed"] = cells["observed"].astype(np.int64)
    return _chi_finish(cells, col_a, col_b)


def grouped_entropy(ds, group: str, value: str, *, num_buckets: int = 16,
                    batch_size: int = 65536):
    """→ Dataset ``(group, n_rows, n_values, entropy_micronats)`` — Shannon
    entropy of the ``value`` distribution within each ``group`` (language-
    mix diversity per source, the corpus-balance diagnostic).

    Exact-float contract (the integer-ln technique): per cell the only
    float op is ``floor(ln(obs/total)·10⁶)`` — one IEEE division of two
    exact int64s, one libm log, one floor — accumulated as int64
    ``obs · lp`` products; the final entropy is ONE division of those
    exact integers, so values compare bit-exactly against the SQL oracle.

    Shape: the contingency cell partials exchange once (bounded by the
    category-pair count, never the corpus), then a second group-bucket
    exchange co-locates each group's cells for the per-group fold."""

    cells = contingency_counts(ds, group, value, num_buckets=num_buckets,
                               batch_size=batch_size)

    def add_gb(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column(group).to_pandas(), index=False).to_numpy()
        return b.append_column(
            "__gb", pa.array((h.astype(np.uint64)
                              % np.uint64(num_buckets)).astype(np.int32)))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        import math

        g = g.drop(columns="__gb")
        rows = []
        for key, sub in g.groupby(group, sort=False, dropna=False):
            obs = [int(o) for o in sub["observed"].to_numpy(np.int64)]
            total = sum(obs)
            # scalar math.log, not np.log: numpy's SIMD double log can
            # diverge from libm by 1 ulp, which moves floor across an
            # integer boundary; math.log is the libm DuckDB's ln calls.
            # python-int o·lp products: ~rows·14e6 overflows int64 past
            # ~6·10^11 rows per group (cells per group are few — loop ok)
            s = sum(o * math.floor(math.log(o / total) * 1_000_000)
                    for o in obs)
            rows.append((key, total, len(obs),
                         float(-s) / float(total)))
        return pd.DataFrame(rows, columns=[group, "n_rows", "n_values",
                                           "entropy_micronats"])

    return cells.map_batches(add_gb, batch_format="pyarrow") \
        .groupby("__gb").map_groups(fold, batch_format="pandas")


def grouped_geomean(ds, group: str, value: str, *, num_buckets: int = 16,
                    batch_size: int = 65536):
    """→ Dataset ``(group, n_rows, log_gm, geo_mean)`` — per-group
    geometric mean of a POSITIVE discrete numeric column (the
    multiplicative-average shape: typical-token-count per language, mean
    compression ratio per source).

    Same integer-ln technique as :func:`grouped_entropy`, applied per
    DISTINCT VALUE instead of per row: cells (group, x, obs) exchange once
    (bounded by the distinct-pair count — the discrete-column contract),
    each cell contributes ``obs · floor(ln(x)·10⁶)`` in exact integer
    arithmetic, and the group's result is two float divisions + one exp of
    that exact ratio — each a single IEEE/libm op the SQL oracle spells
    identically. Rows with x ≤ 0 or null are excluded in both engines."""
    import math

    def to_cells(b: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(b.column(value)), pa.int64())
        t = pa.table({group: b.column(group), "x": x}).filter(
            pc.fill_null(pc.greater(x, 0), False))
        df = (t.to_pandas().groupby([group, "x"], sort=False, dropna=False)
               .size().reset_index(name="obs"))
        h = pd.util.hash_pandas_object(df[[group, "x"]],
                                       index=False).to_numpy()
        df["__kb"] = (h.astype(np.uint64)
                      % np.uint64(num_buckets)).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold_cells(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby([group, "x"], sort=False, dropna=False,
                         as_index=False)["obs"].sum())
        h = pd.util.hash_pandas_object(out[group], index=False).to_numpy()
        out["__gb"] = (h.astype(np.uint64)
                       % np.uint64(num_buckets)).astype(np.int32)
        return out

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, sub in g.groupby(group, sort=False, dropna=False):
            n = int(sub["obs"].astype(object).sum())
            t = sum(int(o) * math.floor(math.log(int(x)) * 1_000_000)
                    for o, x in zip(sub["obs"], sub["x"]))
            lg = float(t) / float(n) / 1_000_000.0
            rows.append((key, n, lg, math.exp(lg)))
        return pd.DataFrame(rows, columns=[group, "n_rows", "log_gm",
                                           "geo_mean"])

    return (ds.map_batches(to_cells, batch_format="pyarrow",
                           batch_size=batch_size)
              .groupby("__kb").map_groups(
                  lambda g: fold_cells(g.drop(columns="__kb")),
                  batch_format="pandas")
              .groupby("__gb").map_groups(
                  lambda g: per_group(g.drop(columns="__gb")),
                  batch_format="pandas"))
