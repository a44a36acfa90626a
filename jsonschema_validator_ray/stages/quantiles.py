"""Exact distributed order statistics (discrete quantiles).

`state/tdigest` gives mergeable APPROXIMATE quantiles for the stats sketch
path; this stage computes EXACT ones — ``quantile_disc`` semantics (the
data element at ascending rank ``ceil(q·n) − 1``, verified against DuckDB)
— without a global sort:

1. one aggregate pass → (count, min, max) of the non-null values;
2. one histogram pass → per-batch partial counts over ``num_buckets``
   equal-width bins, merged by a tiny ``groupby(bin).sum`` (the classic
   partial-aggregation shape — the corpus never funnels to the driver);
3. the cumulative histogram locates the bin holding each target rank;
   only those bins' rows are filtered out and gathered (expected n/B rows
   per bin). A skewed bin larger than ``gather_limit`` is REFINED with
   another histogram pass restricted to its value range (equal values
   short-circuit: a zero-width range IS the answer), so pathological skew
   costs extra scans, never driver memory.

Wall cost: 2 streaming scans + k tiny filters (3 scans per refinement
level on skew). Compare a distributed sort: one all-to-all exchange of the
WHOLE column vs scans that move only counts.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _minmax_count(ds, column: str) -> tuple[int, float, float]:
    """(non-null count, min, max) in one streaming pass of partial rows."""

    def partial(b: pa.Table) -> pa.Table:
        col = pc.cast(b.column(column), pa.float64())
        valid = pc.drop_null(col)
        n = len(valid)
        return pa.table({
            "n": pa.array([n], type=pa.int64()),
            "lo": pa.array([pc.min(valid).as_py() if n else None],
                           type=pa.float64()),
            "hi": pa.array([pc.max(valid).as_py() if n else None],
                           type=pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        return 0, math.nan, math.nan
    return n, float(parts["lo"].min()), float(parts["hi"].max())


def _bin_counts(ds, column: str, lo: float, hi: float, num_buckets: int,
                closed: bool) -> np.ndarray:
    """Histogram counts over [lo, hi) — [lo, hi] when ``closed`` — with
    values OUTSIDE the range dropped (refinement passes scan the full
    dataset; out-of-range values are already accounted for by the caller's
    rank offsets)."""
    edges = np.linspace(lo, hi, num_buckets + 1)

    def partial(b: pa.Table) -> pa.Table:
        col = pc.cast(b.column(column), pa.float64())
        v = pc.drop_null(col).to_numpy(zero_copy_only=False)
        v = v[(v >= lo) & ((v <= hi) if closed else (v < hi))]
        if v.size == 0:
            return pa.table({"bin": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        idx = np.clip(np.searchsorted(edges, v, side="right") - 1,
                      0, num_buckets - 1)
        u, c = np.unique(idx, return_counts=True)
        return pa.table({"bin": pa.array(u.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    merged = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bin").sum("cnt").to_pandas()
    counts = np.zeros(num_buckets, dtype=np.int64)
    if len(merged):
        counts[merged["bin"].to_numpy()] = merged["sum(cnt)"].to_numpy()
    return counts


def _gather_range(ds, column: str, lo: float, hi: float,
                  last: bool) -> np.ndarray:
    """Values in [lo, hi) — [lo, hi] for the last bin — as a sorted array
    (bin-sized, driver-safe by construction)."""

    def pick(b: pa.Table) -> pa.Table:
        col = pc.cast(b.column(column), pa.float64())
        m = pc.and_kleene(
            pc.greater_equal(col, lo),
            pc.less_equal(col, hi) if last else pc.less(col, hi))
        return pa.table({column: pc.drop_null(col.filter(
            pc.fill_null(m, False)))})

    vals = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    return np.sort(vals[column].to_numpy())


def exact_quantiles(ds, column: str, qs: list[float], *,
                    num_buckets: int = 4096,
                    gather_limit: int = 2_000_000,
                    max_refine: int = 4) -> "dict[float, float | None]":
    """→ {q: value} — exact ``quantile_disc`` over a Dataset column.

    ``gather_limit`` bounds driver memory: a located bin with more rows
    refines recursively (new histogram over the bin's value range) before
    gathering; ``max_refine`` caps the depth (beyond it the gather happens
    anyway — at that point the bin is a pathological point mass that the
    equal-bounds short-circuit usually catches first)."""
    n, lo, hi = _minmax_count(ds, column)
    if n == 0:
        return {q: None for q in qs}
    # DuckDB quantile_disc rank (verified): ascending index ceil(q·n) − 1
    ranks = {q: max(int(np.ceil(q * n)) - 1, 0) for q in qs}
    out: dict[float, float | None] = {}

    def resolve(q: float, rank: int, lo: float, hi: float, base: int,
                total: int, depth: int, closed: bool) -> float:
        """rank is GLOBAL; base = count of values strictly below this
        range; total = count inside it; ``closed`` ⇔ the upper bound is
        inclusive (true only while the range ends at the global max —
        interior histogram bins are half-open, and gather must match the
        binning exactly or ranks shift)."""
        if lo == hi:
            return lo
        if total <= gather_limit or depth >= max_refine:
            vals = _gather_range(ds, column, lo, hi, last=closed)
            return float(vals[rank - base])
        counts = _bin_counts(ds, column, lo, hi, num_buckets, closed)
        cum = np.cumsum(counts)
        b = int(np.searchsorted(cum, rank - base + 1))
        edges = np.linspace(lo, hi, num_buckets + 1)
        inner_base = base + (int(cum[b - 1]) if b else 0)
        return resolve(q, rank, float(edges[b]), float(edges[b + 1]),
                       inner_base, int(counts[b]), depth + 1,
                       closed and b == num_buckets - 1)

    for q in sorted(set(qs)):
        out[q] = resolve(q, ranks[q], lo, hi, 0, n, 0, True)
    return out
