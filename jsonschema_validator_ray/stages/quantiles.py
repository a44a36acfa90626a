"""Exact distributed order statistics (discrete quantiles).

`state/tdigest` gives mergeable APPROXIMATE quantiles for the stats sketch
path; this stage computes EXACT ones — ``quantile_disc`` semantics (the
data element at ascending rank ``ceil(q·n) − 1``, verified against DuckDB)
— without a global sort:

1. one aggregate pass → (count, min, max) of the non-null values;
2. one histogram pass PER REFINEMENT LEVEL → per-batch partial counts over
   ``num_buckets`` equal-width bins for EVERY live range at that level,
   merged by one tiny ``groupby(range·bin).sum`` (the classic
   partial-aggregation shape — the corpus never funnels to the driver);
3. the cumulative histograms locate the bin holding each target rank; a
   bin larger than ``gather_limit`` is REFINED with the next level's
   histogram restricted to its value range (equal values short-circuit: a
   zero-width range IS the answer), so pathological skew costs extra
   scans, never driver memory; all terminal bins across all levels are
   collected in ONE final filter pass (expected n/B rows per bin).

Wall cost for k quantiles: 3 streaming scans total in the common case
(count, histogram, gather) — independent of k — plus one histogram scan
per refinement level on skew. Compare a distributed sort: one all-to-all
exchange of the WHOLE column vs scans that move only counts.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _minmax_count(ds, column: str) -> tuple[int, float, float]:
    """(non-null count, min, max) in one streaming pass of partial rows
    (one row per block — driver-safe at any corpus size)."""

    def partial(b: pa.Table) -> pa.Table:
        col = pc.cast(b.column(column), pa.float64())
        # NaN is treated as null throughout this module: the histogram and
        # gather ranges exclude it via comparisons, so it must not inflate
        # n here either (a NaN-counted n pushes target ranks past cum[-1])
        v = pc.drop_null(col).to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        n = int(v.size)
        return pa.table({
            "n": pa.array([n], type=pa.int64()),
            "lo": pa.array([float(v.min()) if n else None],
                           type=pa.float64()),
            "hi": pa.array([float(v.max()) if n else None],
                           type=pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        return 0, math.nan, math.nan
    return n, float(parts["lo"].min()), float(parts["hi"].max())


def _in_range(v: np.ndarray, lo: float, hi: float,
              closed: bool) -> np.ndarray:
    return (v >= lo) & ((v <= hi) if closed else (v < hi))


def _bin_counts_multi(ds, column: str, ranges: list, num_buckets: int
                      ) -> np.ndarray:
    """Histogram counts for EVERY range in one streaming pass.
    ``ranges``: [(lo, hi, closed)] — [lo, hi) bins, [lo, hi] when closed;
    values outside all ranges are dropped (the caller's rank offsets
    account for them). → int64[len(ranges), num_buckets]."""
    edges = [np.linspace(lo, hi, num_buckets + 1) for lo, hi, _ in ranges]

    def partial(b: pa.Table) -> pa.Table:
        col = pc.cast(b.column(column), pa.float64())
        v = pc.drop_null(col).to_numpy(zero_copy_only=False)
        keys, cnts = [], []
        for rid, (lo, hi, closed) in enumerate(ranges):
            vv = v[_in_range(v, lo, hi, closed)]
            if vv.size == 0:
                continue
            idx = np.clip(np.searchsorted(edges[rid], vv, side="right") - 1,
                          0, num_buckets - 1)
            u, c = np.unique(idx, return_counts=True)
            keys.append(rid * num_buckets + u)
            cnts.append(c)
        if not keys:
            return pa.table({"k": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        return pa.table({
            "k": pa.array(np.concatenate(keys).astype(np.int64)),
            "cnt": pa.array(np.concatenate(cnts).astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    counts = np.zeros(len(ranges) * num_buckets, dtype=np.int64)
    # partial size is bounded by blocks × nonzero bins; below the
    # threshold a driver-side pandas sum skips a whole shuffle execution
    # (~2 s fixed cost in this sandbox); above it (10^5+ blocks at real
    # scale) the tiny groupby keeps the driver out of the merge
    if _block_count(ds) <= 512:
        df = partials.to_pandas()
        if len(df):
            s = df.groupby("k")["cnt"].sum()
            counts[s.index.to_numpy()] = s.to_numpy()
    else:
        merged = partials.groupby("k").sum("cnt").to_pandas()
        if len(merged):
            counts[merged["k"].to_numpy()] = merged["sum(cnt)"].to_numpy()
    return counts.reshape(len(ranges), num_buckets)


def _block_count(ds) -> int:
    try:
        n = ds.num_blocks()
        return n if n is not None else 1 << 30
    except Exception:
        return 1 << 30


def _gather_multi(ds, column: str, bins: list) -> "list[np.ndarray]":
    """Values of every terminal bin in one streaming pass, sorted per bin.
    ``bins``: [(lo, hi, closed)], pairwise disjoint; total size bounded by
    the caller (≤ #bins × gather_limit)."""

    def pick(b: pa.Table) -> pa.Table:
        col = pc.cast(b.column(column), pa.float64())
        v = pc.drop_null(col).to_numpy(zero_copy_only=False)
        ids, vals = [], []
        for bid, (lo, hi, closed) in enumerate(bins):
            vv = v[_in_range(v, lo, hi, closed)]
            if vv.size:
                ids.append(np.full(vv.size, bid, dtype=np.int64))
                vals.append(vv)
        if not ids:
            return pa.table({"bid": pa.array([], type=pa.int64()),
                             "val": pa.array([], type=pa.float64())})
        return pa.table({"bid": pa.array(np.concatenate(ids)),
                         "val": pa.array(np.concatenate(vals))})

    df = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    out = []
    for bid in range(len(bins)):
        vals = (df.loc[df["bid"] == bid, "val"].to_numpy()
                if len(df) and "val" in df.columns else np.array([]))
        out.append(np.sort(vals))
    return out


def exact_quantiles(ds, column: str, qs: list[float], *,
                    num_buckets: int = 4096,
                    gather_limit: int = 2_000_000,
                    max_refine: int = 4) -> "dict[float, float | None]":
    """→ {q: value} — exact ``quantile_disc`` over a Dataset column.

    NaN is treated as NULL (excluded from n and every bin). DuckDB
    instead orders NaN after every number — a documented divergence on
    NaN-bearing float columns; integer and NaN-free columns are
    bit-identical.

    ``gather_limit`` bounds driver memory: a located bin with more rows
    refines recursively (next level's batched histogram restricted to the
    bin's value range) before gathering; ``max_refine`` caps the depth
    (beyond it the gather happens anyway — at that point the bin is a
    pathological point mass that the equal-bounds short-circuit usually
    catches first)."""
    n, glo, ghi = _minmax_count(ds, column)
    if n == 0:
        return {q: None for q in qs}
    # DuckDB quantile_disc rank (verified): ascending index ceil(q·n) − 1
    out: dict[float, float | None] = {}
    # work item: (lo, hi, closed, base, [(q, global_rank), ...]) where
    # base = count of values strictly below the range; ``closed`` ⇔ the
    # upper bound is inclusive (true only while the range ends at the
    # global max — interior bins are half-open, and gather must match the
    # binning exactly or ranks shift)
    work = [(glo, ghi, True, 0,
             [(q, max(int(np.ceil(q * n)) - 1, 0)) for q in set(qs)])]
    terminal: list = []      # (lo, hi, closed, base, [(q, rank)])
    depth = 0
    while work:
        next_work = []
        ranges = [(w[0], w[1], w[2]) for w in work]
        # zero-width ranges and depth/size cutoffs go straight to terminal
        live_idx = []
        for i, (lo, hi, closed, base, qr) in enumerate(work):
            if lo == hi:
                for q, _ in qr:
                    out[q] = lo
            elif depth >= max_refine:
                terminal.append((lo, hi, closed, base, qr))
            else:
                live_idx.append(i)
        if not live_idx:
            break
        live = [work[i] for i in live_idx]
        counts = _bin_counts_multi(
            ds, column, [(w[0], w[1], w[2]) for w in live], num_buckets)
        for (lo, hi, closed, base, qr), row in zip(live, counts):
            cum = np.cumsum(row)
            edges = np.linspace(lo, hi, num_buckets + 1)
            by_bin: dict[int, list] = {}
            for q, rank in qr:
                b = int(np.searchsorted(cum, rank - base + 1))
                by_bin.setdefault(b, []).append((q, rank))
            for b, sub in by_bin.items():
                blo, bhi = float(edges[b]), float(edges[b + 1])
                bclosed = closed and b == num_buckets - 1
                bbase = base + (int(cum[b - 1]) if b else 0)
                item = (blo, bhi, bclosed, bbase, sub)
                if blo == bhi:
                    for q, _ in sub:
                        out[q] = blo
                elif int(row[b]) <= gather_limit:
                    terminal.append(item)
                else:
                    next_work.append(item)
        work = next_work
        depth += 1
    if terminal:
        gathered = _gather_multi(ds, column,
                                 [(t[0], t[1], t[2]) for t in terminal])
        for (lo, hi, closed, base, qr), vals in zip(terminal, gathered):
            for q, rank in qr:
                out[q] = float(vals[rank - base])
    return out


def grouped_quantiles_disc(ds, group: str, column: str, qs: list[float], *,
                           num_buckets: int = 32, batch_size: int = 65536):
    """→ Dataset (group, q_<..> …): EXACT discrete quantiles per group —
    the element at ascending rank ``ceil(q·n) − 1`` within each group
    (DuckDB ``quantile_disc`` semantics, so the oracle compares the
    returned data elements exactly).

    Partitioning contract: intended for LOW-cardinality analytical groups
    (flags, statuses, languages). Groups hash into ``num_buckets``
    buckets; every group of a bucket is solved in ONE vectorized pass
    (one sort + segment-boundary searchsorted per bucket — never a Ray
    group per key). For millions of groups or heavily skewed group sizes
    use :func:`exact_quantiles` per partition of interest instead."""
    import pandas as pd

    names = [f"q_{str(q).replace('.', '_')}" for q in qs]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {group: pd.Series([], dtype=g[group].dtype)}
        cols.update({nm: pd.Series([], dtype="float64") for nm in names})
        g = g.dropna(subset=[column])
        if g.empty:
            return pd.DataFrame(cols)
        g = g.sort_values([group, column], kind="mergesort")
        kv = g[group].to_numpy()
        x = g[column].to_numpy(np.float64)
        n = len(g)
        first = np.ones(n, dtype=bool)
        if n > 1:
            # factorize: NaN group keys fail the != boundary test
            # (NaN != NaN) and would splinter into per-row segments;
            # codes give one segment per group incl. the NULL group
            codes = pd.factorize(kv, use_na_sentinel=False)[0]
            first[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n)
        sizes = ends - starts
        out = {group: kv[starts]}
        for q, nm in zip(qs, names):
            rank = np.maximum(np.ceil(q * sizes).astype(np.int64) - 1, 0)
            out[nm] = x[starts + rank]
        return pd.DataFrame(out)

    def add_bucket(b):
        import pyarrow as pa
        import pyarrow.compute as pc

        h = pd.util.hash_pandas_object(
            b.select([group]).to_pandas()[group], index=False).to_numpy()
        kb = (h.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        return b.append_column("__kb", pa.array(kb))

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           batch_size=batch_size)
              .groupby("__kb")
              .map_groups(lambda g: per_bucket(g.drop(columns="__kb")),
                          batch_format="pandas"))


def grouped_quantiles_cont(ds, group: str, column: str, qs: list[float], *,
                           num_buckets: int = 32, batch_size: int = 65536):
    """→ Dataset (group, q_<..> …): EXACT linearly-interpolated quantiles
    per group — ``x_lo + (x_hi − x_lo)·frac`` at fractional rank
    ``q·(n−1)`` (the numpy ``linear`` / SQL ``quantile_cont`` convention).

    Float contract: the data values pass through from the Arrow column
    untouched, and the interpolation is ONE subtract + multiply + add of
    IEEE doubles with ``frac = q·(n−1) − floor(q·(n−1))`` — every term is
    the same expression a SQL oracle can spell with ``row_number`` picks,
    so results match bitwise without quantile_cont's engine internals.

    Same partitioning contract as :func:`grouped_quantiles_disc`:
    low-cardinality groups, one vectorized sort + segment pass per hash
    bucket, never a Ray group per key."""
    import pandas as pd

    names = [f"q_{str(q).replace('.', '_')}" for q in qs]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {group: pd.Series([], dtype=g[group].dtype)}
        cols.update({nm: pd.Series([], dtype="float64") for nm in names})
        g = g.dropna(subset=[column])
        if g.empty:
            return pd.DataFrame(cols)
        g = g.sort_values([group, column], kind="mergesort")
        kv = g[group].to_numpy()
        x = g[column].to_numpy(np.float64)
        n = len(g)
        first = np.ones(n, dtype=bool)
        if n > 1:
            codes = pd.factorize(kv, use_na_sentinel=False)[0]
            first[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(first)
        sizes = np.append(starts[1:], n) - starts
        out = {group: kv[starts]}
        m = (sizes - 1).astype(np.float64)        # exact below 2^53
        for q, nm in zip(qs, names):
            rf = np.float64(q) * m
            lo = np.floor(rf).astype(np.int64)
            hi = np.ceil(rf).astype(np.int64)
            frac = rf - np.floor(rf)
            xlo = x[starts + lo]
            xhi = x[starts + hi]
            out[nm] = xlo + (xhi - xlo) * frac
        return pd.DataFrame(out)

    def add_bucket(b):
        import pyarrow as pa

        h = pd.util.hash_pandas_object(
            b.select([group]).to_pandas()[group], index=False).to_numpy()
        kb = (h.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        return b.append_column("__kb", pa.array(kb))

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           batch_size=batch_size)
              .groupby("__kb")
              .map_groups(lambda g: per_bucket(g.drop(columns="__kb")),
                          batch_format="pandas"))
