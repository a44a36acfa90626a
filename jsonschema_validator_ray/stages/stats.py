"""Per-partition column statistics with partial/final sketch aggregation.

North-star component: "Per-partition column statistics (count / null-rate /
distinct via HyperLogLog sketches, min/max, t-digest quantiles)".

Pattern (SURVEY.md §7.2): a ``map_batches`` stage emits ONE partial row per
(column, batch) — exact count/null/min/max/sum plus serialized HLL + t-digest
+ histogram sketches — then a tiny ``groupby("column").map_groups`` merges
partials (one group per column). Raw values never funnel through a single
process; the shuffle moves only sketch bytes (~16 KB per partial row).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state.histogram import CategoricalHistogram, NumericHistogram
from ..state.hll import HyperLogLog
from ..state.tdigest import TDigest

PARTIAL_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("cnt", pa.int64()),
    ("nulls", pa.int64()),
    ("n_nan", pa.int64()),
    ("min_num", pa.float64()),
    ("max_num", pa.float64()),
    ("sum_num", pa.float64()),
    ("min_str", pa.string()),
    ("max_str", pa.string()),
    ("hll", pa.binary()),
    ("tdigest", pa.binary()),
    ("hist", pa.string()),
])


def _is_numeric(t: pa.DataType) -> bool:
    return pa.types.is_integer(t) or pa.types.is_floating(t)


class StatsPartial:
    """Actor/task stage: batch → one partial-stats row per column."""

    def __init__(self, columns: list[str] | None = None, hll_p: int = 14,
                 tdigest_compression: float = 100.0,
                 hist_edges: dict[str, list[float]] | None = None,
                 hist_categories: dict[str, list[str]] | None = None):
        self.columns = columns
        self.hll_p = hll_p
        self.compression = tdigest_compression
        self.hist_edges = hist_edges or {}
        self.hist_categories = hist_categories or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {f.name: [] for f in PARTIAL_SCHEMA}
        cols = self.columns or batch.column_names
        for name in cols:
            col = batch.column(name)
            t = col.type
            n = len(col)
            nulls = col.null_count
            rows["column"].append(name)
            rows["cnt"].append(n)
            rows["nulls"].append(nulls)
            n_nan = 0

            hll = HyperLogLog(self.hll_p)
            valid = col.drop_null()
            if len(valid):
                h = pd.util.hash_pandas_object(
                    valid.to_pandas(), index=False).to_numpy()
                hll.add_hashes(h.astype(np.uint64))
            rows["hll"].append(hll.to_bytes())

            if _is_numeric(t) and len(valid):
                v = valid.to_numpy(zero_copy_only=False).astype(np.float64)
                # NaN is not an Arrow null and survives drop_null; one NaN
                # would otherwise poison min/max/sum/mean AND the t-digest
                # for the whole column — treat it as missing (documented:
                # null_rate still counts only true nulls)
                n_nan = int(np.isnan(v).sum())
                v = v[~np.isnan(v)]
            else:
                v = np.empty(0)
            if _is_numeric(t) and v.size:
                rows["min_num"].append(float(v.min()))
                rows["max_num"].append(float(v.max()))
                rows["sum_num"].append(float(v.sum()))
                td = TDigest(self.compression)
                td.add_values(v)
                rows["tdigest"].append(td.to_bytes())
                rows["min_str"].append(None)
                rows["max_str"].append(None)
                edges = self.hist_edges.get(name)
                if edges is not None:
                    hist = NumericHistogram(np.asarray(edges))
                    hist.add_values(v)
                    rows["hist"].append(hist.to_json())
                else:
                    rows["hist"].append(None)
            elif (pa.types.is_string(t) or pa.types.is_large_string(t)) and len(valid):
                rows["min_num"].append(None)
                rows["max_num"].append(None)
                rows["sum_num"].append(None)
                rows["tdigest"].append(None)
                rows["min_str"].append(pc.min(valid).as_py())
                rows["max_str"].append(pc.max(valid).as_py())
                cats = self.hist_categories.get(name)
                if cats is not None:
                    hist = CategoricalHistogram(cats)
                    vc = valid.value_counts()
                    hist.add_counts({str(x["values"]): x["counts"]
                                     for x in vc.to_pylist()})
                    hist.n_null = nulls
                    rows["hist"].append(hist.to_json())
                else:
                    rows["hist"].append(None)
            else:
                for k in ("min_num", "max_num", "sum_num", "tdigest",
                          "min_str", "max_str", "hist"):
                    rows[k].append(None)
            rows["n_nan"].append(n_nan)
        return pa.table(rows, schema=PARTIAL_SCHEMA)


def merge_partials(group: pd.DataFrame) -> pd.DataFrame:
    """Per-column merge of partial rows → one final stats row."""
    name = group["column"].iloc[0]
    cnt = int(group["cnt"].sum())
    nulls = int(group["nulls"].sum())
    n_nan = int(group["n_nan"].sum())
    hll = HyperLogLog.from_bytes(group["hll"].iloc[0])
    for b in group["hll"].iloc[1:]:
        hll.merge(HyperLogLog.from_bytes(b))

    min_num = group["min_num"].dropna()
    max_num = group["max_num"].dropna()
    sum_num = group["sum_num"].dropna()
    tds = group["tdigest"].dropna()
    td = None
    if len(tds):
        td = TDigest.from_bytes(tds.iloc[0])
        for b in tds.iloc[1:]:
            td.merge(TDigest.from_bytes(b))
    hists = group["hist"].dropna()
    hist_json = None
    if len(hists):
        import json as _json

        # detect kind from the parsed payload's keys — a substring sniff
        # breaks when a CATEGORY is literally named "edges"
        first = hists.iloc[0]
        cls = (NumericHistogram if "edges" in _json.loads(first)
               else CategoricalHistogram)
        h = cls.from_json(first)
        for s in hists.iloc[1:]:
            h.merge(cls.from_json(s))
        hist_json = h.to_json()

    mins = group["min_str"].dropna()
    maxs = group["max_str"].dropna()
    return pd.DataFrame([{
        "column": name,
        "cnt": cnt,
        "nulls": nulls,
        "null_rate": nulls / cnt if cnt else 0.0,
        "distinct_est": hll.estimate(),
        "min_num": float(min_num.min()) if len(min_num) else np.nan,
        "max_num": float(max_num.max()) if len(max_num) else np.nan,
        "mean_num": (float(sum_num.sum()) / (cnt - nulls - n_nan)
                     if len(sum_num) and cnt > nulls + n_nan else np.nan),
        "min_str": mins.min() if len(mins) else None,
        "max_str": maxs.max() if len(maxs) else None,
        "p50": td.quantile(0.5) if td else np.nan,
        "p95": td.quantile(0.95) if td else np.nan,
        "p99": td.quantile(0.99) if td else np.nan,
        "hist": hist_json,
    }])


def profile(ds, **kwargs):
    """One-call dataset profile: stats row for every column (count, nulls,
    null-rate, HLL distinct, min/max, mean, t-digest quantiles) as a pandas
    DataFrame — one row per column, safe to materialize."""
    return column_stats(ds, None, **kwargs).to_pandas() \
        .sort_values("column").reset_index(drop=True)


def column_stats(ds, columns: list[str] | None = None, *,
                 hll_p: int = 14,
                 hist_edges: dict[str, list[float]] | None = None,
                 hist_categories: dict[str, list[str]] | None = None,
                 batch_size: int = 65536):
    """Dataset → one stats row per column (small result; safe to to_pandas)."""
    partial = StatsPartial(columns, hll_p=hll_p, hist_edges=hist_edges,
                           hist_categories=hist_categories)
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size)
    return partials.groupby("column").map_groups(
        merge_partials, batch_format="pandas")


def grouped_moments(ds, group: str, value: str, *, scale: int = 1,
                    batch_size: int = 65536) -> pd.DataFrame:
    """→ pandas DataFrame ``(group, n_rows, mean, std, skewness,
    kurtosis_excess)`` — per-group population mean / std / skewness / excess
    kurtosis from EXACT integer power sums (the distribution-shape check:
    a long-tailed length or score column shows up as skew/kurtosis drift
    long before min/max move).

    The value column is integerized as ``round(value·scale)`` (scale=1 for
    integral columns, 100 for 2-decimal money). Each batch emits one
    ``(group, n, Σx, Σx², Σx³, Σx⁴)`` int64 partial row per group present;
    the driver folds partials in arbitrary-precision python ints (rows are
    bounded by groups × batches) and evaluates each statistic as ONE float
    expression of exact integers:

        A  = n·S2 − S1²                                  (= n²·m2)
        B3 = n²·S3 − 3n·S1·S2 + 2·S1³                    (= n³·m3)
        B4 = n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3·S1⁴       (= n⁴·m4)
        mean = S1/n   std = √A/n   g1 = B3/(A·√A)   g2 = B4/A² − 3

    so the floats match a HUGEINT SQL oracle bitwise (no float
    accumulation; √ is IEEE-exact; each ·/÷ rounds once, identically).
    int64 partial bound: |x·scale|⁴ · batch_size < 2⁶³ — 65536 rows/batch
    is safe for |x·scale| ≤ ~6000; pass a smaller batch_size for wider
    values. The SQL side's HUGEINT ceiling (~1.7e38) caps n³·S4 — at
    ~10¹² rows per group with |x·scale| ≤ 6000 the exact python-int path
    here still holds, only the ORACLE spelling would need DECIMAL."""
    import math

    def partial(b: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(pc.multiply(b.column(value), scale)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        g = b.column(group).to_pandas()
        df = pd.DataFrame({group: g})
        df["n"] = 1
        df["s1"] = x
        x2 = x * x
        df["s2"] = x2
        df["s3"] = x2 * x
        df["s4"] = x2 * x2
        out = df.groupby(group, sort=False, dropna=False,
                         as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size).to_pandas()
    rows = []
    for key, sub in parts.groupby(group, sort=False, dropna=False):
        n = int(sub["n"].astype(object).sum())
        s1, s2, s3, s4 = (int(sub[c].astype(object).sum())
                          for c in ("s1", "s2", "s3", "s4"))
        a = n * s2 - s1 * s1
        b3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
        b4 = (n ** 3 * s4 - 4 * n * n * s1 * s3
              + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
        ad = float(a)
        rows.append((key, n,
                     float(s1) / float(n) / float(scale),
                     math.sqrt(ad) / float(n) / float(scale),
                     float(b3) / (ad * math.sqrt(ad)) if a else float("nan"),
                     float(b4) / (ad * ad) - 3.0 if a else float("nan")))
    out = pd.DataFrame(rows, columns=[group, "n_rows", "mean", "std",
                                      "skewness", "kurtosis_excess"])
    return out.sort_values(group).reset_index(drop=True)


def zscore_outliers(ds, group: str, value: str, keep_cols: list[str], *,
                    k: int = 3, scale: int = 100, batch_size: int = 65536):
    """→ Dataset of the rows whose ``value`` lies more than ``k`` population
    standard deviations from its GROUP mean — the per-group anomaly
    quarantine pass.

    The predicate is evaluated entirely in exact integers: with
    ``x = round(value·scale)``, per-group sums ``S1 = Σx``, ``S2 = Σx²``
    and count ``n``,

        |x − S1/n| > k·σ  ⟺  (n·x − S1)² > k²·(n·S2 − S1²)

    — no float ever enters the comparison, so boundary rows can't flip
    between engines (SQL spells the identical HUGEINT inequality).

    Two passes: a stats pass reduces to one (group, n, S1, S2) int64
    partial per (group, batch) folded driver-side in python ints (exact at
    any scale), then the flag scan probes the tiny broadcast per-group
    {group: (n, S1, rhs)} dict per batch. Cardinality contract: groups are
    ANALYTICAL categories (event types, languages, flags) — the flag scan
    masks once per group per batch; for millions of groups, factorize and
    gather per-row stats instead. When the int64 bound
    ``(n·|x|·scale + |S1|)² < 2⁶³`` fails for a group, that group's rows
    compare in object-dtype python-int arithmetic instead (exact, slower —
    only fires past ~10⁹ rows·cents per group)."""

    def spartial(b: pa.Table) -> pa.Table:
        m = pc.is_valid(b.column(value))
        t = b.filter(m)
        x = pc.cast(pc.round(pc.multiply(t.column(value), scale)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({group: t.column(group).to_pandas()})
        df["n"] = 1
        df["s1"] = x
        df["s2"] = x * x
        return pa.Table.from_pandas(
            df.groupby(group, sort=False, dropna=False,
                       as_index=False).sum(), preserve_index=False)

    parts = ds.map_batches(spartial, batch_format="pyarrow",
                           batch_size=batch_size).to_pandas()
    stats = {}
    for key, sub in parts.groupby(group, sort=False, dropna=False):
        n = int(sub["n"].astype(object).sum())
        s1 = int(sub["s1"].astype(object).sum())
        s2 = int(sub["s2"].astype(object).sum())
        stats[key] = (n, s1, k * k * (n * s2 - s1 * s1))

    cols = list(dict.fromkeys([*keep_cols, group, value]))

    def flag(b: pa.Table) -> pa.Table:
        m = pc.is_valid(b.column(value))
        t = b.select(cols).filter(m)
        x = pc.cast(pc.round(pc.multiply(t.column(value), scale)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        g = t.column(group).to_pandas().to_numpy()
        keep = np.zeros(len(x), dtype=bool)
        for key, (n, s1, rhs) in stats.items():
            sel = g == key
            if not sel.any():
                continue
            xs = x[sel]
            bound = (n * int(np.abs(xs).max(initial=0)) + abs(s1))
            if bound * bound < 2 ** 63 - 1:
                lhs = n * xs - s1
                keep[sel] = lhs * lhs > min(rhs, 2 ** 63 - 1)
            else:                      # exact object-int fallback
                xo = xs.astype(object)
                lhs = n * xo - s1
                keep[sel] = np.asarray(lhs * lhs > rhs, dtype=bool)
        return t.filter(pa.array(keep))

    return ds.map_batches(flag, batch_format="pyarrow",
                          batch_size=batch_size)


def grouped_slope(ds, group: str, xcol: str, ycol: str, *,
                  xscale: int = 1, yscale: int = 100,
                  batch_size: int = 32768) -> pd.DataFrame:
    """→ pandas DataFrame ``(group, n_rows, slope, intercept, r2)`` — the
    per-group least-squares line of ``ycol`` on ``xcol`` (trend checks:
    does price scale with quantity the same way in every segment?).

    Exact-float contract (the grouped_moments discipline): per batch one
    ``(group, n, Σx, Σy, Σx², Σy², Σxy)`` int64 partial row per group
    (values integerized ``round(v·scale)``), folded driver-side in python
    ints; then with num = n·Σxy − Σx·Σy, den1 = n·Σx² − (Σx)²,
    den2 = n·Σy² − (Σy)²:

        slope     = num / den1                       (one division)
        intercept = Σy/n − slope·(Σx/n)              (two divisions, one
                                                      product, one subtract)
        r2        = (num/den1)·(num/den2)            (spelled as the
                    PRODUCT of two divisions — num² would overflow a SQL
                    HUGEINT long before the python ints here care)

    every float op is a single IEEE instruction on exact integers, in the
    same order the SQL oracle spells. Scales cancel nowhere — the oracle
    uses the identical scaled integers. int64 partial bound:
    ``|x·xscale|·|y·yscale|·batch_size < 2⁶³``."""

    def spartial(b: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(pc.multiply(b.column(xcol), xscale)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(pc.round(pc.multiply(b.column(ycol), yscale)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({group: b.column(group).to_pandas()})
        df["n"] = 1
        df["sx"] = x
        df["sy"] = y
        df["sxx"] = x * x
        df["syy"] = y * y
        df["sxy"] = x * y
        return pa.Table.from_pandas(
            df.groupby(group, sort=False, dropna=False,
                       as_index=False).sum(), preserve_index=False)

    parts = ds.map_batches(spartial, batch_format="pyarrow",
                           batch_size=batch_size).to_pandas()
    rows = []
    for key, sub in parts.groupby(group, sort=False, dropna=False):
        n = int(sub["n"].astype(object).sum())
        sx, sy, sxx, syy, sxy = (int(sub[c].astype(object).sum())
                                 for c in ("sx", "sy", "sxx", "syy", "sxy"))
        num = n * sxy - sx * sy
        den1 = n * sxx - sx * sx
        den2 = n * syy - sy * sy
        slope = float(num) / float(den1) if den1 else float("nan")
        intercept = (float(sy) / float(n)
                     - slope * (float(sx) / float(n)))
        r2 = ((float(num) / float(den1)) * (float(num) / float(den2))
              if den1 and den2 else float("nan"))
        rows.append((key, n, slope, intercept, r2))
    out = pd.DataFrame(rows, columns=[group, "n_rows", "slope",
                                      "intercept", "r2"])
    return out.sort_values(group).reset_index(drop=True)
