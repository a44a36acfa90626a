"""Stream / corpus quality-control statistics — the anomaly-shaped checks a
production validation engine runs beside the schema gates: burst detection,
change-point scoring, graph assortativity, robust (winsorized) moments, and
token rank–frequency curves.

Exactness discipline (repo convention): every oracle-compared number is an
exact integer (counts, cents, ppm with floor division) or the SAME float
expression evaluated once over exact integers in both engines.

Scale shapes:
- :func:`burst_users_events` — per-user sliding-window max via ONE sorted
  two-pointer (vectorized searchsorted) pass per hash bucket; second
  resolution keeps the per-bucket offset trick inside int64 at any user
  cardinality.
- :func:`cusum_daily_events` — per-(type, day) count cells are
  calendar-bounded (|types| × |days|), so the change-point fold is
  driver-side on a tiny partial set; the CUSUM score ``|n·prefix_k −
  k·total|`` is the n-scaled integer spelling of the classic mean-shift
  statistic (no division anywhere).
- :func:`assortativity_custsupp` — degree–degree Pearson over the distinct
  customer↔supplier trade edges: one bucketed fact-fact join, distinct
  pairs per pair-hash bucket (so per-bucket endpoint counts are exact
  degree partials), integer moment fold, one float conversion per output.
- :func:`winsorized_mean_quantity` — the VALUE-DOMAIN compression trick:
  l_quantity has a tiny distinct-cents domain, so per-batch (flag, value)
  cell counts replace row exchanges entirely and the discrete quantile +
  clamp + mean all fold from cells.
- :func:`token_rank_freq_documents` — Zipf head of the corpus with exact
  cumulative-share ppm (stages/vocab.vocab_rank_freq).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.parquet import read_parquet


# ---- sliding-window burst detection ----------------------------------------


def burst_users_events(sf_dir: str, window_s: int = 21_600,
                       min_burst: int = 4, num_buckets: int = 32):
    """Users whose max event count inside any ``window_s``-second sliding
    window (anchored at an event, second resolution, half-open
    ``[t, t+W)``) reaches ``min_burst`` — the bot/abuse burst heuristic.

    One hash-bucket exchange of ``(user, t_sec)`` pairs; per bucket a
    single mergesort + two vectorized ``searchsorted`` calls count every
    window (duplicate timestamps handled by anchoring at the FIRST equal
    element, exactly like the SQL ``b.t >= a.t`` self-join). Users are
    offset onto disjoint second ranges (``local_code × (span+W+1)``) so one
    global searchsorted serves all users of the bucket — at second
    resolution the offsets stay far inside int64 for any real user count.
    """
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        t_us = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                       pa.int64())
        t_sec = pc.divide(t_us, 1_000_000)     # trunc ≡ floor (nonneg)
        users = b.column("user_id")
        return pa.table({
            "user_id": users, "t": t_sec,
            "__b": pc.cast(pc.bit_wise_and(users, num_buckets - 1),
                           pa.int32()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["t"].to_numpy().astype(np.int64)
        codes = pd.factorize(u, use_na_sentinel=False)[0].astype(np.int64)
        span = np.int64(int(t.max()) - int(t.min()) + window_s + 1)
        shifted = (t - t.min()) + codes * span
        lo = np.searchsorted(shifted, shifted, side="left")
        hi = np.searchsorted(shifted, shifted + window_s, side="left")
        w = hi - lo
        df = pd.DataFrame({"user_id": u, "w": w})
        agg = df.groupby("user_id", sort=False).agg(
            burst=("w", "max"), n_events=("w", "size")).reset_index()
        agg = agg[agg["burst"] >= min_burst]
        agg["burst"] = agg["burst"].astype(np.int64)
        agg["n_events"] = agg["n_events"].astype(np.int64)
        return agg[["user_id", "burst", "n_events"]]

    df = (ev.map_batches(partial, batch_format="pyarrow")
          .groupby("__b").map_groups(per_bucket, batch_format="pandas")
          ).to_pandas()
    if "user_id" not in df.columns:
        df = pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                           "burst": pd.Series([], dtype=np.int64),
                           "n_events": pd.Series([], dtype=np.int64)})
    return (df.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True))


BURST_USERS_SQL = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS t
           FROM events),
c AS (SELECT a.user_id, a.event_id, CAST(count(*) AS BIGINT) AS w
      FROM e a JOIN e b ON b.user_id = a.user_id
                       AND b.t >= a.t AND b.t < a.t + 21600
      GROUP BY 1, 2),
m AS (SELECT user_id, max(w) AS burst FROM c GROUP BY 1),
n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
      FROM e GROUP BY 1)
SELECT m.user_id, CAST(m.burst AS BIGINT) AS burst, n.n_events
FROM m JOIN n ON n.user_id = m.user_id
WHERE m.burst >= 4 ORDER BY m.user_id
"""


# ---- integer CUSUM change-point score per event type ------------------------


def cusum_daily_events(sf_dir: str):
    """Per event type: the day where the cumulative daily-count curve
    deviates most from a constant rate, with the deviation score — a CUSUM
    change-point check in EXACT integers: ``score_k = |n·prefix_k −
    k·total|`` over the k-th day (n days, total events), i.e. the classic
    ``|prefix_k − k·mean|`` scaled by n so no division ever happens.

    Per-batch (type, day) count partials are calendar-bounded (|types| ×
    |days| cells), so the fold is driver-side; ties on the max score
    resolve to the earliest day in both engines.
    """
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.strftime(pc.cast(b.column("ts"), pa.timestamp("us")),
                          format="%Y-%m-%d")
        t = pa.table({"event_type": b.column("event_type"), "day": day})
        g = t.group_by(["event_type", "day"]).aggregate([("day", "count")])
        return pa.table({"event_type": g.column("event_type"),
                         "day": g.column("day"),
                         "c": pc.cast(g.column("day_count"), pa.int64())})

    cells = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    cells = cells.groupby(["event_type", "day"], as_index=False)["c"].sum()
    rows = []
    for et, g in cells.groupby("event_type", sort=True):
        g = g.sort_values("day", kind="mergesort")
        c = [int(x) for x in g["c"]]
        n, total = len(c), sum(c)
        prefix = 0
        best_score, best_day = -1, None
        for k, (day, ck) in enumerate(zip(g["day"], c), start=1):
            prefix += ck
            score = abs(n * prefix - k * total)
            if score > best_score:
                best_score, best_day = score, day
        rows.append((et, np.int64(n), best_day, np.int64(best_score)))
    return pd.DataFrame(rows, columns=["event_type", "n_days", "peak_day",
                                       "score"])


CUSUM_DAILY_SQL = """
WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
w AS (SELECT event_type, day, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS prefix,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(c) OVER (PARTITION BY event_type) AS total
      FROM d),
s AS (SELECT event_type, CAST(n AS BIGINT) AS n_days, day,
             abs(n * prefix - k * total) AS score
      FROM w),
m AS (SELECT event_type, max(score) AS score FROM s GROUP BY 1)
SELECT s.event_type, s.n_days, min(s.day) AS peak_day,
       CAST(m.score AS BIGINT) AS score
FROM s JOIN m ON m.event_type = s.event_type AND s.score = m.score
GROUP BY 1, 2, m.score ORDER BY 1
"""


# ---- degree assortativity of the trade graph --------------------------------


def assortativity_custsupp(sf_dir: str):
    """One-row degree–degree Pearson correlation over the DISTINCT
    customer↔supplier trade edges (did high-degree customers trade with
    high-degree suppliers?). Positive = assortative mixing.

    Pipeline: lineitem pre-reduces to distinct ``(orderkey, suppkey)``;
    one bucketed join attaches ``custkey``; distinct ``(cust, supp)``
    pairs dedup inside pair-hash buckets, which makes each bucket's
    endpoint counts exact partial degrees (a pair lives in exactly one
    bucket). Degrees fold driver-side (|cust| + |supp| keys, gate
    documented), broadcast back, and integer moments fold per batch —
    arbitrary-precision on the driver, ONE float conversion per output,
    the same expression tree the HUGEINT oracle evaluates.
    """
    import ray

    from ..stages.joins import bucketed_join

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_suppkey"])

    def li_distinct(b: pa.Table) -> pa.Table:
        t = pa.table({"l_orderkey": b.column("l_orderkey"),
                      "supp": b.column("l_suppkey")})
        g = t.group_by(["l_orderkey", "supp"]).aggregate([])
        return g

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"])
    joined = bucketed_join(
        li.map_batches(li_distinct, batch_format="pyarrow"), orders,
        "l_orderkey", right_on="o_orderkey", num_buckets=16)

    def pair_partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "cust": b.column("o_custkey").to_numpy(zero_copy_only=False),
            "supp": b.column("supp").to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        h = pd.util.hash_pandas_object(
            df["cust"] * np.int64(1_000_003) + df["supp"],
            index=False).to_numpy()
        df["__b"] = (h % 32).astype(np.int32)
        return df

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["cust", "supp"])[["cust", "supp"]]

    pairs = (joined.map_batches(pair_partial, batch_format="pyarrow")
             .groupby("__b").map_groups(dedup_bucket, batch_format="pandas")
             ).materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        out = []
        for side in ("cust", "supp"):
            vc = b.column(side).combine_chunks().value_counts()
            out.append(pa.table({
                "side": pa.nulls(len(vc), pa.string()).fill_null(side),
                "key": pc.cast(pc.struct_field(vc, "values"), pa.int64()),
                "d": pc.cast(pc.struct_field(vc, "counts"), pa.int64())}))
        return pa.concat_tables(out)

    degs = (pairs.map_batches(deg_partial, batch_format="pyarrow")
            .to_pandas().groupby(["side", "key"], as_index=False)["d"].sum())
    dc = degs[degs["side"] == "cust"].set_index("key")["d"]
    dsup = degs[degs["side"] == "supp"].set_index("key")["d"]
    ref = ray.put((pa.array(dc.index.to_numpy(), pa.int64()),
                   dc.to_numpy().astype(np.int64),
                   pa.array(dsup.index.to_numpy(), pa.int64()),
                   dsup.to_numpy().astype(np.int64)))

    class Moments:
        def __init__(self, r):
            self.ck, self.cd, self.sk, self.sd = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r)

        def __call__(self, b: pa.Table) -> pa.Table:
            ci = pc.index_in(pc.cast(b.column("cust"), pa.int64()),
                             value_set=self.ck).to_numpy(
                                 zero_copy_only=False)
            si = pc.index_in(pc.cast(b.column("supp"), pa.int64()),
                             value_set=self.sk).to_numpy(
                                 zero_copy_only=False)
            x = self.cd[ci]
            y = self.sd[si]
            return pa.table({
                "n": [len(x)], "sx": [int(x.sum())], "sy": [int(y.sum())],
                "sxx": [int((x * x).sum())], "syy": [int((y * y).sum())],
                "sxy": [int((x * y).sum())]})

    parts = pairs.map_batches(Moments, fn_constructor_args=(ref,),
                              concurrency=(1, 2), batch_format="pyarrow",
                              batch_size=65536).to_pandas()
    n, sx, sy, sxx, syy, sxy = (int(parts[k].astype(object).sum())
                                for k in ("n", "sx", "sy", "sxx", "syy",
                                          "sxy"))
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    r = float(num) / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
    return pd.DataFrame({"n_edges": pd.Series([n], dtype=np.int64),
                         "assortativity": [r]})


ASSORTATIVITY_SQL = """
WITH e AS (SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
dc AS (SELECT cust, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
dsup AS (SELECT supp, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
j AS (SELECT dc.d AS x, dsup.d AS y
      FROM e JOIN dc ON dc.cust = e.cust JOIN dsup ON dsup.supp = e.supp),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x*x) AS HUGEINT) AS sxx,
             CAST(sum(y*y) AS HUGEINT) AS syy,
             CAST(sum(x*y) AS HUGEINT) AS sxy
      FROM j)
SELECT CAST(n AS BIGINT) AS n_edges,
       CAST(n*sxy - sx*sy AS DOUBLE) /
       (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
        sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS assortativity
FROM m
"""


# ---- winsorized mean via value-domain cells ---------------------------------


def winsorized_mean_quantity(sf_dir: str, p_lo: float = 0.1,
                             p_hi: float = 0.9):
    """Per return flag: the p10/p90-winsorized mean of l_quantity — robust
    central tendency with outliers CLAMPED (vs trim_outliers' dropping).

    The value domain is tiny (quantity cents ≤ a few thousand distinct
    values), so per-batch ``(flag, value) → count`` cells replace any
    row-level exchange: discrete quantiles (``ceil(q·n)−1`` rank, DuckDB
    ``quantile_disc`` semantics), the clamp, and the mean all fold from
    the cell histogram driver-side in exact integers. ``mean_wins_micro``
    = ``(sum_wins_cents · 10⁴) // n`` — floor of the exact rational, in
    micro-units of quantity.
    """
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_returnflag", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "flag": b.column("l_returnflag"),
            "qc": pc.cast(pc.round(pc.multiply(b.column("l_quantity"), 100)),
                          pa.int64())})
        g = t.group_by(["flag", "qc"]).aggregate([("qc", "count")])
        return pa.table({"flag": g.column("flag"), "qc": g.column("qc"),
                         "c": pc.cast(g.column("qc_count"), pa.int64())})

    cells = (li.map_batches(partial, batch_format="pyarrow").to_pandas()
             .groupby(["flag", "qc"], as_index=False)["c"].sum())
    rows = []
    for flag, g in cells.groupby("flag", sort=True):
        g = g.sort_values("qc", kind="mergesort")
        vals = g["qc"].to_numpy().astype(np.int64)
        cnts = g["c"].to_numpy().astype(np.int64)
        n = int(cnts.sum())
        cum = np.cumsum(cnts)

        def disc(q: float) -> int:
            rank = max(math.ceil(q * n) - 1, 0)      # 0-based target row
            return int(vals[np.searchsorted(cum, rank + 1)])

        lo, hi = disc(p_lo), disc(p_hi)
        clamped = np.clip(vals, lo, hi)
        s = int((clamped.astype(object) * cnts.astype(object)).sum())
        rows.append((flag, np.int64(n), np.int64(lo), np.int64(hi),
                     np.int64(s), np.int64((s * 10_000) // n)))
    return pd.DataFrame(rows, columns=["l_returnflag", "n_rows", "lo_cents",
                                       "hi_cents", "sum_wins_cents",
                                       "mean_wins_micro"])


WINSORIZED_MEAN_SQL = """
WITH v AS (SELECT l_returnflag,
                  CAST(round(l_quantity*100) AS BIGINT) AS qc
           FROM lineitem),
b AS (SELECT l_returnflag, quantile_disc(qc, 0.1) AS lo,
             quantile_disc(qc, 0.9) AS hi
      FROM v GROUP BY 1),
w AS (SELECT v.l_returnflag, b.lo, b.hi,
             CASE WHEN v.qc < b.lo THEN b.lo
                  WHEN v.qc > b.hi THEN b.hi ELSE v.qc END AS cq
      FROM v JOIN b ON b.l_returnflag = v.l_returnflag)
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(lo AS BIGINT) AS lo_cents, CAST(hi AS BIGINT) AS hi_cents,
       CAST(sum(cq) AS BIGINT) AS sum_wins_cents,
       CAST((sum(cq) * 10000) // count(*) AS BIGINT) AS mean_wins_micro
FROM w GROUP BY 1, lo, hi ORDER BY 1
"""


# ---- Zipf head with exact cumulative share ----------------------------------


def token_rank_freq_documents(sf_dir: str, k: int = 50):
    """The corpus's token rank–frequency head: top-``k`` whitespace tokens
    with rank, count, and EXACT cumulative corpus share in ppm
    (``(cum·10⁶) // total`` — floor, so both engines agree on every row).
    The tokenizer and bucketed fold are stages/vocab's; bucket partials
    additionally carry their bucket's total token count so the global
    denominator needs no second scan."""
    from ..stages.vocab import vocab_rank_freq

    docs = read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return vocab_rank_freq(docs, "text", k)


TOKEN_RANK_FREQ_SQL = r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(text, '\s+')) AS token
  FROM documents WHERE text IS NOT NULL),
t AS (SELECT token, CAST(count(*) AS BIGINT) AS n_total
      FROM toks WHERE token <> '' GROUP BY 1),
tot AS (SELECT sum(n_total) AS total FROM t),
r AS (SELECT token, n_total,
             row_number() OVER (ORDER BY n_total DESC, token) AS rank,
             sum(n_total) OVER (ORDER BY n_total DESC, token
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
SELECT CAST(r.rank AS BIGINT) AS rank, r.token, r.n_total,
       CAST((r.cum * 1000000) // tot.total AS BIGINT) AS cum_ppm
FROM r, tot WHERE r.rank <= 50 ORDER BY rank
"""


# ---- daily-count autocorrelation ---------------------------------------------


def autocorr_daily_events(sf_dir: str, lags: tuple = (1, 7),
                          block_gate: int = 512):
    """(event_type, lag, n_pairs, r) — lag-1 (persistence) and lag-7
    (weekly seasonality) Pearson autocorrelation of each event type's
    daily-count series — the traffic-regularity check a crawl-freshness
    validator runs next to the CUSUM change-point. The lag is a ROW lag
    over the type's OBSERVED days in ascending order (SQL ``lead(c, ℓ)
    OVER (ORDER BY day)`` — same convention as cusum_daily_events).

    Exactness: all five moment sums fold as Python ints from exact daily
    counts; ``r`` is the SAME IEEE expression in both engines —
    ``num / (sqrt(d1)·sqrt(d2))`` with num, d1, d2 exact ints < 2^53
    (sqrt and the arithmetic ops are correctly rounded by IEEE-754, so
    identical spelling ⇒ identical bits; only log/exp have engine-varying
    ulp, and none appear). Zero-variance or sub-2-pair series are excluded
    in both engines. Per-batch (type, day) cells are calendar-bounded, so
    the fold uses the shared gated cell fold (driver-side under 512
    blocks, hash-bucket exchange past it)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    ev = FusedParquetScan(f"{sf_dir}/events.parquet",
                          columns=["event_type", "ts"], split_per_rg=4)

    def partial(b: pa.Table) -> pa.Table:
        day = pc.strftime(pc.cast(b.column("ts"), pa.timestamp("us")),
                          format="%Y-%m-%d")
        t = pa.table({"event_type": b.column("event_type"), "day": day})
        g = t.group_by(["event_type", "day"]).aggregate([("day", "count")])
        return pa.table({"event_type": g.column("event_type"),
                         "day": g.column("day"),
                         "c": pc.cast(g.column("day_count"), pa.int64())})

    cells = fold_cells(ev, partial, ["event_type", "day"], sums=["c"],
                       block_gate=block_gate)
    rows = []
    for et, g in cells.groupby("event_type", sort=True):
        c = [int(x) for x in
             g.sort_values("day", kind="mergesort")["c"]]
        n = len(c)
        for lag in lags:
            m = n - lag
            if m < 2:
                continue
            x, y = c[:m], c[lag:]
            sx, sy = sum(x), sum(y)
            sxx = sum(v * v for v in x)
            syy = sum(v * v for v in y)
            sxy = sum(a * b for a, b in zip(x, y))
            d1 = m * sxx - sx * sx
            d2 = m * syy - sy * sy
            if d1 <= 0 or d2 <= 0:
                continue
            r = float(m * sxy - sx * sy) / (math.sqrt(float(d1))
                                            * math.sqrt(float(d2)))
            rows.append((et, np.int64(lag), np.int64(m), r))
    return pd.DataFrame(rows, columns=["event_type", "lag", "n_pairs",
                                       "r"])


AUTOCORR_DAILY_SQL = """
WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
w AS (SELECT event_type, c,
             lead(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
             lead(c, 7) OVER (PARTITION BY event_type ORDER BY day) AS y7
      FROM d),
u AS (
  SELECT event_type, CAST(1 AS BIGINT) AS lag, c AS x, y1 AS y FROM w
  WHERE y1 IS NOT NULL
  UNION ALL
  SELECT event_type, CAST(7 AS BIGINT) AS lag, c AS x, y7 AS y FROM w
  WHERE y7 IS NOT NULL),
s AS (SELECT event_type, lag, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM u GROUP BY 1, 2)
SELECT event_type, lag, m AS n_pairs,
       CAST(m * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(m * syy - sy * sy AS DOUBLE))) AS r
FROM s
WHERE m >= 2 AND m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
ORDER BY event_type, lag
"""


# ---- best mean-shift split (binary-segmentation change point) ----------------


def changepoint_daily_events(sf_dir: str, block_gate: int = 512):
    """(event_type, n_days, split_day, gain_q) — the single best
    mean-shift split of each type's daily-count series: the day k (last
    day of the left segment) maximizing the between-segment SSE reduction
    ``(n_R·Σx_L − n_L·Σx_R)² / (n_L·n_R)`` — the binary-segmentation step
    under CUSUM's constant-rate null, reported with the gain.

    The float-free trick: the gain is compared as the EXACT floored
    integer ``gain_q = A² // (n_L·n_R)`` with ``A = n_R·Σx_L − n_L·Σx_R``
    — A² reaches ~10¹⁹ at full scale, past int64, so the fold uses Python
    ints driver-side and HUGEINT in SQL; flooring makes the argmax
    tie-rule (earliest day) identical in both engines even where true
    gains differ below integer resolution. The OUTPUT column stays in
    int64 up to ~10⁸ events/day/type; past that, widen to HUGEINT in the
    SQL and keep the Python int. Cells are calendar-bounded
    (|types|×|days|); shared gated fold as in autocorr."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    ev = FusedParquetScan(f"{sf_dir}/events.parquet",
                          columns=["event_type", "ts"], split_per_rg=4)

    def partial(b: pa.Table) -> pa.Table:
        day = pc.strftime(pc.cast(b.column("ts"), pa.timestamp("us")),
                          format="%Y-%m-%d")
        t = pa.table({"event_type": b.column("event_type"), "day": day})
        g = t.group_by(["event_type", "day"]).aggregate([("day", "count")])
        return pa.table({"event_type": g.column("event_type"),
                         "day": g.column("day"),
                         "c": pc.cast(g.column("day_count"), pa.int64())})

    cells = fold_cells(ev, partial, ["event_type", "day"], sums=["c"],
                       block_gate=block_gate)
    rows = []
    for et, g in cells.groupby("event_type", sort=True):
        g = g.sort_values("day", kind="mergesort")
        c = [int(x) for x in g["c"]]
        days = list(g["day"])
        n, total = len(c), sum(c)
        if n < 2:
            continue
        best_gain, best_day = -1, None
        sx_l = 0
        for k in range(1, n):
            sx_l += c[k - 1]
            n_l, n_r = k, n - k
            a = n_r * sx_l - n_l * (total - sx_l)
            gain = (a * a) // (n_l * n_r)
            if gain > best_gain:
                best_gain, best_day = gain, days[k - 1]
        rows.append((et, np.int64(n), best_day, np.int64(best_gain)))
    return pd.DataFrame(rows, columns=["event_type", "n_days",
                                       "split_day", "gain_q"])


CHANGEPOINT_DAILY_SQL = """
WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
w AS (SELECT event_type, day, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS sx_l,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(c) OVER (PARTITION BY event_type) AS total
      FROM d),
g AS (SELECT event_type, day, CAST(n AS BIGINT) AS n_days,
             CAST(CAST(((n - k) * sx_l - k * (total - sx_l)) AS HUGEINT)
                  * ((n - k) * sx_l - k * (total - sx_l))
                  // (CAST(k AS HUGEINT) * (n - k)) AS BIGINT) AS gain_q
      FROM w WHERE k < n AND n >= 2),
m AS (SELECT event_type, max(gain_q) AS gain_q FROM g GROUP BY 1)
SELECT g.event_type, g.n_days, min(g.day) AS split_day,
       CAST(m.gain_q AS BIGINT) AS gain_q
FROM g JOIN m ON m.event_type = g.event_type AND g.gain_q = m.gain_q
GROUP BY 1, 2, m.gain_q ORDER BY 1
"""


def crosscorr_daily_events(sf_dir: str, xtype: str = "click",
                           ytype: str = "purchase",
                           lags: tuple = (0, 1, 7),
                           block_gate: int = 512):
    """(lag, n_pairs, r) — CROSS-correlation between two event types'
    daily-count series (does purchase volume follow click volume with a
    delay?): Pearson r between x_d and y_{d+lag} over the DENSE calendar
    from the log's first to last day, missing days counted 0 in both
    engines (zero-fill makes the lag a true calendar shift, unlike the
    observed-row lag of autocorr_daily_events). Five integer moment sums,
    ONE identically-spelled IEEE expression ``num/(sqrt(d1)·sqrt(d2))``
    — the autocorr float contract. Zero-variance windows are excluded in
    both engines. Per-(type, day) cells are calendar-bounded → shared
    gated cell fold."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    ev = FusedParquetScan(f"{sf_dir}/events.parquet",
                          columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("ts"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        t = pa.table({"event_type": b.column("event_type"), "d": d})
        g = t.group_by(["event_type", "d"]).aggregate([("d", "count")])
        return pa.table({"event_type": g.column("event_type"),
                         "d": pc.cast(g.column("d"), pa.int64()),
                         "c": pc.cast(g.column("d_count"), pa.int64())})

    cells = fold_cells(ev, partial, ["event_type", "d"], sums=["c"],
                       block_gate=block_gate)
    out_empty = pd.DataFrame({
        "lag": pd.Series([], dtype=np.int64),
        "n_pairs": pd.Series([], dtype=np.int64),
        "r": pd.Series([], dtype=np.float64)})
    if not len(cells):
        return out_empty
    lo, hi = int(cells["d"].min()), int(cells["d"].max())
    span = hi - lo + 1
    x = np.zeros(span, dtype=np.int64)
    y = np.zeros(span, dtype=np.int64)
    cx = cells[cells["event_type"] == xtype]
    cy = cells[cells["event_type"] == ytype]
    x[cx["d"].to_numpy(np.int64) - lo] = cx["c"].to_numpy(np.int64)
    y[cy["d"].to_numpy(np.int64) - lo] = cy["c"].to_numpy(np.int64)
    rows = []
    for lag in lags:
        m = span - lag
        if m < 2:
            continue
        a = [int(v) for v in x[:m]]
        b_ = [int(v) for v in y[lag:]]
        sx, sy = sum(a), sum(b_)
        sxx = sum(v * v for v in a)
        syy = sum(v * v for v in b_)
        sxy = sum(p * q for p, q in zip(a, b_))
        d1 = m * sxx - sx * sx
        d2 = m * syy - sy * sy
        if d1 <= 0 or d2 <= 0:
            continue
        r = float(m * sxy - sx * sy) / (math.sqrt(float(d1))
                                        * math.sqrt(float(d2)))
        rows.append((np.int64(lag), np.int64(m), r))
    return pd.DataFrame(rows, columns=["lag", "n_pairs", "r"]) \
        if rows else out_empty


CROSSCORR_DAILY_SQL = """
WITH b AS (SELECT CAST(epoch_us(min(ts)) // 86400000000 AS BIGINT) AS lo,
                  CAST(epoch_us(max(ts)) // 86400000000 AS BIGINT) AS hi
           FROM events),
cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS d FROM b),
cc AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
              CAST(count(*) FILTER (WHERE event_type = 'click')
                   AS BIGINT) AS x,
              CAST(count(*) FILTER (WHERE event_type = 'purchase')
                   AS BIGINT) AS y
       FROM events GROUP BY 1),
s AS (SELECT cal.d, COALESCE(cc.x, 0) AS x, COALESCE(cc.y, 0) AS y
      FROM cal LEFT JOIN cc USING (d)),
u AS (
  SELECT l.lag, s.x, y2.y
  FROM (SELECT unnest([0, 1, 7]) AS lag) l
  JOIN s ON TRUE
  JOIN s y2 ON y2.d = s.d + l.lag),
m AS (SELECT lag, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM u GROUP BY lag)
SELECT lag, m AS n_pairs,
       CAST(m * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(m * syy - sy * sy AS DOUBLE))) AS r
FROM m
WHERE m >= 2 AND m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
ORDER BY lag
"""


def mannwhitney_chars_langs(sf_dir: str, lang_a: str = "en",
                            lang_b: str = "de", block_gate: int = 512):
    """One-row (n_a, n_b, ranksum2_a, u2_a) — the Mann-Whitney U rank-sum
    test between two languages' document-length distributions, EXACT with
    midrank tie handling by working in DOUBLED ranks: a distinct value
    with cumulative count c below it and t ties has average rank
    (2c + t + 1)/2, so ``2·avg_rank = 2c + t + 1`` is an integer and
    ``ranksum2_a = Σ_v count_a(v)·(2c_v + t_v + 1)`` and ``u2_a =
    ranksum2_a − n_a·(n_a + 1)`` are exact int64 folds — no float exists
    anywhere, the nonparametric sibling of the integer chi-square. The
    value-domain trick: (lang, n_chars) cells are bounded by the distinct
    length count, so the fold uses the shared gated cell fold."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("lang"),
                              value_set=pa.array([lang_a, lang_b])))
        g = t.group_by(["lang", "n_chars"]).aggregate(
            [("n_chars", "count")])
        return pa.table({"lang": g.column("lang"),
                         "v": pc.cast(g.column("n_chars"), pa.int64()),
                         "c": pc.cast(g.column("n_chars_count"),
                                      pa.int64())})

    cells = fold_cells(scan, partial, ["lang", "v"], sums=["c"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({
            "n_a": pd.Series([0], dtype=np.int64),
            "n_b": pd.Series([0], dtype=np.int64),
            "ranksum2_a": pd.Series([0], dtype=np.int64),
            "u2_a": pd.Series([0], dtype=np.int64)})
    piv = cells.pivot_table(index="v", columns="lang", values="c",
                            aggfunc="sum", fill_value=0).sort_index()
    ca = piv[lang_a].to_numpy(np.int64) if lang_a in piv else \
        np.zeros(len(piv), np.int64)
    cb = piv[lang_b].to_numpy(np.int64) if lang_b in piv else \
        np.zeros(len(piv), np.int64)
    t = ca + cb
    cum = np.concatenate(([0], np.cumsum(t)))[:-1]
    r2 = 2 * cum + t + 1
    n_a, n_b = int(ca.sum()), int(cb.sum())
    ranksum2 = int((ca * r2).sum())
    u2 = ranksum2 - n_a * (n_a + 1)
    return pd.DataFrame({
        "n_a": pd.Series([n_a], dtype=np.int64),
        "n_b": pd.Series([n_b], dtype=np.int64),
        "ranksum2_a": pd.Series([ranksum2], dtype=np.int64),
        "u2_a": pd.Series([u2], dtype=np.int64)})


MANNWHITNEY_SQL = """
WITH c AS (SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM documents WHERE lang IN ('en', 'de') GROUP BY 1, 2),
p AS (SELECT v,
             CAST(sum(c) FILTER (WHERE lang = 'en') AS BIGINT) AS ca,
             CAST(sum(c) FILTER (WHERE lang = 'de') AS BIGINT) AS cb
      FROM c GROUP BY v),
w AS (SELECT v, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb,
             COALESCE(ca, 0) + COALESCE(cb, 0) AS t,
             CAST(COALESCE(sum(COALESCE(ca, 0) + COALESCE(cb, 0))
                  OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS cum
      FROM p),
agg AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
               CAST(sum(cb) AS BIGINT) AS n_b,
               CAST(sum(ca * (2 * cum + t + 1)) AS BIGINT) AS ranksum2_a
        FROM w)
SELECT n_a, n_b, ranksum2_a,
       ranksum2_a - n_a * (n_a + 1) AS u2_a
FROM agg
"""


def ewma_daily_events(sf_dir: str, block_gate: int = 512):
    """(day, c, ewma_units, ewma_ppm) — exponentially-weighted moving
    average of the daily event count with α = 1/2 (one-day half-life),
    the RECURSIVE window shape (each day's state depends on the previous
    day's): over the DENSE calendar (missing days = 0),
    ``u_d = (u_{d-1} + c_d·2²⁰) // 2`` in scaled 2⁻²⁰ units — non-negative
    integer floor division, so the whole recursion is exact and the
    oracle's RECURSIVE CTE folds bit-identically. ``ewma_ppm =
    10⁶·u // 2²⁰`` reports the value in exact floor-ppm of an event.
    Per-day cells are calendar-bounded → shared gated cell fold; the
    recursion itself is a driver loop over the calendar (sequential by
    definition — at any corpus size the series length is days, not
    rows)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    ev = FusedParquetScan(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("ts"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        g = pa.table({"d": d}).group_by("d").aggregate([("d", "count")])
        return pa.table({"d": pc.cast(g.column("d"), pa.int64()),
                         "c": pc.cast(g.column("d_count"), pa.int64())})

    cells = fold_cells(ev, partial, ["d"], sums=["c"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({
            "day": pd.Series([], dtype=np.int64),
            "c": pd.Series([], dtype=np.int64),
            "ewma_units": pd.Series([], dtype=np.int64),
            "ewma_ppm": pd.Series([], dtype=np.int64)})
    lo, hi = int(cells["d"].min()), int(cells["d"].max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[cells["d"].to_numpy(np.int64) - lo] = \
        cells["c"].to_numpy(np.int64)
    units = np.zeros(len(dense), dtype=np.int64)
    u = 0
    for i, c in enumerate(dense):
        u = (u + (int(c) << 20)) // 2
        units[i] = u
    return pd.DataFrame({
        "day": np.arange(lo, hi + 1, dtype=np.int64),
        "c": dense,
        "ewma_units": units,
        "ewma_ppm": (1_000_000 * units) // (1 << 20)})


EWMA_DAILY_SQL = """
WITH RECURSIVE
b AS (SELECT CAST(epoch_us(min(ts)) // 86400000000 AS BIGINT) AS lo,
                  CAST(epoch_us(max(ts)) // 86400000000 AS BIGINT) AS hi
           FROM events),
cc AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
              CAST(count(*) AS BIGINT) AS c
       FROM events GROUP BY 1),
s AS (SELECT cal.d, COALESCE(cc.c, 0) AS c
      FROM (SELECT unnest(generate_series(b.lo, b.hi)) AS d FROM b) cal
      LEFT JOIN cc USING (d)),
rec AS (
  SELECT s.d, s.c, CAST((s.c * 1048576) // 2 AS BIGINT) AS u
  FROM s, b WHERE s.d = b.lo
  UNION ALL
  SELECT s.d, s.c, CAST((rec.u + s.c * 1048576) // 2 AS BIGINT) AS u
  FROM rec JOIN s ON s.d = rec.d + 1)
SELECT d AS day, c, u AS ewma_units,
       (1000000 * u) // 1048576 AS ewma_ppm
FROM rec ORDER BY day
"""


def wasserstein_chars_langs(sf_dir: str, lang_a: str = "en",
                            lang_b: str = "de", block_gate: int = 512):
    """One-row (n_a, n_b, w1_units, w1) — the Wasserstein-1 (earth-mover)
    distance between two languages' document-length distributions: over
    the merged sorted value domain, ``W1 = Σ_i |F_A(v_i) − F_B(v_i)| ·
    (v_{i+1} − v_i)``. Exact integers all the way: ``w1_units =
    Σ |cumA·n_b − cumB·n_a| · Δv`` (Python arbitrary-precision ints /
    HUGEINT in SQL), and the one float is ``w1 = w1_units /
    (float64(n_a)·n_b)`` — the distribution-shift metric that, unlike
    KS, weighs HOW FAR mass moved, in the same units as the column.
    Value-domain (lang, n_chars) cells are bounded → shared gated cell
    fold."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("lang"),
                              value_set=pa.array([lang_a, lang_b])))
        g = t.group_by(["lang", "n_chars"]).aggregate(
            [("n_chars", "count")])
        return pa.table({"lang": g.column("lang"),
                         "v": pc.cast(g.column("n_chars"), pa.int64()),
                         "c": pc.cast(g.column("n_chars_count"),
                                      pa.int64())})

    cells = fold_cells(scan, partial, ["lang", "v"], sums=["c"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({
            "n_a": pd.Series([0], dtype=np.int64),
            "n_b": pd.Series([0], dtype=np.int64),
            "w1_units": pd.Series([0], dtype=np.int64),
            "w1": pd.Series([0.0], dtype=np.float64)})
    piv = cells.pivot_table(index="v", columns="lang", values="c",
                            aggfunc="sum", fill_value=0).sort_index()
    ca = piv[lang_a].to_numpy(np.int64) if lang_a in piv else \
        np.zeros(len(piv), np.int64)
    cb = piv[lang_b].to_numpy(np.int64) if lang_b in piv else \
        np.zeros(len(piv), np.int64)
    v = piv.index.to_numpy(np.int64)
    n_a, n_b = int(ca.sum()), int(cb.sum())
    w1_units = 0
    if len(v) > 1 and n_a > 0 and n_b > 0:
        cuma, cumb = 0, 0
        for i in range(len(v) - 1):
            cuma += int(ca[i])
            cumb += int(cb[i])
            w1_units += (abs(cuma * n_b - cumb * n_a)
                         * (int(v[i + 1]) - int(v[i])))
    w1 = float(w1_units) / (float(n_a) * n_b) if n_a and n_b else 0.0
    return pd.DataFrame({
        "n_a": pd.Series([n_a], dtype=np.int64),
        "n_b": pd.Series([n_b], dtype=np.int64),
        "w1_units": pd.Series([w1_units], dtype=np.int64),
        "w1": pd.Series([w1], dtype=np.float64)})


WASSERSTEIN_SQL = """
WITH c AS (SELECT lang, CAST(n_chars AS BIGINT) AS v,
                  CAST(count(*) AS BIGINT) AS c
           FROM documents WHERE lang IN ('en', 'de') GROUP BY 1, 2),
p AS (SELECT v,
             CAST(COALESCE(sum(c) FILTER (WHERE lang = 'en'), 0)
                  AS BIGINT) AS ca,
             CAST(COALESCE(sum(c) FILTER (WHERE lang = 'de'), 0)
                  AS BIGINT) AS cb
      FROM c GROUP BY v),
t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
             CAST(sum(cb) AS BIGINT) AS n_b FROM p),
w AS (SELECT v,
             CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
             CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb,
             lead(v) OVER (ORDER BY v) AS nxt
      FROM p),
agg AS (SELECT CAST(sum(abs(CAST(cuma AS HUGEINT) * t.n_b
                             - CAST(cumb AS HUGEINT) * t.n_a)
                        * (nxt - v)) AS BIGINT) AS w1_units
        FROM w, t WHERE nxt IS NOT NULL)
SELECT t.n_a, t.n_b, COALESCE(agg.w1_units, 0) AS w1_units,
       CAST(COALESCE(agg.w1_units, 0) AS DOUBLE)
         / (CAST(t.n_a AS DOUBLE) * t.n_b) AS w1
FROM t, agg
"""


def welch_t_chars_langs(sf_dir: str, lang_a: str = "en",
                        lang_b: str = "de", block_gate: int = 512):
    """One-row (n_a, n_b, t) — Welch's unequal-variance t statistic
    between two languages' document-length distributions, the parametric
    sibling of :func:`mannwhitney_chars_langs`. Everything up to the last
    expression is EXACT integer arithmetic over per-lang moments
    (n, Σx, Σx²): with ``d_g = n_g·Σx² − (Σx)²`` (n²·(n−1)·variance),
    ``P = n_a²(n_a−1)``, ``Q = n_b²(n_b−1)``,

        t = ((s_a·n_b − s_b·n_a) / (n_a·n_b))
            / sqrt((d_a·Q + d_b·P) / (P·Q))

    — two correctly-rounded int→double casts per operand, one divide,
    one sqrt, one divide, spelled identically in Python and DuckDB's
    HUGEINT pipeline, hence bitwise-equal.

    Scale shape: per-batch (lang, n, s, ss) moment partials are
    2-cell-bounded → shared gated cell fold (ONE exchange past the
    gate); driver math is O(1)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("lang"),
                              value_set=pa.array([lang_a, lang_b])))
        v = pc.cast(t.column("n_chars"), pa.int64())
        g = pa.table({"lang": t.column("lang"), "v": v,
                      "v2": pc.multiply(v, v)}) \
            .group_by("lang").aggregate(
                [("v", "count"), ("v", "sum"), ("v2", "sum")])
        return pa.table({"lang": g.column("lang"),
                         "n": pc.cast(g.column("v_count"), pa.int64()),
                         "s": g.column("v_sum"),
                         "ss": g.column("v2_sum")})

    cells = fold_cells(scan, partial, ["lang"], sums=["n", "s", "ss"],
                       block_gate=block_gate)
    mom = {r.lang: (int(r.n), int(r.s), int(r.ss))
           for r in cells.itertuples(index=False)} if len(cells) else {}
    na, sa, ssa = mom.get(lang_a, (0, 0, 0))
    nb, sb, ssb = mom.get(lang_b, (0, 0, 0))
    t_stat = 0.0
    if na >= 2 and nb >= 2:
        da = na * ssa - sa * sa
        db = nb * ssb - sb * sb
        p = na * na * (na - 1)
        q = nb * nb * (nb - 1)
        nn = da * q + db * p
        if nn != 0:
            t_stat = (float(sa * nb - sb * na) / float(na * nb)) \
                / math.sqrt(float(nn) / float(p * q))
    return pd.DataFrame({"n_a": pd.Series([na], dtype=np.int64),
                         "n_b": pd.Series([nb], dtype=np.int64),
                         "t": pd.Series([t_stat], dtype=np.float64)})


WELCH_T_SQL = """
WITH c AS (SELECT lang, CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(n_chars) AS HUGEINT) AS s,
                  CAST(sum(CAST(n_chars AS HUGEINT) * n_chars)
                       AS HUGEINT) AS ss
           FROM documents WHERE lang IN ('en', 'de') GROUP BY 1),
p AS (SELECT
        COALESCE(sum(n) FILTER (WHERE lang = 'en'), 0) AS na,
        COALESCE(sum(s) FILTER (WHERE lang = 'en'), 0) AS sa,
        COALESCE(sum(ss) FILTER (WHERE lang = 'en'), 0) AS ssa,
        COALESCE(sum(n) FILTER (WHERE lang = 'de'), 0) AS nb,
        COALESCE(sum(s) FILTER (WHERE lang = 'de'), 0) AS sb,
        COALESCE(sum(ss) FILTER (WHERE lang = 'de'), 0) AS ssb
      FROM c),
m AS (SELECT na, nb,
             sa * nb - sb * na AS d, na * nb AS mm,
             (na * ssa - sa * sa) * (nb * nb * (nb - 1))
               + (nb * ssb - sb * sb) * (na * na * (na - 1)) AS nn,
             (na * na * (na - 1)) * (nb * nb * (nb - 1)) AS pq
      FROM p)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CASE WHEN na < 2 OR nb < 2 OR nn = 0 THEN 0.0
            ELSE (CAST(d AS DOUBLE) / CAST(mm AS DOUBLE))
                 / sqrt(CAST(nn AS DOUBLE) / CAST(pq AS DOUBLE)) END AS t
FROM m
"""


def auc_chars_langs(sf_dir: str, lang_a: str = "en",
                    lang_b: str = "de", block_gate: int = 512):
    """One-row (n_a, n_b, u2_a, auc, cliffs_delta) — the two standard
    effect sizes derived from the Mann-Whitney U with midrank ties (same
    doubled-rank integer fold as :func:`mannwhitney_chars_langs`):
    ``AUC = U/(n_a·n_b) = u2/(2·n_a·n_b)`` (the probability a random
    lang_a document is longer, ties half) and ``Cliff's δ = 2·AUC − 1 =
    (u2 − n_a·n_b)/(n_a·n_b)``. Each float is ONE division of exact
    int64s — bitwise-identical cross-engine.

    Scale shape: (lang, n_chars) cells are value-domain-bounded →
    shared gated cell fold."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("lang"),
                              value_set=pa.array([lang_a, lang_b])))
        g = t.group_by(["lang", "n_chars"]).aggregate(
            [("n_chars", "count")])
        return pa.table({"lang": g.column("lang"),
                         "v": pc.cast(g.column("n_chars"), pa.int64()),
                         "c": pc.cast(g.column("n_chars_count"),
                                      pa.int64())})

    cells = fold_cells(scan, partial, ["lang", "v"], sums=["c"],
                       block_gate=block_gate)
    na = nb = u2 = 0
    if len(cells):
        piv = cells.pivot_table(index="v", columns="lang", values="c",
                                aggfunc="sum", fill_value=0).sort_index()
        ca = piv[lang_a].to_numpy(np.int64) if lang_a in piv else \
            np.zeros(len(piv), np.int64)
        cb = piv[lang_b].to_numpy(np.int64) if lang_b in piv else \
            np.zeros(len(piv), np.int64)
        t = ca + cb
        cum = np.concatenate(([0], np.cumsum(t)))[:-1]
        r2 = 2 * cum + t + 1
        na, nb = int(ca.sum()), int(cb.sum())
        u2 = int((ca * r2).sum()) - na * (na + 1)
    if na and nb:
        auc = float(u2) / float(2 * na * nb)
        delta = float(u2 - na * nb) / float(na * nb)
    else:
        auc = delta = 0.0
    return pd.DataFrame({
        "n_a": pd.Series([na], dtype=np.int64),
        "n_b": pd.Series([nb], dtype=np.int64),
        "u2_a": pd.Series([u2], dtype=np.int64),
        "auc": pd.Series([auc], dtype=np.float64),
        "cliffs_delta": pd.Series([delta], dtype=np.float64)})


AUC_SQL = """
WITH c AS (SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM documents WHERE lang IN ('en', 'de') GROUP BY 1, 2),
p AS (SELECT v,
             CAST(COALESCE(sum(c) FILTER (WHERE lang = 'en'), 0)
                  AS BIGINT) AS ca,
             CAST(COALESCE(sum(c) FILTER (WHERE lang = 'de'), 0)
                  AS BIGINT) AS cb
      FROM c GROUP BY v),
w AS (SELECT v, ca, cb, ca + cb AS t,
             CAST(COALESCE(sum(ca + cb)
                  OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS cum
      FROM p),
agg AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
               CAST(sum(cb) AS BIGINT) AS n_b,
               CAST(sum(ca * (2 * cum + t + 1)) AS BIGINT) AS r2a
        FROM w)
SELECT n_a, n_b, r2a - n_a * (n_a + 1) AS u2_a,
       CASE WHEN n_a = 0 OR n_b = 0 THEN 0.0
            ELSE CAST(r2a - n_a * (n_a + 1) AS DOUBLE)
                 / CAST(2 * n_a * n_b AS DOUBLE) END AS auc,
       CASE WHEN n_a = 0 OR n_b = 0 THEN 0.0
            ELSE CAST(r2a - n_a * (n_a + 1) - n_a * n_b AS DOUBLE)
                 / CAST(n_a * n_b AS DOUBLE) END AS cliffs_delta
FROM agg
"""


def kruskal_chars_langs(sf_dir: str, langs: tuple = ("en", "de", "fr"),
                        block_gate: int = 512):
    """One-row (n_a, n_b, n_c, tiesum, h) — the Kruskal-Wallis H test of
    document length across THREE languages: the k-group generalization of
    :func:`mannwhitney_chars_langs`, sharing its DOUBLED-midrank device
    (2·avg_rank = 2·cum + t + 1 ∈ ℤ over the pooled value histogram) so
    every per-group rank sum R2_i = 2·R_i is an exact integer fold. The
    statistic itself reduces to ONE division of two exact integers: with
    N = Σn_i, D = n_a·n_b·n_c and A = Σ R2_i²·(D/n_i) (so Σ R2_i²/n_i =
    A/D exactly, and R_i² = R2_i²/4 cancels into the 12 → 3 constant),

        H = 12/(N(N+1))·ΣR_i²/n_i − 3(N+1)
          = 3·(A − (N+1)²·N·D) / (D·N·(N+1))

    — numerator and denominator are HUGEINT-range (~1e23 at sf 0.01),
    cast to double once each; 0.0 when any group is empty. ``tiesum =
    Σ(t³−t)`` over pooled distinct values is emitted so callers can apply
    the tie correction 1 − tiesum/(N³−N) downstream.

    Scale shape: (lang, n_chars) cells are bounded by the distinct length
    count → shared gated cell fold; driver math is O(cells)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    la, lb, lc = langs
    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("lang"),
                              value_set=pa.array(list(langs))))
        g = t.group_by(["lang", "n_chars"]).aggregate(
            [("n_chars", "count")])
        return pa.table({"lang": g.column("lang"),
                         "v": pc.cast(g.column("n_chars"), pa.int64()),
                         "c": pc.cast(g.column("n_chars_count"),
                                      pa.int64())})

    cells = fold_cells(scan, partial, ["lang", "v"], sums=["c"],
                       block_gate=block_gate)
    out_zero = pd.DataFrame({
        "n_a": pd.Series([0], dtype=np.int64),
        "n_b": pd.Series([0], dtype=np.int64),
        "n_c": pd.Series([0], dtype=np.int64),
        "tiesum": pd.Series([0], dtype=np.int64),
        "h": pd.Series([0.0], dtype=np.float64)})
    if not len(cells):
        return out_zero
    piv = cells.pivot_table(index="v", columns="lang", values="c",
                            aggfunc="sum", fill_value=0).sort_index()
    cnt = {lg: (piv[lg].to_numpy(np.int64) if lg in piv
                else np.zeros(len(piv), np.int64)) for lg in langs}
    t = cnt[la] + cnt[lb] + cnt[lc]
    cum = np.concatenate(([0], np.cumsum(t)))[:-1]
    r2 = 2 * cum + t + 1
    n = {lg: int(cnt[lg].sum()) for lg in langs}
    r2sum = {lg: int((cnt[lg] * r2).sum()) for lg in langs}
    tiesum = int((t * t * t - t).sum())
    nn = n[la] + n[lb] + n[lc]
    d = n[la] * n[lb] * n[lc]
    if d == 0 or nn == 0:
        return out_zero
    a = (r2sum[la] ** 2 * n[lb] * n[lc] + r2sum[lb] ** 2 * n[la] * n[lc]
         + r2sum[lc] ** 2 * n[la] * n[lb])
    hnum = 3 * (a - (nn + 1) * (nn + 1) * nn * d)
    hden = d * nn * (nn + 1)
    return pd.DataFrame({
        "n_a": pd.Series([n[la]], dtype=np.int64),
        "n_b": pd.Series([n[lb]], dtype=np.int64),
        "n_c": pd.Series([n[lc]], dtype=np.int64),
        "tiesum": pd.Series([tiesum], dtype=np.int64),
        "h": pd.Series([float(hnum) / float(hden)], dtype=np.float64)})


KRUSKAL_SQL = """
WITH c AS (SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM documents WHERE lang IN ('en', 'de', 'fr') GROUP BY 1, 2),
p AS (SELECT v,
        CAST(COALESCE(sum(c) FILTER (WHERE lang = 'en'), 0) AS BIGINT) AS ca,
        CAST(COALESCE(sum(c) FILTER (WHERE lang = 'de'), 0) AS BIGINT) AS cb,
        CAST(COALESCE(sum(c) FILTER (WHERE lang = 'fr'), 0) AS BIGINT) AS cc
      FROM c GROUP BY v),
w AS (SELECT v, ca, cb, cc, ca + cb + cc AS t,
             CAST(COALESCE(sum(ca + cb + cc)
                  OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS cum
      FROM p),
agg AS (SELECT CAST(sum(ca) AS HUGEINT) AS na,
               CAST(sum(cb) AS HUGEINT) AS nb,
               CAST(sum(cc) AS HUGEINT) AS nc,
               CAST(sum(ca * (2 * cum + t + 1)) AS HUGEINT) AS r2a,
               CAST(sum(cb * (2 * cum + t + 1)) AS HUGEINT) AS r2b,
               CAST(sum(cc * (2 * cum + t + 1)) AS HUGEINT) AS r2c,
               CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS BIGINT) AS tiesum
        FROM w),
m AS (SELECT na, nb, nc, tiesum, na + nb + nc AS n, na * nb * nc AS d,
             r2a * r2a * nb * nc + r2b * r2b * na * nc
               + r2c * r2c * na * nb AS a
      FROM agg)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(nc AS BIGINT) AS n_c, tiesum,
       CASE WHEN d = 0 OR n = 0 THEN 0.0
            ELSE CAST(3 * (a - (n + 1) * (n + 1) * n * d) AS DOUBLE)
                 / CAST(d * n * (n + 1) AS DOUBLE) END AS h
FROM m
"""


def runs_test_daily_revenue(sf_dir: str, block_gate: int = 512):
    """One-row (n_days, n_above, n_below, runs, z) — the Wald-Wolfowitz
    runs test for randomness of the daily-revenue series: each observed
    day is ABOVE (1) or BELOW (0) the median daily revenue, and too few
    runs of equal signs means trend/clustering, too many means
    oscillation. Exactness: daily revenue is the floor-cents integer
    fold, the DOUBLED median m2 (lower mid + upper mid of the sorted
    daily values) keeps the threshold integral so ``sign = [2c ≥ m2]``
    never compares floats, and runs/n_above/n_below are integer folds.
    The z-score is the ONE place floats exist — computed from exact
    integers in an identically-spelled IEEE expression in both engines
    (division → add, one division, libm sqrt, one division; each step
    correctly rounded, so the doubles are bitwise equal):

        μ = 1 + 2·n1·n0/N     σ² = 2n1n0(2n1n0−N)/(N²(N−1))
        z = (R − μ)/√σ²        (0.0 when σ² ≤ 0)

    Scale shape: per-day cells are calendar-bounded → shared gated cell
    fold; sorting ≈2.4k days is O(1) driver work at any corpus size."""
    import math

    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("o_orderdate"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), 100)), pa.int64())
        g = pa.table({"d": d, "c": cents}).group_by("d").aggregate(
            [("c", "sum")])
        return pa.table({"d": pc.cast(g.column("d"), pa.int64()),
                         "c": pc.cast(g.column("c_sum"), pa.int64())})

    cells = fold_cells(scan, partial, ["d"], sums=["c"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({
            "n_days": pd.Series([0], dtype=np.int64),
            "n_above": pd.Series([0], dtype=np.int64),
            "n_below": pd.Series([0], dtype=np.int64),
            "runs": pd.Series([0], dtype=np.int64),
            "z": pd.Series([0.0], dtype=np.float64)})
    cells = cells.sort_values("d")
    c = cells["c"].to_numpy(np.int64)
    n = len(c)
    sv = np.sort(c)
    m2 = int(sv[(n + 1) // 2 - 1]) + int(sv[(n + 2) // 2 - 1])
    sg = (2 * c >= m2).astype(np.int64)
    runs = 1 + int((sg[1:] != sg[:-1]).sum())
    n1 = int(sg.sum())
    n0 = n - n1
    if n1 == 0 or n0 == 0 or n < 2:
        z = 0.0
    else:
        mu = 1.0 + float(2 * n1 * n0) / float(n)
        var = float(2 * n1 * n0 * (2 * n1 * n0 - n)) \
            / float(n * n * (n - 1))
        z = 0.0 if var <= 0 else (float(runs) - mu) / math.sqrt(var)
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype=np.int64),
        "n_above": pd.Series([n1], dtype=np.int64),
        "n_below": pd.Series([n0], dtype=np.int64),
        "runs": pd.Series([runs], dtype=np.int64),
        "z": pd.Series([z], dtype=np.float64)})


RUNS_TEST_SQL = """
WITH dd AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                     AS d,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS c
            FROM orders GROUP BY 1),
o AS (SELECT c AS v, row_number() OVER (ORDER BY c) AS r,
             count(*) OVER () AS n
      FROM dd),
m AS (SELECT CAST(sum(CASE WHEN r = (n + 1) // 2 THEN v ELSE 0 END)
              + sum(CASE WHEN r = (n + 2) // 2 THEN v ELSE 0 END)
              AS BIGINT) AS m2
      FROM o),
s AS (SELECT d, CAST(2 * c >= m.m2 AS BIGINT) AS sg FROM dd, m),
r AS (SELECT sg, lag(sg) OVER (ORDER BY d) AS psg FROM s),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(sg) AS BIGINT) AS n1,
               CAST(count(*) - sum(sg) AS BIGINT) AS n0,
               CAST(1 + count(*) FILTER (WHERE psg IS NOT NULL
                                         AND sg <> psg) AS BIGINT) AS runs
        FROM r)
SELECT n AS n_days, n1 AS n_above, n0 AS n_below, runs,
       CASE WHEN n1 = 0 OR n0 = 0 OR n < 2
              OR 2 * n1 * n0 * (2 * n1 * n0 - n) <= 0 THEN 0.0
            ELSE (CAST(runs AS DOUBLE)
                  - (1.0 + CAST(2 * n1 * n0 AS DOUBLE)
                           / CAST(n AS DOUBLE)))
                 / sqrt(CAST(2 * n1 * n0 * (2 * n1 * n0 - n) AS DOUBLE)
                        / CAST(n * n * (n - 1) AS DOUBLE)) END AS z
FROM agg
"""


def dispersion_by_event_type(sf_dir: str, block_gate: int = 512):
    """Per event type: (event_type, n_days, n_events, sumsq, d) — the
    index-of-dispersion (Fano factor) test of the daily arrival counts
    against a Poisson process: D = (n−1)·s²/x̄ over the DENSE calendar
    (days with zero arrivals count — excluding them biases rare types
    toward underdispersion). D ≫ n−1 means bursty arrivals, D ≪ n−1
    means suspiciously regular (bot traffic). The statistic collapses to
    ONE division of exact integers:

        D = (n·Σc² − S²) / S        (S = Σc; 0.0 when S = 0)

    since (n−1)s² = (nΣc² − S²)/n and x̄ = S/n. The per-type sibling of
    :func:`runs_test_daily_revenue` (randomness in time vs randomness in
    level).

    Scale shape: (type, day) cells are types×calendar-bounded → shared
    gated cell fold; the dense-day count comes from the same cells'
    global min/max."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("ts"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        g = pa.table({"et": b.column("event_type"), "d": d}) \
            .group_by(["et", "d"]).aggregate([("d", "count")])
        return pa.table({"et": g.column("et"),
                         "d": pc.cast(g.column("d"), pa.int64()),
                         "c": pc.cast(g.column("d_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["et", "d"], sums=["c"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame(columns=["event_type", "n_days", "n_events",
                                     "sumsq", "d"]).astype(
            {"event_type": object, "n_days": np.int64,
             "n_events": np.int64, "sumsq": np.int64, "d": np.float64})
    n_days = int(cells["d"].max()) - int(cells["d"].min()) + 1
    rows = []
    for et, sub in cells.groupby("et", sort=True):
        c = sub["c"].to_numpy(np.int64)
        s = int(c.sum())
        ss = int((c * c).sum())
        disp = 0.0 if s == 0 else float(n_days * ss - s * s) / float(s)
        rows.append((et, np.int64(n_days), np.int64(s), np.int64(ss),
                     disp))
    return pd.DataFrame(rows, columns=["event_type", "n_days", "n_events",
                                       "sumsq", "d"])


DISPERSION_SQL = """
WITH b AS (SELECT CAST(epoch_us(min(ts)) // 86400000000 AS BIGINT) AS lo,
                  CAST(epoch_us(max(ts)) // 86400000000 AS BIGINT) AS hi
           FROM events),
c AS (SELECT event_type AS et,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
g AS (SELECT et, CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS ss
      FROM c GROUP BY 1)
SELECT et AS event_type,
       CAST(b.hi - b.lo + 1 AS BIGINT) AS n_days,
       s AS n_events, ss AS sumsq,
       CASE WHEN s = 0 THEN 0.0
            ELSE CAST((b.hi - b.lo + 1) * ss - s * s AS DOUBLE)
                 / CAST(s AS DOUBLE) END AS d
FROM g, b ORDER BY et
"""


def weekday_anova_events(sf_dir: str, block_gate: int = 512):
    """One-row (n_days, k_groups, f) — one-way ANOVA F of the daily event
    count across the seven weekday groups (dow = epoch-day mod 7, an
    engine-neutral spelling that sidesteps dayofweek() conventions): the
    formal test behind the weekday-profile heatmap — is weekly
    seasonality real or noise? The :func:`~.checks.anova_f_qty_flag`
    product-of-group-sizes device generalizes to k = 7: with P = Πn_g and
    Anum = Σ s_g²·(P/n_g),

        F = (Anum·N − S²·P)·(N−7) / ((T·P − Anum)·N·6)

    — exact HUGEINT-range integers (calendar-bounded: n_g ≈ days/7, so
    P ≈ 5e17 at a 2.4k-day span REGARDLESS of corpus size), one division.
    Observed days only (a day with zero events is absent from the
    calendar here, matching the grouped-count shape).

    Scale shape: per-day cells → shared gated cell fold; the 7-group
    pivot and F are O(days) driver math."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("ts"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        g = pa.table({"d": d}).group_by("d").aggregate([("d", "count")])
        return pa.table({"d": pc.cast(g.column("d"), pa.int64()),
                         "c": pc.cast(g.column("d_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["d"], sums=["c"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({"n_days": pd.Series([0], dtype=np.int64),
                             "k_groups": pd.Series([7], dtype=np.int64),
                             "f": pd.Series([0.0], dtype=np.float64)})
    d = cells["d"].to_numpy(np.int64)
    c = cells["c"].to_numpy(np.int64)
    dow = d % 7
    n_g = [0] * 7
    s_g = [0] * 7
    ss_tot = 0
    for w in range(7):
        m = dow == w
        n_g[w] = int(m.sum())
        s_g[w] = int(c[m].sum())
    ss_tot = int((c * c).sum())
    n = int(len(c))
    s = int(c.sum())
    pp = 1
    for w in range(7):
        pp *= n_g[w]
    if pp == 0:
        f = 0.0
    else:
        anum = sum(s_g[w] * s_g[w] * (pp // n_g[w]) for w in range(7))
        fnum = (anum * n - s * s * pp) * (n - 7)
        fden = (ss_tot * pp - anum) * n * 6
        f = 0.0 if fden == 0 else float(fnum) / float(fden)
    return pd.DataFrame({"n_days": pd.Series([n], dtype=np.int64),
                         "k_groups": pd.Series([7], dtype=np.int64),
                         "f": pd.Series([f], dtype=np.float64)})


def _weekday_anova_sql() -> str:
    filt = "\n".join(
        f"        CAST(COALESCE(sum(c) FILTER (WHERE dow = {w}), 0)"
        f" AS HUGEINT) AS s{w},\n"
        f"        CAST(COALESCE(count(*) FILTER (WHERE dow = {w}), 0)"
        f" AS HUGEINT) AS n{w}," for w in range(7))
    pp = " * ".join(f"n{w}" for w in range(7))
    anum = " + ".join(
        f"s{w} * s{w} * (pp // GREATEST(n{w}, 1))" for w in range(7))
    return f"""
WITH c AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
w AS (SELECT d % 7 AS dow, c FROM c),
p AS (SELECT
{filt}
        CAST(count(*) AS HUGEINT) AS n,
        CAST(sum(c) AS HUGEINT) AS s,
        CAST(sum(c * c) AS HUGEINT) AS t
      FROM w),
m AS (SELECT n, s, t, {pp} AS pp,
             s0, s1, s2, s3, s4, s5, s6,
             n0, n1, n2, n3, n4, n5, n6
      FROM p),
a AS (SELECT n, s, t, pp,
             CASE WHEN pp = 0 THEN 0 ELSE {anum} END AS anum
      FROM m),
ff AS (SELECT n, pp,
              (anum * n - s * s * pp) * (n - 7) AS fnum,
              (t * pp - anum) * n * 6 AS fden
       FROM a)
SELECT CAST(n AS BIGINT) AS n_days, CAST(7 AS BIGINT) AS k_groups,
       CASE WHEN pp = 0 OR fden = 0 THEN 0.0
            ELSE CAST(fnum AS DOUBLE) / CAST(fden AS DOUBLE) END AS f
FROM ff
"""


WEEKDAY_ANOVA_SQL = _weekday_anova_sql()


def durbin_watson_daily_revenue(sf_dir: str, block_gate: int = 512):
    """One-row (n_days, dw) — the Durbin-Watson statistic of the daily-
    revenue deviations from their mean: DW ≈ 2 means no lag-1
    autocorrelation, → 0 strong positive (trending), → 4 alternating.
    The mean-residual spelling is EXACT: with integer daily cents c_t,
    S = Σc and n days, the scaled residual ``ê_t = n·c_t − S`` is an
    integer multiple of the true residual (the scale cancels in the
    ratio), so

        DW = Σ(ê_t − ê_{t−1})² / Σê_t²

    is ONE division of two exact integers (HUGEINT-range ≈ 1e26 at sf
    0.1 — Python ints driver-side are unbounded; 0.0 on zero variance).
    The regression-residual sibling of :func:`runs_test_daily_revenue`.

    Scale shape: per-day cells are calendar-bounded → shared gated cell
    fold; the lag-1 pass is O(days) driver math over observed days in
    day order."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("o_orderdate"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), 100)), pa.int64())
        g = pa.table({"d": d, "c": cents}).group_by("d").aggregate(
            [("c", "sum")])
        return pa.table({"d": pc.cast(g.column("d"), pa.int64()),
                         "c": pc.cast(g.column("c_sum"), pa.int64())})

    cells = fold_cells(scan, partial, ["d"], sums=["c"],
                       block_gate=block_gate)
    if len(cells) < 2:
        return pd.DataFrame({
            "n_days": pd.Series([len(cells)], dtype=np.int64),
            "dw": pd.Series([0.0], dtype=np.float64)})
    cells = cells.sort_values("d")
    c = [int(x) for x in cells["c"].to_numpy(np.int64)]
    n = len(c)
    s = sum(c)
    e = [n * x - s for x in c]
    num = sum((e[t] - e[t - 1]) ** 2 for t in range(1, n))
    den = sum(x * x for x in e)
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype=np.int64),
        "dw": pd.Series([0.0 if den == 0 else float(num) / float(den)],
                        dtype=np.float64)})


DURBIN_WATSON_SQL = """
WITH dd AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                     AS d,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS c
            FROM orders GROUP BY 1),
t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(c) AS HUGEINT) AS s FROM dd),
e AS (SELECT d, t.n * c - t.s AS e,
             lag(t.n * c - t.s) OVER (ORDER BY d) AS pe
      FROM dd, t),
agg AS (SELECT CAST((SELECT n FROM t) AS BIGINT) AS n,
               sum(CASE WHEN pe IS NULL THEN 0
                        ELSE (e - pe) * (e - pe) END) AS num,
               sum(e * e) AS den
        FROM e)
SELECT n AS n_days,
       CASE WHEN den = 0 OR den IS NULL THEN 0.0
            ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS dw
FROM agg
"""


def pettitt_daily_events(sf_dir: str, block_gate: int = 512):
    """One-row (n_days, k2_stat, t_at_max) — the Pettitt rank-based
    change-point test over the daily event-count series: the
    nonparametric sibling of :func:`changepoint_daily_events` (which
    splits on means). With DOUBLED midranks R2_t of the daily counts
    (2·avg_rank ∈ ℤ under ties), the Mann-Whitney-style split statistic

        U2_t = 2·Σ_{i≤t} R2_i − 2·t·(n+1)

    is an exact integer for every prefix t, K2 = max_t |U2_t| locates the
    most likely change day (earliest day on ties — same argmax rule
    spelled in both engines). No float exists anywhere.

    Scale shape: per-day cells are calendar-bounded → shared gated cell
    fold; ranking + prefix scan are O(days log days) driver math."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("ts"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        g = pa.table({"d": d}).group_by("d").aggregate([("d", "count")])
        return pa.table({"d": pc.cast(g.column("d"), pa.int64()),
                         "c": pc.cast(g.column("d_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["d"], sums=["c"],
                       block_gate=block_gate)
    if len(cells) < 2:
        return pd.DataFrame({
            "n_days": pd.Series([len(cells)], dtype=np.int64),
            "k2_stat": pd.Series([0], dtype=np.int64),
            "t_at_max": pd.Series([0], dtype=np.int64)})
    cells = cells.sort_values("d")
    d = cells["d"].to_numpy(np.int64)
    c = cells["c"].to_numpy(np.int64)
    n = len(c)
    order = np.argsort(c, kind="mergesort")
    # doubled midrank per value: 2*(count below) + (ties) + 1
    sorted_c = c[order]
    r2_sorted = np.empty(n, np.int64)
    i = 0
    while i < n:
        j = i
        while j < n and sorted_c[j] == sorted_c[i]:
            j += 1
        r2_sorted[i:j] = 2 * i + (j - i) + 1
        i = j
    r2 = np.empty(n, np.int64)
    r2[order] = r2_sorted
    pref = np.cumsum(r2)
    t_idx = np.arange(1, n + 1, dtype=np.int64)
    u2 = 2 * pref - 2 * t_idx * (n + 1)
    absu = np.abs(u2[:-1])            # split after t = 1..n-1
    best = int(np.argmax(absu))       # first maximum = earliest day
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype=np.int64),
        "k2_stat": pd.Series([int(absu[best])], dtype=np.int64),
        "t_at_max": pd.Series([int(d[best])], dtype=np.int64)})


PETTITT_SQL = """
WITH c AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
r AS (SELECT d, 2 * (rank() OVER (ORDER BY c) - 1)
                + count(*) OVER (PARTITION BY c) + 1 AS r2,
             count(*) OVER () AS n
      FROM c),
u AS (SELECT d, n,
             2 * sum(r2) OVER (ORDER BY d
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)
               - 2 * (row_number() OVER (ORDER BY d)) * (n + 1) AS u2,
             row_number() OVER (ORDER BY d) AS t
      FROM r),
k AS (SELECT d, abs(u2) AS a FROM u WHERE t < n)
SELECT CAST((SELECT max(n) FROM u) AS BIGINT) AS n_days,
       CAST((SELECT max(a) FROM k) AS BIGINT) AS k2_stat,
       CAST((SELECT min(d) FROM k
             WHERE a = (SELECT max(a) FROM k)) AS BIGINT) AS t_at_max
FROM (SELECT 1)
"""
# ---- Mood's median test: length location shift across all languages --------

def moods_median_chars_langs(sf_dir: str, block_gate: int = 512):
    """(lang, n_above, n_below, contrib_above, contrib_below) — Mood's
    median test of document length across ALL languages: every document
    is classified above / not-above the GRAND median length, and the
    resulting 2×k contingency table's chi-square cell contributions say
    which languages sit systematically long or short. The nonparametric
    sibling of :func:`weekday_anova_events` (location shift without
    normality) built from two shared exact devices: the DOUBLED grand
    median over the pooled length histogram (m2 = lower-mid + upper-mid,
    so ``above = [2v > m2]`` never compares floats — the
    runs_test_daily_revenue device), and per-cell chi-square
    contributions as ONE double division of exact integers each
    (``(obs·T − row·col)² / (T·row·col)`` — the chi_square_cells device;
    0.0 when a margin is empty, no float ever accumulates across cells).

    Scale shape: (lang, n_chars) cells are bounded by langs × distinct
    lengths → shared gated cell fold; driver math is O(cells) Python
    ints (HUGEINT-range safe at any SF)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "n_chars"]).aggregate([("n_chars", "count")])
        return pa.table({"lang": g.column("lang"),
                         "v": pc.cast(g.column("n_chars"), pa.int64()),
                         "c": pc.cast(g.column("n_chars_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["lang", "v"], sums=["c"],
                       block_gate=block_gate)
    empty = pd.DataFrame({
        "lang": pd.Series([], dtype=object),
        "n_above": pd.Series([], dtype=np.int64),
        "n_below": pd.Series([], dtype=np.int64),
        "contrib_above": pd.Series([], dtype=np.float64),
        "contrib_below": pd.Series([], dtype=np.float64)})
    if not len(cells):
        return empty
    hist = cells.groupby("v", as_index=False)["c"].sum().sort_values("v")
    hv = hist["v"].to_numpy(np.int64)
    hc = hist["c"].to_numpy(np.int64)
    cume = np.cumsum(hc)
    n = int(cume[-1])
    lo, hi = (n + 1) // 2, (n + 2) // 2
    m2 = int(hv[np.searchsorted(cume, lo)]) \
        + int(hv[np.searchsorted(cume, hi)])
    above = 2 * cells["v"].to_numpy(np.int64) > m2
    cc = cells["c"].to_numpy(np.int64)
    per = cells.assign(n_above=np.where(above, cc, 0),
                       n_below=np.where(~above, cc, 0)) \
        .groupby("lang", as_index=False)[["n_above", "n_below"]].sum()
    ca = int(per["n_above"].sum())
    cb = int(per["n_below"].sum())
    t = ca + cb

    def contrib(obs: int, row: int, col: int) -> float:
        den = t * row * col
        if den == 0:
            return 0.0
        num = (obs * t - row * col) ** 2
        return float(num) / float(den)

    out = per.sort_values("lang").reset_index(drop=True)
    rows = out["n_above"].to_numpy(np.int64) + out["n_below"].to_numpy(
        np.int64)
    out["contrib_above"] = [
        contrib(int(a), int(r), ca)
        for a, r in zip(out["n_above"], rows)]
    out["contrib_below"] = [
        contrib(int(b), int(r), cb)
        for b, r in zip(out["n_below"], rows)]
    out["n_above"] = out["n_above"].astype(np.int64)
    out["n_below"] = out["n_below"].astype(np.int64)
    return out


MOODS_MEDIAN_SQL = """
WITH c AS (SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
h AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM c GROUP BY v),
w AS (SELECT v, CAST(sum(t) OVER (ORDER BY v) AS BIGINT) AS cume FROM h),
nn AS (SELECT CAST(sum(t) AS BIGINT) AS n FROM h),
m AS (SELECT
   (SELECT min(v) FROM w WHERE cume >= (SELECT (n + 1) // 2 FROM nn))
 + (SELECT min(v) FROM w WHERE cume >= (SELECT (n + 2) // 2 FROM nn))
   AS m2),
s AS (SELECT lang,
   CAST(COALESCE(sum(c) FILTER (WHERE 2 * v > (SELECT m2 FROM m)), 0)
        AS HUGEINT) AS above,
   CAST(COALESCE(sum(c) FILTER (WHERE 2 * v <= (SELECT m2 FROM m)), 0)
        AS HUGEINT) AS below
 FROM c GROUP BY lang),
g AS (SELECT CAST(sum(above) AS HUGEINT) AS ca,
             CAST(sum(below) AS HUGEINT) AS cb,
             CAST(sum(above + below) AS HUGEINT) AS t FROM s)
SELECT lang,
       CAST(above AS BIGINT) AS n_above,
       CAST(below AS BIGINT) AS n_below,
       CASE WHEN t * (above + below) * ca = 0 THEN 0.0
            ELSE CAST((above * t - (above + below) * ca)
                      * (above * t - (above + below) * ca) AS DOUBLE)
               / CAST(t * (above + below) * ca AS DOUBLE)
       END AS contrib_above,
       CASE WHEN t * (above + below) * cb = 0 THEN 0.0
            ELSE CAST((below * t - (above + below) * cb)
                      * (below * t - (above + below) * cb) AS DOUBLE)
               / CAST(t * (above + below) * cb AS DOUBLE)
       END AS contrib_below
FROM s, g ORDER BY lang
"""


# ---- Cramér–von Mises two-sample EDF distance ------------------------------

def cvm_chars_langs(sf_dir: str, lang_a: str = "en", lang_b: str = "de",
                    block_gate: int = 512):
    """One-row (n_a, n_b, u4, t_stat) — the two-sample Cramér–von Mises
    test of document length between two languages: an EDF distance that,
    unlike the KS max-gap, integrates squared rank displacements over the
    WHOLE distribution. Exactness: with doubled midranks (2·avg_rank =
    2·cum + t + 1 ∈ ℤ, the mannwhitney/kruskal device) the per-cell sum
    of squared displacements Σ_{k=1..c}(c0 − 2k)² telescopes to

        c·c0² − 2·c0·c·(c+1) + 4·(c·(c+1)·(2c+1) // 6)   (exact ints,
        c0 = R2 − 2·cum_own)

    so U4 = 4U = n·ΣA + m·ΣB is an exact integer fold and the statistic
    is ONE division of exact integers:

        T = U/(nm·N) − (4nm−1)/(6N)
          = (3·U4 − 2·nm·(4nm−1)) / (12·nm·N),   N = n+m.

    (0.0 when either sample is empty.) HUGEINT-range in SQL, Python ints
    driver-side.

    Scale shape: (lang, n_chars) cells → shared gated cell fold; driver
    math is O(distinct lengths)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])
    langs = (lang_a, lang_b)

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("lang"),
                              value_set=pa.array(list(langs))))
        g = t.group_by(["lang", "n_chars"]).aggregate([("n_chars", "count")])
        return pa.table({"lang": g.column("lang"),
                         "v": pc.cast(g.column("n_chars"), pa.int64()),
                         "c": pc.cast(g.column("n_chars_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["lang", "v"], sums=["c"],
                       block_gate=block_gate)
    zero = pd.DataFrame({
        "n_a": pd.Series([0], dtype=np.int64),
        "n_b": pd.Series([0], dtype=np.int64),
        "u4": pd.Series([0], dtype=np.int64),
        "t_stat": pd.Series([0.0], dtype=np.float64)})
    if not len(cells):
        return zero
    piv = cells.pivot_table(index="v", columns="lang", values="c",
                            aggfunc="sum", fill_value=0).sort_index()
    ca = (piv[lang_a].to_numpy(np.int64) if lang_a in piv
          else np.zeros(len(piv), np.int64))
    cb = (piv[lang_b].to_numpy(np.int64) if lang_b in piv
          else np.zeros(len(piv), np.int64))
    t = ca + cb
    cum = np.concatenate(([0], np.cumsum(t)))[:-1]
    cuma = np.concatenate(([0], np.cumsum(ca)))[:-1]
    cumb = np.concatenate(([0], np.cumsum(cb)))[:-1]
    r2 = 2 * cum + t + 1
    n, m = int(ca.sum()), int(cb.sum())

    def disp(cnt, cumo):
        tot = 0
        for c, c0 in zip(cnt.tolist(), (r2 - 2 * cumo).tolist()):
            if c:
                tot += c * c0 * c0 - 2 * c0 * c * (c + 1) \
                    + 4 * (c * (c + 1) * (2 * c + 1) // 6)
        return tot

    u4 = n * disp(ca, cuma) + m * disp(cb, cumb)
    if n == 0 or m == 0:
        t_stat = 0.0
    else:
        t_stat = float(3 * u4 - 2 * n * m * (4 * n * m - 1)) \
            / float(12 * n * m * (n + m))
    return pd.DataFrame({
        "n_a": pd.Series([n], dtype=np.int64),
        "n_b": pd.Series([m], dtype=np.int64),
        "u4": pd.Series([u4], dtype=np.int64),
        "t_stat": pd.Series([t_stat], dtype=np.float64)})


CVM_SQL = """
WITH c AS (SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM documents WHERE lang IN ('en', 'de') GROUP BY 1, 2),
p AS (SELECT v,
        CAST(COALESCE(sum(c) FILTER (WHERE lang = 'en'), 0) AS BIGINT) AS ca,
        CAST(COALESCE(sum(c) FILTER (WHERE lang = 'de'), 0) AS BIGINT) AS cb
      FROM c GROUP BY v),
w AS (SELECT v, ca, cb, ca + cb AS t,
        CAST(COALESCE(sum(ca + cb) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS cum,
        CAST(COALESCE(sum(ca) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS cuma,
        CAST(COALESCE(sum(cb) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS cumb
      FROM p),
e AS (SELECT
        CAST(COALESCE(sum(ca), 0) AS HUGEINT) AS n,
        CAST(COALESCE(sum(cb), 0) AS HUGEINT) AS m,
        CAST(COALESCE(sum(
          ca * CAST(2*cum + t + 1 - 2*cuma AS HUGEINT)
             * (2*cum + t + 1 - 2*cuma)
          - 2 * CAST(2*cum + t + 1 - 2*cuma AS HUGEINT) * ca * (ca + 1)
          + 4 * ((CAST(ca AS HUGEINT) * (ca + 1) * (2*ca + 1)) // 6)), 0)
          AS HUGEINT) AS sa,
        CAST(COALESCE(sum(
          cb * CAST(2*cum + t + 1 - 2*cumb AS HUGEINT)
             * (2*cum + t + 1 - 2*cumb)
          - 2 * CAST(2*cum + t + 1 - 2*cumb AS HUGEINT) * cb * (cb + 1)
          + 4 * ((CAST(cb AS HUGEINT) * (cb + 1) * (2*cb + 1)) // 6)), 0)
          AS HUGEINT) AS sb
      FROM w)
SELECT CAST(n AS BIGINT) AS n_a, CAST(m AS BIGINT) AS n_b,
       CAST(n * sa + m * sb AS BIGINT) AS u4,
       CASE WHEN n = 0 OR m = 0 THEN 0.0
            ELSE CAST(3 * (n * sa + m * sb)
                      - 2 * n * m * (4 * n * m - 1) AS DOUBLE)
               / CAST(12 * n * m * (n + m) AS DOUBLE)
       END AS t_stat
FROM e
"""


# ---- Grubbs max-studentized-deviation outlier test --------------------------

def grubbs_daily_revenue(sf_dir: str, block_gate: int = 512):
    """One-row (n_days, peak_day, max_dev, g) — the Grubbs test over the
    daily-revenue series: the most extreme day's studentized deviation
    from the mean, the single-outlier detector that complements
    :func:`cusum_daily_events` (level shift) and the runs test
    (clustering). Exactness: daily revenue is the floor-cents integer
    fold; ``dev_d = |n·c_d − S|`` (S = Σc) is exact so the ARGMAX day and
    ``max_dev`` never touch floats (ties → smallest day); the one float
    is the identically-spelled IEEE chain

        G = max_dev / √( n · (n·SS − S²) / (n−1) )

    (each step correctly rounded from exact ints — HUGEINT-range in SQL
    since SS = Σc² overflows int64, Python ints driver-side; 0.0 when
    n < 2 or the variance is 0).

    Scale shape: per-day cells are calendar-bounded → shared gated cell
    fold; driver math is O(days)."""
    import math

    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("o_orderdate"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), 100)), pa.int64())
        g = pa.table({"d": d, "c": cents}).group_by("d").aggregate(
            [("c", "sum")])
        return pa.table({"d": pc.cast(g.column("d"), pa.int64()),
                         "c": pc.cast(g.column("c_sum"), pa.int64())})

    cells = fold_cells(scan, partial, ["d"], sums=["c"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({
            "n_days": pd.Series([0], dtype=np.int64),
            "peak_day": pd.Series([0], dtype=np.int64),
            "max_dev": pd.Series([0], dtype=np.int64),
            "g": pd.Series([0.0], dtype=np.float64)})
    cells = cells.sort_values("d")
    days = cells["d"].tolist()
    cs = [int(x) for x in cells["c"].tolist()]
    n = len(cs)
    s = sum(cs)
    ss = sum(x * x for x in cs)
    devs = [abs(n * x - s) for x in cs]
    max_dev = max(devs)
    peak_day = int(days[devs.index(max_dev)])
    var_num = n * ss - s * s
    if n < 2 or var_num <= 0:
        g = 0.0
    else:
        g = float(max_dev) / math.sqrt(
            float(n) * float(var_num) / float(n - 1))
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype=np.int64),
        "peak_day": pd.Series([peak_day], dtype=np.int64),
        "max_dev": pd.Series([max_dev], dtype=np.int64),
        "g": pd.Series([g], dtype=np.float64)})


GRUBBS_SQL = """
WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                    AS day,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS c
           FROM orders GROUP BY 1),
a AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(COALESCE(sum(c), 0) AS HUGEINT) AS s,
             CAST(COALESCE(sum(CAST(c AS HUGEINT) * c), 0) AS HUGEINT) AS ss
      FROM d),
dev AS (SELECT day,
               abs((SELECT n FROM a) * c - (SELECT s FROM a)) AS dv
        FROM d),
mx AS (SELECT max(dv) AS num FROM dev),
pk AS (SELECT min(day) AS peak_day FROM dev
       WHERE dv = (SELECT num FROM mx))
SELECT CAST((SELECT n FROM a) AS BIGINT) AS n_days,
       (SELECT peak_day FROM pk) AS peak_day,
       CAST((SELECT num FROM mx) AS BIGINT) AS max_dev,
       CASE WHEN (SELECT n FROM a) < 2
              OR (SELECT n FROM a) * (SELECT ss FROM a)
                 - (SELECT s FROM a) * (SELECT s FROM a) <= 0 THEN 0.0
            ELSE CAST((SELECT num FROM mx) AS DOUBLE)
                 / sqrt(CAST((SELECT n FROM a) AS DOUBLE)
                        * CAST((SELECT n FROM a) * (SELECT ss FROM a)
                               - (SELECT s FROM a) * (SELECT s FROM a)
                               AS DOUBLE)
                        / CAST((SELECT n FROM a) - 1 AS DOUBLE))
       END AS g
"""
# ---- Hartley's F-max variance-homogeneity screen ----------------------------

def fmax_chars_langs(sf_dir: str, block_gate: int = 512):
    """One-row (lang_max, lang_min, n_max, n_min, fmax) — Hartley's F-max
    screen over document length: the ratio of the LARGEST per-language
    sample variance to the SMALLEST (the quick variance-homogeneity check
    that complements brown_forsythe's F). Exactness: per-lang (n, S=Σv,
    SS=Σv²) are integer folds; s²_i = num_i/den_i with num_i = n·SS − S²
    and den_i = n(n−1), and both the ARGMAX/ARGMIN selection and any tie
    are decided by exact cross-multiplied integer comparison
    (num_i·den_j vs num_j·den_i, ties → lexicographically smaller lang)
    — no float ever orders the groups. The one float is a single
    division of exact integer products

        F_max = (num_mx · den_mn) / (num_mn · den_mx)

    (0.0 when the smallest variance is 0 or no lang has n ≥ 2).

    Scale shape: per-(lang) moment partials are bounded by the lang
    vocabulary → shared gated cell fold; driver math is O(langs²) Python
    ints (HUGEINT-range in SQL)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": b.column("lang").to_pandas(),
            "v": b.column("n_chars").to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        df["vv"] = df["v"] * df["v"]
        g = df.groupby("lang", sort=False).agg(
            n=("v", "size"), s=("v", "sum"), ss=("vv", "sum")) \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    cells = fold_cells(scan, partial, ["lang"], sums=["n", "s", "ss"],
                       block_gate=block_gate)
    zero = pd.DataFrame({
        "lang_max": pd.Series([""], dtype=object),
        "lang_min": pd.Series([""], dtype=object),
        "n_max": pd.Series([0], dtype=np.int64),
        "n_min": pd.Series([0], dtype=np.int64),
        "fmax": pd.Series([0.0], dtype=np.float64)})
    if not len(cells):
        return zero
    groups = []
    for row in cells.itertuples(index=False):
        n, s, ss = int(row.n), int(row.s), int(row.ss)
        if n >= 2:
            groups.append((str(row.lang), n, n * ss - s * s,
                           n * (n - 1)))
    if not groups:
        return zero

    def prefer(a, b, sign):
        # a preferred to b for the max (sign=+1) / min (sign=−1) slot:
        # exact cross-multiplied variance compare, ties → smaller lang
        d = a[2] * b[3] - b[2] * a[3]
        return sign * d > 0 or (d == 0 and a[0] < b[0])

    mx = mn = groups[0]
    for g in groups[1:]:
        if prefer(g, mx, +1):
            mx = g
        if prefer(g, mn, -1):
            mn = g
    fmax = 0.0 if mn[2] == 0 else \
        float(mx[2] * mn[3]) / float(mn[2] * mx[3])
    return pd.DataFrame({
        "lang_max": pd.Series([mx[0]], dtype=object),
        "lang_min": pd.Series([mn[0]], dtype=object),
        "n_max": pd.Series([mx[1]], dtype=np.int64),
        "n_min": pd.Series([mn[1]], dtype=np.int64),
        "fmax": pd.Series([fmax], dtype=np.float64)})


FMAX_SQL = """
WITH a AS (SELECT lang, CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(n_chars) AS HUGEINT) AS s,
                  CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT)
                    AS ss
           FROM documents GROUP BY 1),
f AS (SELECT lang, n, n * ss - s * s AS num, n * (n - 1) AS den
      FROM a WHERE n >= 2),
mx AS (SELECT lang, n, num, den FROM f x
       WHERE NOT EXISTS (SELECT 1 FROM f y
                         WHERE y.num * x.den > x.num * y.den
                            OR (y.num * x.den = x.num * y.den
                                AND y.lang < x.lang))),
mn AS (SELECT lang, n, num, den FROM f x
       WHERE NOT EXISTS (SELECT 1 FROM f y
                         WHERE y.num * x.den < x.num * y.den
                            OR (y.num * x.den = x.num * y.den
                                AND y.lang < x.lang)))
SELECT mx.lang AS lang_max, mn.lang AS lang_min,
       CAST(mx.n AS BIGINT) AS n_max, CAST(mn.n AS BIGINT) AS n_min,
       CASE WHEN mn.num = 0 THEN 0.0
            ELSE CAST(mx.num * mn.den AS DOUBLE)
                 / CAST(mn.num * mx.den AS DOUBLE) END AS fmax
FROM mx, mn
"""


# ---- Bowley (quartile) skewness per language ---------------------------------

def bowley_skew_chars_langs(sf_dir: str, block_gate: int = 512):
    """(lang, n, q1_2, q2_2, q3_2, bowley) — the Bowley quartile-skewness
    of document length per language: a robust shape statistic the
    moment-based skew cannot give under heavy tails. Exactness: each
    DOUBLED quartile q_2 = v[floor(h)] + v[ceil(h)] at h = (n+1)·p
    (clamped to [1, n]) generalizes the repo's doubled-median device —
    an exact integer from the per-lang length histogram — and the 2×
    factors cancel in

        bowley = (q3_2 + q1_2 − 2·q2_2) / (q3_2 − q1_2)

    so the one float per lang is a single division of exact integers
    (0.0 when the IQR is 0).

    Scale shape: (lang, n_chars) cells → shared gated cell fold; driver
    math is O(cells)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "n_chars"]).aggregate([("n_chars", "count")])
        return pa.table({"lang": g.column("lang"),
                         "v": pc.cast(g.column("n_chars"), pa.int64()),
                         "c": pc.cast(g.column("n_chars_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["lang", "v"], sums=["c"],
                       block_gate=block_gate)
    empty = pd.DataFrame({
        "lang": pd.Series([], dtype=object),
        "n": pd.Series([], dtype=np.int64),
        "q1_2": pd.Series([], dtype=np.int64),
        "q2_2": pd.Series([], dtype=np.int64),
        "q3_2": pd.Series([], dtype=np.int64),
        "bowley": pd.Series([], dtype=np.float64)})
    if not len(cells):
        return empty
    rows = []
    for lang, g in cells.groupby("lang"):
        g = g.sort_values("v")
        v = g["v"].to_numpy(np.int64)
        cume = np.cumsum(g["c"].to_numpy(np.int64))
        n = int(cume[-1])

        def at(idx):  # 1-indexed order statistic, clamped
            idx = min(max(idx, 1), n)
            return int(v[np.searchsorted(cume, idx)])

        q1 = at((n + 1) // 4) + at((n + 4) // 4)
        q2 = at((n + 1) // 2) + at((n + 2) // 2)
        q3 = at((3 * n + 3) // 4) + at((3 * n + 6) // 4)
        b = 0.0 if q3 == q1 else \
            float(q3 + q1 - 2 * q2) / float(q3 - q1)
        rows.append((str(lang), n, q1, q2, q3, b))
    out = pd.DataFrame(rows, columns=["lang", "n", "q1_2", "q2_2",
                                      "q3_2", "bowley"])
    for c in ("n", "q1_2", "q2_2", "q3_2"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


BOWLEY_SKEW_SQL = """
WITH c AS (SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
w AS (SELECT lang, v,
             CAST(sum(c) OVER (PARTITION BY lang ORDER BY v) AS BIGINT)
               AS cume
      FROM c),
n AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
ix AS (SELECT lang, n,
              GREATEST(LEAST((n + 1) // 4, n), 1) AS i1l,
              GREATEST(LEAST((n + 4) // 4, n), 1) AS i1h,
              GREATEST(LEAST((n + 1) // 2, n), 1) AS i2l,
              GREATEST(LEAST((n + 2) // 2, n), 1) AS i2h,
              GREATEST(LEAST((3 * n + 3) // 4, n), 1) AS i3l,
              GREATEST(LEAST((3 * n + 6) // 4, n), 1) AS i3h
       FROM n),
q AS (SELECT ix.lang, ix.n,
        (SELECT min(v) FROM w WHERE w.lang = ix.lang
                                AND w.cume >= ix.i1l)
      + (SELECT min(v) FROM w WHERE w.lang = ix.lang
                                AND w.cume >= ix.i1h) AS q1_2,
        (SELECT min(v) FROM w WHERE w.lang = ix.lang
                                AND w.cume >= ix.i2l)
      + (SELECT min(v) FROM w WHERE w.lang = ix.lang
                                AND w.cume >= ix.i2h) AS q2_2,
        (SELECT min(v) FROM w WHERE w.lang = ix.lang
                                AND w.cume >= ix.i3l)
      + (SELECT min(v) FROM w WHERE w.lang = ix.lang
                                AND w.cume >= ix.i3h) AS q3_2
      FROM ix)
SELECT lang, n, q1_2, q2_2, q3_2,
       CASE WHEN q3_2 = q1_2 THEN 0.0
            ELSE CAST(q3_2 + q1_2 - 2 * q2_2 AS DOUBLE)
                 / CAST(q3_2 - q1_2 AS DOUBLE) END AS bowley
FROM q ORDER BY lang
"""



# ---- maximum drawdown of the daily-revenue series ----------------------------

def max_drawdown_daily_revenue(sf_dir: str, block_gate: int = 512):
    """One-row (n_days, peak_day, trough_day, max_drawdown) — the maximum
    peak-to-trough drop of the daily-revenue series: the largest amount
    (exact cents) by which a day's revenue sits below the highest earlier
    day — the worst-regression window the z-score outlier test (one-day)
    and CUSUM (level shift) don't isolate. All-integer: daily cents fold,
    running max, drawdown = runmax − value, argmax with deterministic
    ties (earliest trough; earliest day achieving that peak value).

    Scale shape: per-day cells are calendar-bounded → shared gated cell
    fold; the running max is O(days) driver work."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("o_orderdate"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), 100)), pa.int64())
        g = pa.table({"d": d, "c": cents}).group_by("d").aggregate(
            [("c", "sum")])
        return pa.table({"d": pc.cast(g.column("d"), pa.int64()),
                         "c": pc.cast(g.column("c_sum"), pa.int64())})

    cells = fold_cells(scan, partial, ["d"], sums=["c"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({
            "n_days": pd.Series([0], dtype=np.int64),
            "peak_day": pd.Series([0], dtype=np.int64),
            "trough_day": pd.Series([0], dtype=np.int64),
            "max_drawdown": pd.Series([0], dtype=np.int64)})
    cells = cells.sort_values("d").reset_index(drop=True)
    days = cells["d"].to_numpy(np.int64)
    c = cells["c"].to_numpy(np.int64)
    runmax = np.maximum.accumulate(c)
    dd = runmax - c
    mdd = int(dd.max())
    trough_i = int(np.argmax(dd))          # first max (earliest trough)
    trough_day = int(days[trough_i])
    peak_val = int(runmax[trough_i])
    peak_day = int(days[np.argmax(c == peak_val)])  # earliest peak day
    return pd.DataFrame({
        "n_days": pd.Series([len(days)], dtype=np.int64),
        "peak_day": pd.Series([peak_day], dtype=np.int64),
        "trough_day": pd.Series([trough_day], dtype=np.int64),
        "max_drawdown": pd.Series([mdd], dtype=np.int64)})


MAX_DRAWDOWN_SQL = """
WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                    AS day,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS c
           FROM orders GROUP BY 1),
w AS (SELECT day, c, max(c) OVER (ORDER BY day) AS runmax FROM d),
x AS (SELECT day, c, runmax, runmax - c AS dd FROM w),
mx AS (SELECT max(dd) AS mdd FROM x),
tr AS (SELECT min(day) AS trough_day FROM x
       WHERE dd = (SELECT mdd FROM mx)),
pv AS (SELECT runmax AS peak_val FROM x
       WHERE day = (SELECT trough_day FROM tr)),
pk AS (SELECT min(day) AS peak_day FROM x
       WHERE c = (SELECT peak_val FROM pv))
SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
       (SELECT peak_day FROM pk) AS peak_day,
       (SELECT trough_day FROM tr) AS trough_day,
       (SELECT CAST(mdd AS BIGINT) FROM mx) AS max_drawdown
"""



# ---- integer Holt double-exponential smoothing --------------------------------

def holt_daily_events(sf_dir: str, block_gate: int = 512):
    """(day, c, level_units, trend_units, forecast_units) — Holt's
    double-exponential (level + trend) smoothing of the daily event-count
    series, in EXACT integers: with power-of-two smoothing factors
    α = β = 1/2 and counts scaled to units u = c·2²⁰, the recursion

        level_t = (level_{t-1} + trend_{t-1} + c_t·2²⁰) // 2
        trend_t = (trend_{t-1} + (level_t − level_{t-1})) // 2
        forecast_t = level_t + trend_t            (one-step-ahead)

    is integer-only (all divisions spelled with DuckDB's TRUNCATING
    signed semantics — the trend goes negative on declines, where Python
    ``//`` floors and would diverge), so a fixed pass is
    bit-reproducible — the
    trend-aware extension of :func:`ewma_daily_events` (which cannot
    track a ramp without lagging it). SQL oracle = the same recursion as
    a RECURSIVE CTE carrying (level, trend). Initialization:
    level_0 = c_0·2²⁰, trend_0 = 0; the calendar is zero-filled so both
    engines step the identical day sequence.

    Scale shape: per-day count cells are calendar-bounded → shared gated
    cell fold; the recursion is O(days) driver work at any corpus
    size."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("ts"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        g = pa.table({"d": d}).group_by("d").aggregate([("d", "count")])
        return pa.table({"d": pc.cast(g.column("d"), pa.int64()),
                         "c": pc.cast(g.column("d_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["d"], sums=["c"],
                       block_gate=block_gate)
    empty = pd.DataFrame({
        "day": pd.Series([], dtype=np.int64),
        "c": pd.Series([], dtype=np.int64),
        "level_units": pd.Series([], dtype=np.int64),
        "trend_units": pd.Series([], dtype=np.int64),
        "forecast_units": pd.Series([], dtype=np.int64)})
    if not len(cells):
        return empty
    cells = cells.sort_values("d")
    lo, hi = int(cells["d"].iloc[0]), int(cells["d"].iloc[-1])
    cal = np.zeros(hi - lo + 1, dtype=np.int64)
    cal[cells["d"].to_numpy(np.int64) - lo] = cells["c"].to_numpy(np.int64)
    scale = 1 << 20

    def t2(x):  # DuckDB signed // truncates toward zero; Python floors
        return -((-x) // 2) if x < 0 else x // 2

    level = int(cal[0]) * scale
    trend = 0
    rows = [(lo, int(cal[0]), level, trend, level + trend)]
    for i in range(1, len(cal)):
        nl = t2(level + trend + int(cal[i]) * scale)
        trend = t2(trend + (nl - level))
        level = nl
        rows.append((lo + i, int(cal[i]), level, trend, level + trend))
    out = pd.DataFrame(rows, columns=["day", "c", "level_units",
                                      "trend_units", "forecast_units"])
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


HOLT_DAILY_SQL = """
WITH RECURSIVE
b AS (SELECT CAST(epoch_us(min(ts)) // 86400000000 AS BIGINT) AS lo,
             CAST(epoch_us(max(ts)) // 86400000000 AS BIGINT) AS hi
      FROM events),
cc AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
              CAST(count(*) AS BIGINT) AS c
       FROM events GROUP BY 1),
s AS (SELECT cal.d, COALESCE(cc.c, 0) AS c
      FROM (SELECT unnest(generate_series(b.lo, b.hi)) AS d FROM b) cal
      LEFT JOIN cc USING (d)),
rec AS (
  SELECT s.d, s.c, CAST(s.c * 1048576 AS BIGINT) AS lvl,
         CAST(0 AS BIGINT) AS tr
  FROM s, b WHERE s.d = b.lo
  UNION ALL
  SELECT s.d, s.c,
         CAST((rec.lvl + rec.tr + s.c * 1048576) // 2 AS BIGINT) AS lvl,
         CAST((rec.tr + ((rec.lvl + rec.tr + s.c * 1048576) // 2
                         - rec.lvl)) // 2 AS BIGINT) AS tr
  FROM rec JOIN s ON s.d = rec.d + 1)
SELECT d AS day, c, lvl AS level_units, tr AS trend_units,
       lvl + tr AS forecast_units
FROM rec ORDER BY day
"""


# ---- Tukey-fence outlier rates per language -----------------------------------

def tukey_fence_outliers_lang(sf_dir: str, block_gate: int = 512):
    """(lang, n, low_fence4, high_fence4, n_low, n_high) — per language,
    how many document lengths fall outside the Tukey 1.5·IQR fences —
    the boxplot outlier-rate audit. Exactness: with the DOUBLED quartiles
    q_2 of :func:`bowley_skew_chars_langs`, the fences at 4× scale are
    exact integers

        low4  = 5·q1_2 − 3·q3_2      (= 4·(Q1 − 1.5·IQR))
        high4 = 5·q3_2 − 3·q1_2      (= 4·(Q3 + 1.5·IQR))

    and the outlier predicate ``4v < low4`` / ``4v > high4`` never
    touches a float.

    Scale shape: (lang, n_chars) cells → shared gated cell fold; counts
    come from the SAME cells (no second scan)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "n_chars"]).aggregate([("n_chars", "count")])
        return pa.table({"lang": g.column("lang"),
                         "v": pc.cast(g.column("n_chars"), pa.int64()),
                         "c": pc.cast(g.column("n_chars_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["lang", "v"], sums=["c"],
                       block_gate=block_gate)
    empty = pd.DataFrame({
        "lang": pd.Series([], dtype=object),
        "n": pd.Series([], dtype=np.int64),
        "low_fence4": pd.Series([], dtype=np.int64),
        "high_fence4": pd.Series([], dtype=np.int64),
        "n_low": pd.Series([], dtype=np.int64),
        "n_high": pd.Series([], dtype=np.int64)})
    if not len(cells):
        return empty
    rows = []
    for lang, g in cells.groupby("lang"):
        g = g.sort_values("v")
        v = g["v"].to_numpy(np.int64)
        cc = g["c"].to_numpy(np.int64)
        cume = np.cumsum(cc)
        n = int(cume[-1])

        def at(idx):
            idx = min(max(idx, 1), n)
            return int(v[np.searchsorted(cume, idx)])

        q1 = at((n + 1) // 4) + at((n + 4) // 4)
        q3 = at((3 * n + 3) // 4) + at((3 * n + 6) // 4)
        low4 = 5 * q1 - 3 * q3
        high4 = 5 * q3 - 3 * q1
        n_low = int(cc[4 * v < low4].sum())
        n_high = int(cc[4 * v > high4].sum())
        rows.append((str(lang), n, low4, high4, n_low, n_high))
    out = pd.DataFrame(rows, columns=["lang", "n", "low_fence4",
                                      "high_fence4", "n_low", "n_high"])
    for col in ("n", "low_fence4", "high_fence4", "n_low", "n_high"):
        out[col] = out[col].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


TUKEY_FENCE_SQL = """
WITH c AS (SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
w AS (SELECT lang, v,
             CAST(sum(c) OVER (PARTITION BY lang ORDER BY v) AS BIGINT)
               AS cume
      FROM c),
n AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
ix AS (SELECT lang, n,
              GREATEST(LEAST((n + 1) // 4, n), 1) AS i1l,
              GREATEST(LEAST((n + 4) // 4, n), 1) AS i1h,
              GREATEST(LEAST((3 * n + 3) // 4, n), 1) AS i3l,
              GREATEST(LEAST((3 * n + 6) // 4, n), 1) AS i3h
       FROM n),
q AS (SELECT ix.lang, ix.n,
        (SELECT min(v) FROM w WHERE w.lang = ix.lang
                                AND w.cume >= ix.i1l)
      + (SELECT min(v) FROM w WHERE w.lang = ix.lang
                                AND w.cume >= ix.i1h) AS q1_2,
        (SELECT min(v) FROM w WHERE w.lang = ix.lang
                                AND w.cume >= ix.i3l)
      + (SELECT min(v) FROM w WHERE w.lang = ix.lang
                                AND w.cume >= ix.i3h) AS q3_2
      FROM ix),
f AS (SELECT lang, n, 5 * q1_2 - 3 * q3_2 AS low_fence4,
             5 * q3_2 - 3 * q1_2 AS high_fence4
      FROM q)
SELECT f.lang, f.n, f.low_fence4, f.high_fence4,
       CAST(COALESCE(sum(c.c) FILTER (WHERE 4 * c.v < f.low_fence4), 0)
            AS BIGINT) AS n_low,
       CAST(COALESCE(sum(c.c) FILTER (WHERE 4 * c.v > f.high_fence4), 0)
            AS BIGINT) AS n_high
FROM f JOIN c ON c.lang = f.lang
GROUP BY 1, 2, 3, 4 ORDER BY f.lang
"""



# ---- Cohen's d / Hedges' g effect size ----------------------------------------

def cohens_d_chars_langs(sf_dir: str, lang_a: str = "en",
                         lang_b: str = "de", block_gate: int = 512):
    """One-row (n_a, n_b, cohens_d, hedges_g) — the standardized mean
    difference of document length between two languages: the EFFECT-SIZE
    companion to welch_t_chars_langs' significance (a huge corpus makes
    tiny differences "significant"; d says whether they matter). With
    per-group exact integer moments (n, S, SS) and A_i = n_i·SS_i − S_i²,

        d = ((S1·n2 − S2·n1)/(n1·n2))
            / √((n2·A1 + n1·A2) / (n1·n2·(n1+n2−2)))
        g = d · (1 − 3/(4·(n1+n2) − 9))        (small-sample correction)

    — every operand an exact integer (HUGEINT in SQL, Python ints
    driver-side), each IEEE step identically spelled, so d and g are
    bitwise cross-engine (0.0 when either n < 2 or the pooled variance
    is 0).

    Scale shape: per-(lang) moment partials → shared gated cell fold;
    driver math is O(1)."""
    import math

    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])
    langs = (lang_a, lang_b)

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("lang"),
                              value_set=pa.array(list(langs))))
        df = pd.DataFrame({
            "lang": t.column("lang").to_pandas(),
            "v": t.column("n_chars").to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        df["vv"] = df["v"] * df["v"]
        g = df.groupby("lang", sort=False).agg(
            n=("v", "size"), s=("v", "sum"), ss=("vv", "sum")) \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    cells = fold_cells(scan, partial, ["lang"], sums=["n", "s", "ss"],
                       block_gate=block_gate)
    zero = pd.DataFrame({
        "n_a": pd.Series([0], dtype=np.int64),
        "n_b": pd.Series([0], dtype=np.int64),
        "cohens_d": pd.Series([0.0], dtype=np.float64),
        "hedges_g": pd.Series([0.0], dtype=np.float64)})
    m = {str(r.lang): (int(r.n), int(r.s), int(r.ss))
         for r in (cells.itertuples(index=False) if len(cells) else ())}
    if lang_a not in m or lang_b not in m:
        return zero
    n1, s1, ss1 = m[lang_a]
    n2, s2, ss2 = m[lang_b]
    if n1 < 2 or n2 < 2:
        return zero
    a1 = n1 * ss1 - s1 * s1
    a2 = n2 * ss2 - s2 * s2
    pooled_num = n2 * a1 + n1 * a2
    if pooled_num <= 0:
        return pd.DataFrame({
            "n_a": pd.Series([n1], dtype=np.int64),
            "n_b": pd.Series([n2], dtype=np.int64),
            "cohens_d": pd.Series([0.0], dtype=np.float64),
            "hedges_g": pd.Series([0.0], dtype=np.float64)})
    d = (float(s1 * n2 - s2 * n1) / float(n1 * n2)) \
        / math.sqrt(float(pooled_num)
                    / float(n1 * n2 * (n1 + n2 - 2)))
    g = d * (1.0 - 3.0 / float(4 * (n1 + n2) - 9))
    return pd.DataFrame({
        "n_a": pd.Series([n1], dtype=np.int64),
        "n_b": pd.Series([n2], dtype=np.int64),
        "cohens_d": pd.Series([d], dtype=np.float64),
        "hedges_g": pd.Series([g], dtype=np.float64)})


COHENS_D_SQL = """
WITH m AS (SELECT lang, CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(n_chars) AS HUGEINT) AS s,
                  CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT)
                    AS ss
           FROM documents WHERE lang IN ('en', 'de') GROUP BY 1),
p AS (SELECT
        COALESCE((SELECT n FROM m WHERE lang = 'en'), 0) AS n1,
        COALESCE((SELECT s FROM m WHERE lang = 'en'), 0) AS s1,
        COALESCE((SELECT ss FROM m WHERE lang = 'en'), 0) AS ss1,
        COALESCE((SELECT n FROM m WHERE lang = 'de'), 0) AS n2,
        COALESCE((SELECT s FROM m WHERE lang = 'de'), 0) AS s2,
        COALESCE((SELECT ss FROM m WHERE lang = 'de'), 0) AS ss2),
x AS (SELECT n1, n2, s1, s2,
             n1 * ss1 - s1 * s1 AS a1,
             n2 * ss2 - s2 * s2 AS a2
      FROM p),
y AS (SELECT n1, n2,
             CASE WHEN n1 < 2 OR n2 < 2 OR n2 * a1 + n1 * a2 <= 0
                  THEN 0.0
                  ELSE (CAST(s1 * n2 - s2 * n1 AS DOUBLE)
                        / CAST(n1 * n2 AS DOUBLE))
                       / sqrt(CAST(n2 * a1 + n1 * a2 AS DOUBLE)
                              / CAST(n1 * n2 * (n1 + n2 - 2) AS DOUBLE))
             END AS d
      FROM x)
SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
       d AS cohens_d,
       CASE WHEN d = 0.0 THEN 0.0
            ELSE d * (1.0 - 3.0 / CAST(4 * (n1 + n2) - 9 AS DOUBLE))
       END AS hedges_g
FROM y
"""



# ---- L-moment shape statistics per language ----------------------------------

def lmoments_chars_langs(sf_dir: str, block_gate: int = 512):
    """(lang, n, l_cv, l_skew) — the L-moment shape family of document
    length per language: L-CV τ = λ2/λ1 (robust dispersion) and
    L-skewness τ3 = λ3/λ2 — order-statistic moments that, unlike the
    classical skewness, have finite sample breakdown under the heavy
    tails web text actually has (Hosking 1990, public). Exactness: via
    probability-weighted moments B0 = Σx, B1 = Σ(i−1)x_(i),
    B2 = Σ(i−1)(i−2)x_(i) — all EXACT integer folds computed from the
    per-lang value histogram in closed form per cell (a value block at
    exclusive-cumulative offset p with count c contributes
    Σ(i−1) = c·p + c(c−1)/2 and Σ(i−1)(i−2) = f(p+c−1) − f(p−1),
    f(M) = (M+1)·M·(M−1)/3, both integral) —

        τ  = (2·B1 − (n−1)·B0) / ((n−1)·B0)
        τ3 = (6·B2 − 6·(n−2)·B1 + (n−1)·(n−2)·B0)
             / ((n−2)·(2·B1 − (n−1)·B0))

    — each ONE division of exact integers (HUGEINT in SQL, Python ints
    driver-side; 0.0 when a denominator is 0 or n < 3).

    Scale shape: (lang, n_chars) cells → shared gated cell fold; the
    closed forms need only the histogram, never sorted rows."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "n_chars"]).aggregate([("n_chars", "count")])
        return pa.table({"lang": g.column("lang"),
                         "v": pc.cast(g.column("n_chars"), pa.int64()),
                         "c": pc.cast(g.column("n_chars_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["lang", "v"], sums=["c"],
                       block_gate=block_gate)
    empty = pd.DataFrame({
        "lang": pd.Series([], dtype=object),
        "n": pd.Series([], dtype=np.int64),
        "l_cv": pd.Series([], dtype=np.float64),
        "l_skew": pd.Series([], dtype=np.float64)})
    if not len(cells):
        return empty

    def f(m: int) -> int:
        return (m + 1) * m * (m - 1) // 3

    rows = []
    for lang, g in cells.groupby("lang"):
        g = g.sort_values("v")
        n = b0 = b1 = b2 = 0
        p = 0
        for v, c in zip((int(x) for x in g["v"]),
                        (int(x) for x in g["c"])):
            b0 += c * v
            b1 += (c * p + c * (c - 1) // 2) * v
            b2 += (f(p + c - 1) - f(p - 1)) * v
            p += c
        n = p
        t_num = 2 * b1 - (n - 1) * b0
        t_den = (n - 1) * b0
        l_cv = 0.0 if (n < 2 or t_den == 0) else \
            float(t_num) / float(t_den)
        t3_num = 6 * b2 - 6 * (n - 2) * b1 + (n - 1) * (n - 2) * b0
        t3_den = (n - 2) * t_num
        l_skew = 0.0 if (n < 3 or t3_den == 0) else \
            float(t3_num) / float(t3_den)
        rows.append((str(lang), n, l_cv, l_skew))
    out = pd.DataFrame(rows, columns=["lang", "n", "l_cv", "l_skew"])
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


LMOMENTS_SQL = """
WITH c AS (SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
w AS (SELECT lang, v, c,
             CAST(COALESCE(sum(c) OVER (PARTITION BY lang ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS p
      FROM c),
a AS (SELECT lang,
        CAST(sum(c) AS HUGEINT) AS n,
        CAST(sum(CAST(c AS HUGEINT) * v) AS HUGEINT) AS b0,
        CAST(sum((CAST(c AS HUGEINT) * p + CAST(c AS HUGEINT) * (c - 1)
                  // 2) * v) AS HUGEINT) AS b1,
        CAST(sum(((CAST(p + c AS HUGEINT) * (p + c - 1) * (p + c - 2)
                   // 3)
                  - (CAST(p AS HUGEINT) * (p - 1) * (p - 2) // 3)) * v)
             AS HUGEINT) AS b2
      FROM w GROUP BY 1)
SELECT lang, CAST(n AS BIGINT) AS n,
       CASE WHEN n < 2 OR (n - 1) * b0 = 0 THEN 0.0
            ELSE CAST(2 * b1 - (n - 1) * b0 AS DOUBLE)
                 / CAST((n - 1) * b0 AS DOUBLE) END AS l_cv,
       CASE WHEN n < 3 OR (n - 2) * (2 * b1 - (n - 1) * b0) = 0 THEN 0.0
            ELSE CAST(6 * b2 - 6 * (n - 2) * b1
                      + (n - 1) * (n - 2) * b0 AS DOUBLE)
                 / CAST((n - 2) * (2 * b1 - (n - 1) * b0) AS DOUBLE)
       END AS l_skew
FROM a ORDER BY lang
"""



# ---- von Neumann successive-difference randomness ratio ----------------------

def von_neumann_daily_revenue(sf_dir: str, block_gate: int = 512):
    """One-row (n_days, d2_sum, var_num, vn) — the von Neumann ratio of
    the daily-revenue series: successive-difference mean square over the
    variance,

        η = n²·Σ(x_{t+1} − x_t)² / ((n−1)·(n·Σx² − S²))

    (≈ 2 for white noise, ≪ 2 trending/sticky, ≫ 2 oscillating) — the
    raw-series randomness screen beside durbin_watson (which tests OLS
    residuals, not the series itself). Steps are CONSECUTIVE OBSERVED
    days in day order (gaps close up — documented convention, mirrored
    in SQL's lag over day order). All inputs are exact integers (cents;
    Σd² and Σx² in Python ints / HUGEINT — they overflow int64), the one
    float is a single division (0.0 when n < 2 or the variance is 0).

    Scale shape: per-day cents cells are calendar-bounded → shared gated
    cell fold; the diff is O(days) driver work."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("o_orderdate"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), 100)), pa.int64())
        g = pa.table({"d": d, "c": cents}).group_by("d").aggregate(
            [("c", "sum")])
        return pa.table({"d": pc.cast(g.column("d"), pa.int64()),
                         "c": pc.cast(g.column("c_sum"), pa.int64())})

    cells = fold_cells(scan, partial, ["d"], sums=["c"],
                       block_gate=block_gate)
    zero = pd.DataFrame({
        "n_days": pd.Series([0], dtype=np.int64),
        "d2_sum": pd.Series([0.0], dtype=np.float64),
        "var_num": pd.Series([0.0], dtype=np.float64),
        "vn": pd.Series([0.0], dtype=np.float64)})
    if not len(cells):
        return zero
    cells = cells.sort_values("d")
    c = [int(x) for x in cells["c"].tolist()]
    n = len(c)
    s = sum(c)
    ss = sum(x * x for x in c)
    d2 = sum((b - a) * (b - a) for a, b in zip(c[:-1], c[1:]))
    var_num = n * ss - s * s
    vn = 0.0 if (n < 2 or var_num <= 0) else \
        float(n * n * d2) / float((n - 1) * var_num)
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype=np.int64),
        "d2_sum": pd.Series([float(d2)], dtype=np.float64),
        "var_num": pd.Series([float(var_num)], dtype=np.float64),
        "vn": pd.Series([vn], dtype=np.float64)})


VON_NEUMANN_SQL = """
WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                    AS day,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS c
           FROM orders GROUP BY 1),
w AS (SELECT day, c, lag(c) OVER (ORDER BY day) AS pc FROM d),
a AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(COALESCE(sum(c), 0) AS HUGEINT) AS s,
             CAST(COALESCE(sum(CAST(c AS HUGEINT) * c), 0) AS HUGEINT)
               AS ss,
             CAST(COALESCE(sum(CAST(c - pc AS HUGEINT) * (c - pc)), 0)
                  AS HUGEINT) AS d2
      FROM w)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(d2 AS DOUBLE) AS d2_sum,
       CAST(n * ss - s * s AS DOUBLE) AS var_num,
       CASE WHEN n < 2 OR n * ss - s * s <= 0 THEN 0.0
            ELSE CAST(n * n * d2 AS DOUBLE)
                 / CAST((n - 1) * (n * ss - s * s) AS DOUBLE)
       END AS vn
FROM a
"""


# ---- bit-shift exponential decay popularity ---------------------------------

def decayed_type_scores(sf_dir: str, block_gate: int = 512):
    """(event_type, n_events, score) — recency-weighted popularity per
    event type with EXACT exponential decay: each event contributes
    ``2⁴⁰ >> min(age_days, 62)`` units (half-life = one day), so recent
    activity dominates without any float ever existing — the
    integer-shift decay device (floats make time-decay scores
    irreproducible across summation orders; shifts are exact in any
    order). The corpus end (max event day) anchors age in BOTH engines
    identically.

    Scale shape: (type, day) cells are calendar-bounded → shared gated
    cell fold; the decay weighting is O(cells) driver math."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("ts"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        t = pa.table({"d": d, "ty": b.column("event_type")})
        g = t.group_by(["d", "ty"]).aggregate([("d", "count")])
        return pa.table({"d": pc.cast(g.column("d"), pa.int64()),
                         "ty": g.column("ty"),
                         "c": pc.cast(g.column("d_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["d", "ty"], sums=["c"],
                       block_gate=block_gate)
    empty = pd.DataFrame({
        "event_type": pd.Series([], dtype=object),
        "n_events": pd.Series([], dtype=np.int64),
        "score": pd.Series([], dtype=np.int64)})
    if not len(cells):
        return empty
    end = int(cells["d"].max())
    scale = 1 << 40
    rows = {}
    for d, ty, c in zip(cells["d"], cells["ty"], cells["c"]):
        age = min(end - int(d), 62)
        n, s = rows.get(str(ty), (0, 0))
        rows[str(ty)] = (n + int(c), s + int(c) * (scale >> age))
    out = pd.DataFrame(
        [(ty, n, s) for ty, (n, s) in rows.items()],
        columns=["event_type", "n_events", "score"])
    out["n_events"] = out["n_events"].astype(np.int64)
    out["score"] = out["score"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


DECAYED_SCORES_SQL = """
WITH c AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
                  event_type AS ty, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
e AS (SELECT max(d) AS e FROM c)
SELECT ty AS event_type, CAST(sum(c) AS BIGINT) AS n_events,
       CAST(sum(c * (CAST(1099511627776 AS BIGINT)
                     >> LEAST((SELECT e FROM e) - d, 62))) AS BIGINT)
         AS score
FROM c GROUP BY ty ORDER BY ty
"""


# ---- runs-up-and-down randomness test ----------------------------------------

def runs_up_down_daily_revenue(sf_dir: str, block_gate: int = 512):
    """One-row (n_eff, n_runs, z) — the runs-up-and-down test on daily
    revenue: count maximal runs of consecutive INCREASES or DECREASES
    (zero diffs dropped — documented convention, identical in both
    engines); too few runs = momentum, too many = mean-reversion. The
    direction-based complement of runs_test_daily_revenue's level-based
    runs. With n_eff = (#nonzero diffs) + 1 observations,

        z = ((3·R − (2·n_eff − 1))/3) / √((16·n_eff − 29)/90)

    — numerator exact integer, one identically-spelled IEEE chain (0.0
    when n_eff < 3).

    Scale shape: per-day cents cells are calendar-bounded → shared gated
    cell fold; the run count is O(days) driver work."""
    import math

    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("o_orderdate"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), 100)), pa.int64())
        g = pa.table({"d": d, "c": cents}).group_by("d").aggregate(
            [("c", "sum")])
        return pa.table({"d": pc.cast(g.column("d"), pa.int64()),
                         "c": pc.cast(g.column("c_sum"), pa.int64())})

    cells = fold_cells(scan, partial, ["d"], sums=["c"],
                       block_gate=block_gate)
    zero = pd.DataFrame({
        "n_eff": pd.Series([0], dtype=np.int64),
        "n_runs": pd.Series([0], dtype=np.int64),
        "z": pd.Series([0.0], dtype=np.float64)})
    if not len(cells):
        return zero
    cells = cells.sort_values("d")
    c = cells["c"].to_numpy(np.int64)
    diffs = np.diff(c)
    signs = np.sign(diffs[diffs != 0])
    m = len(signs)
    n_eff = m + 1
    if m == 0:
        return pd.DataFrame({
            "n_eff": pd.Series([n_eff], dtype=np.int64),
            "n_runs": pd.Series([0], dtype=np.int64),
            "z": pd.Series([0.0], dtype=np.float64)})
    runs = 1 + int((signs[1:] != signs[:-1]).sum())
    if n_eff < 3:
        z = 0.0
    else:
        z = (float(3 * runs - (2 * n_eff - 1)) / 3.0) \
            / math.sqrt(float(16 * n_eff - 29) / 90.0)
    return pd.DataFrame({
        "n_eff": pd.Series([n_eff], dtype=np.int64),
        "n_runs": pd.Series([runs], dtype=np.int64),
        "z": pd.Series([z], dtype=np.float64)})


RUNS_UP_DOWN_SQL = """
WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                    AS day,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS c
           FROM orders GROUP BY 1),
w AS (SELECT day, c - lag(c) OVER (ORDER BY day) AS df FROM d),
s AS (SELECT day, CASE WHEN df > 0 THEN 1 ELSE -1 END AS sg
      FROM w WHERE df IS NOT NULL AND df <> 0),
r AS (SELECT sg, lag(sg) OVER (ORDER BY day) AS pg FROM s),
a AS (SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(COALESCE(sum(CASE WHEN pg IS NOT NULL AND sg <> pg
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS changes
      FROM r)
SELECT CAST(m + 1 AS BIGINT) AS n_eff,
       CAST(CASE WHEN m = 0 THEN 0 ELSE changes + 1 END AS BIGINT)
         AS n_runs,
       CASE WHEN m = 0 OR m + 1 < 3 THEN 0.0
            ELSE (CAST(3 * (changes + 1) - (2 * (m + 1) - 1) AS DOUBLE)
                  / 3.0)
                 / sqrt(CAST(16 * (m + 1) - 29 AS DOUBLE) / 90.0)
       END AS z
FROM a
"""
