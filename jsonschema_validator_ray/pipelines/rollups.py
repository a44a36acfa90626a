"""Window-frame and per-group order-statistic rollups — the reporting
shapes (grouped MODE, trailing moving-average frames, lifetime survival
curves, mutual information) a corpus dashboard computes from the same
fused scans as the validation checks.

Exactness discipline (repo convention): every oracle-compared number is
an exact integer (counts, floor-ppm) or ONE identically-spelled IEEE
expression over exact integers; ln uses the integer-ln technique
(``floor(ln(x)·10⁶)`` per CELL — scalar libm log, never numpy's SIMD
log) so sums stay integer.

Scale shapes:
- :func:`mode_event_type_users` — per-USER modal value: user cardinality
  is unbounded, so the (user, type, n) partials hash-exchange on
  ``user_id & 63`` past the block gate and the per-bucket pandas fold is
  already global for its users; under the gate the partials fold
  driver-side (Ray's ~2 s exchange floor dwarfs the fold at bench
  scale). Path equality pinned at ``block_gate=0``.
- :func:`moving_avg_daily_events` — the window-FRAME shape (``ROWS
  BETWEEN 6 PRECEDING AND CURRENT ROW``): per-day count cells are
  calendar-bounded, so the frame itself is a driver cumsum over the
  shared gated cell fold (stages/folds.fold_cells).
- :func:`survival_users_events` — Kaplan-Meier-style lifetime curve with
  no censoring: per-user (min_day, max_day) partials exchange on the
  user bucket past the gate, each bucket emits its bounded
  lifetime-histogram partial, and the calendar-bounded histogram folds
  driver-side for the reverse-cumulative at-risk counts.
- :func:`mutual_info_lang_source` — cell table is |lang|×|source|
  bounded (stages/contingency machinery); MI folds as the exact integer
  ``Σ o·floor(ln(o/e)·10⁶)``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.parquet import FusedParquetScan

_US_PER_DAY = 86_400_000_000


def mode_event_type_users(sf_dir: str, block_gate: int = 512):
    """(user_id, mode_type, n_mode) — each user's most frequent event
    type; ties break to the lexicographically SMALLEST type in both
    engines (SQL ``row_number() OVER (... ORDER BY n DESC, event_type
    ASC)``). The grouped-MODE / most-common-value shape over an
    UNBOUNDED group key.

    Per-batch (user, type, n) partials; driver fold under the block
    gate, ``user_id & 63`` hash exchange past it (a user's cells land in
    exactly one bucket, so per-bucket modes are global). Path equality
    pinned at ``block_gate=0`` in tests/test_rollups.py."""
    scan = FusedParquetScan(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "event_type"]).aggregate(
            [("event_type", "count")])
        return pa.table({
            "user_id": g.column("user_id"),
            "event_type": g.column("event_type"),
            "n": pc.cast(g.column("event_type_count"), pa.int64())})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["user_id", "event_type"], as_index=False,
                         sort=False)["n"].sum()
        agg = agg.sort_values(["user_id", "n", "event_type"],
                              ascending=[True, False, True],
                              kind="mergesort")
        out = agg.drop_duplicates("user_id", keep="first")
        return pd.DataFrame({
            "user_id": out["user_id"].to_numpy(np.int64),
            "mode_type": out["event_type"].to_numpy(),
            "n_mode": out["n"].to_numpy(np.int64)})

    if scan.num_blocks() > block_gate:
        mask = pa.scalar(63, pa.uint64())

        def partial_b(b: pa.Table) -> pa.Table:
            t = partial(b)
            return t.append_column("__b", pc.cast(pc.bit_wise_and(
                pc.cast(t.column("user_id"), pa.uint64()), mask),
                pa.int32()))

        def per_bucket(g: pd.DataFrame) -> pa.Table:
            return pa.Table.from_pandas(
                fold(g.drop(columns="__b")), preserve_index=False) \
                .replace_schema_metadata(None)

        return scan.map_batches(partial_b) \
            .groupby("__b").map_groups(per_bucket, batch_format="pandas")

    parts = scan.map_batches(partial).to_pandas()
    if not len(parts):
        return pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "mode_type": pd.Series([], dtype=object),
            "n_mode": pd.Series([], dtype=np.int64)})
    return fold(parts).sort_values("user_id").reset_index(drop=True)


MODE_EVENT_TYPE_SQL = """
WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type ASC) AS rn
      FROM c)
SELECT user_id, event_type AS mode_type, n AS n_mode
FROM r WHERE rn = 1 ORDER BY user_id
"""


def moving_avg_daily_events(sf_dir: str, block_gate: int = 512):
    """(day, c, win_sum, win_n, avg_ppm) — 7-day TRAILING moving average
    of the daily event count over the observed days in ascending order
    (SQL ``ROWS BETWEEN 6 PRECEDING AND CURRENT ROW`` — row frame over
    observed days, not a calendar frame). ``avg_ppm = 10⁶·win_sum //
    win_n`` — non-negative floor division, identical cross-engine.

    Per-(day) count cells are calendar-bounded, so the fold uses the
    shared gated cell fold and the frame is one driver cumsum."""
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.strftime(pc.cast(b.column("ts"), pa.timestamp("us")),
                          format="%Y-%m-%d")
        g = pa.table({"day": day}).group_by("day").aggregate(
            [("day", "count")])
        return pa.table({"day": g.column("day"),
                         "c": pc.cast(g.column("day_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["day"], sums=["c"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({
            "day": pd.Series([], dtype=object),
            "c": pd.Series([], dtype=np.int64),
            "win_sum": pd.Series([], dtype=np.int64),
            "win_n": pd.Series([], dtype=np.int64),
            "avg_ppm": pd.Series([], dtype=np.int64)})
    cells = cells.sort_values("day", kind="mergesort").reset_index(
        drop=True)
    c = cells["c"].to_numpy(np.int64)
    cs = np.concatenate(([0], np.cumsum(c)))
    n = len(c)
    lo = np.maximum(np.arange(n) - 6, 0)
    win_sum = cs[1:] - cs[lo]
    win_n = np.arange(n, dtype=np.int64) - lo + 1
    return pd.DataFrame({
        "day": cells["day"].to_numpy(),
        "c": c,
        "win_sum": win_sum.astype(np.int64),
        "win_n": win_n,
        "avg_ppm": (1_000_000 * win_sum) // win_n})


MOVING_AVG_DAILY_SQL = """
WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
w AS (SELECT day, c,
             CAST(sum(c) OVER (ORDER BY day
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS win_sum,
             CAST(count(*) OVER (ORDER BY day
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS win_n
      FROM d)
SELECT day, c, win_sum, win_n,
       (1000000 * win_sum) // win_n AS avg_ppm
FROM w ORDER BY day
"""


def survival_users_events(sf_dir: str, block_gate: int = 512):
    """(lifetime_days, n_users, at_risk, survival_ppm) — the
    Kaplan-Meier-style retention curve with no censoring: a user's
    lifetime is ``day(max ts) − day(min ts)`` in whole epoch days;
    ``at_risk(t)`` counts users with lifetime ≥ t, and ``survival_ppm =
    10⁶·(at_risk − n_users_at_t) // total`` is the exact floor-ppm share
    of users who outlive t. One row per OBSERVED lifetime value.

    Per-user (min_day, max_day) partials exchange on ``user_id & 63``
    past the block gate; each bucket emits its (calendar-bounded)
    lifetime histogram, and only histograms gather for the driver's
    reverse cumsum. Path equality pinned at ``block_gate=0``."""
    scan = FusedParquetScan(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("ts"), pa.timestamp("us")), pa.int64()),
            _US_PER_DAY)
        t = pa.table({"user_id": b.column("user_id"), "d": d})
        g = t.group_by("user_id").aggregate([("d", "min"), ("d", "max")])
        return pa.table({"user_id": g.column("user_id"),
                         "lo": pc.cast(g.column("d_min"), pa.int64()),
                         "hi": pc.cast(g.column("d_max"), pa.int64())})

    def user_fold(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("user_id", sort=False).agg(
            lo=("lo", "min"), hi=("hi", "max"))
        lt = (agg["hi"] - agg["lo"]).to_numpy(np.int64)
        u, cnt = np.unique(lt, return_counts=True)
        return pd.DataFrame({"lt": u.astype(np.int64),
                             "n": cnt.astype(np.int64)})

    if scan.num_blocks() > block_gate:
        mask = pa.scalar(63, pa.uint64())

        def partial_b(b: pa.Table) -> pa.Table:
            t = partial(b)
            return t.append_column("__b", pc.cast(pc.bit_wise_and(
                pc.cast(t.column("user_id"), pa.uint64()), mask),
                pa.int32()))

        def per_bucket(g: pd.DataFrame) -> pa.Table:
            return pa.Table.from_pandas(
                user_fold(g.drop(columns="__b")), preserve_index=False) \
                .replace_schema_metadata(None)

        hist = scan.map_batches(partial_b) \
            .groupby("__b").map_groups(per_bucket,
                                       batch_format="pandas").to_pandas()
        hist = hist.groupby("lt", as_index=False)["n"].sum()
    else:
        parts = scan.map_batches(partial).to_pandas()
        if not len(parts):
            return pd.DataFrame({
                "lifetime_days": pd.Series([], dtype=np.int64),
                "n_users": pd.Series([], dtype=np.int64),
                "at_risk": pd.Series([], dtype=np.int64),
                "survival_ppm": pd.Series([], dtype=np.int64)})
        hist = user_fold(parts)

    hist = hist.sort_values("lt", kind="mergesort").reset_index(drop=True)
    n = hist["n"].to_numpy(np.int64)
    total = int(n.sum())
    at_risk = np.cumsum(n[::-1])[::-1]
    return pd.DataFrame({
        "lifetime_days": hist["lt"].to_numpy(np.int64),
        "n_users": n,
        "at_risk": at_risk.astype(np.int64),
        "survival_ppm": (1_000_000 * (at_risk - n)) // total})


SURVIVAL_USERS_SQL = """
WITH u AS (SELECT user_id,
                  CAST(epoch_us(max(ts)) // 86400000000 AS BIGINT)
                  - CAST(epoch_us(min(ts)) // 86400000000 AS BIGINT)
                    AS lt
           FROM events GROUP BY user_id),
h AS (SELECT lt, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY lt),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM h),
c AS (SELECT lt, n,
             CAST(sum(n) OVER (ORDER BY lt DESC) AS BIGINT) AS at_risk
      FROM h)
SELECT lt AS lifetime_days, n AS n_users, at_risk,
       (1000000 * (at_risk - n)) // t.tot AS survival_ppm
FROM c, t ORDER BY lifetime_days
"""


def mutual_info_lang_source(sf_dir: str):
    """One-row (n_rows, mi_units, mi_nats) — mutual information between
    lang and source from the same exact contingency cells as the
    chi-square / Cramér's V family: ``mi_units = Σ_cells o ·
    floor(ln(o/e)·10⁶)`` (the integer-ln technique — o is the exact cell
    count, ``e = float64(rt)·float64(ct)/n`` is the SAME expected-count
    expression the chi-square oracle spells, o/e is one correctly-rounded
    division, ln is scalar libm in both engines, floor pins the cell to
    an int); ``mi_nats = mi_units / (float64(n)·10⁶)`` is the one final
    float — two correctly-rounded ops over exact ints, bitwise equal
    cross-engine. mi_units needs HUGEINT headroom in SQL past ~2^53-row
    corpora; the Python fold is arbitrary-precision ints."""
    from ..stages.contingency import chi_square_cells_scan

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "source"])
    cells = chi_square_cells_scan(scan, "lang", "source")
    if not len(cells):
        return pd.DataFrame({
            "n_rows": pd.Series([0], dtype=np.int64),
            "mi_units": pd.Series([0], dtype=np.int64),
            "mi_nats": pd.Series([0.0], dtype=np.float64)})
    n = int(cells["observed"].sum())
    mi_units = 0
    for o, e in zip(cells["observed"].to_numpy(np.int64),
                    cells["expected"].to_numpy(np.float64)):
        mi_units += int(o) * math.floor(math.log(float(o) / e) * 1_000_000)
    mi_nats = float(mi_units) / (float(n) * 1_000_000.0)
    return pd.DataFrame({
        "n_rows": pd.Series([n], dtype=np.int64),
        "mi_units": pd.Series([mi_units], dtype=np.int64),
        "mi_nats": pd.Series([mi_nats], dtype=np.float64)})


def hmean_chars_lang(sf_dir: str, block_gate: int = 512):
    """(lang, n_docs, recip_units, hmean) — per-language HARMONIC mean of
    document length (the rate-style average where short docs dominate):
    ``recip_units = Σ 10¹² // n_chars`` is a pure int64 fold (non-negative
    floor division — identical cross-engine, the integer-reciprocal
    sibling of the integer-ln technique), and the one float is ``hmean =
    float64(n)·10¹² / recip_units`` — two correctly-rounded IEEE ops over
    exact ints, spelled identically in SQL. Rows with n_chars ≤ 0 are
    excluded in both engines. Per-lang partials are bounded, so the fold
    uses the shared gated cell fold."""
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b.column("n_chars"), 0))
        r = pc.divide(1_000_000_000_000, t.column("n_chars"))
        g = pa.table({"lang": t.column("lang"), "r": r}) \
            .group_by("lang").aggregate([("r", "sum"), ("r", "count")])
        return pa.table({"lang": g.column("lang"),
                         "r": pc.cast(g.column("r_sum"), pa.int64()),
                         "n": pc.cast(g.column("r_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["lang"], sums=["r", "n"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({
            "lang": pd.Series([], dtype=object),
            "n_docs": pd.Series([], dtype=np.int64),
            "recip_units": pd.Series([], dtype=np.int64),
            "hmean": pd.Series([], dtype=np.float64)})
    cells = cells.sort_values("lang").reset_index(drop=True)
    n = cells["n"].to_numpy(np.int64)
    r = cells["r"].to_numpy(np.int64)
    hm = n.astype(np.float64) * 1_000_000_000_000.0 / r.astype(np.float64)
    return pd.DataFrame({"lang": cells["lang"].to_numpy(),
                         "n_docs": n, "recip_units": r, "hmean": hm})


HMEAN_CHARS_SQL = """
WITH c AS (SELECT lang,
                  CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(1000000000000 // n_chars) AS BIGINT)
                    AS recip_units
           FROM documents WHERE n_chars > 0 GROUP BY lang)
SELECT lang, n_docs, recip_units,
       CAST(n_docs AS DOUBLE) * 1000000000000 / recip_units AS hmean
FROM c ORDER BY lang
"""


def profile_diff_users(sf_dir: str, block_gate: int = 512):
    """One-row (mid_day, n_v1, n_v2, n_added, n_changed, n_same) — the
    SNAPSHOT-DIFF / data-reconciliation shape: derive each user's profile
    (event count + most recent event type, ties by event_id DESC) at TWO
    cutoffs — v1 = activity up to the log's midpoint day, v2 = the full
    log — and count users added after the midpoint, users whose profile
    changed, and users untouched. One scan computes BOTH snapshots (each
    event contributes to v2 always and to v1 iff day ≤ mid); the anchor
    (min/max day) folds from metadata-cheap per-batch partials first.

    Per-USER partials are unbounded, so past the block gate they
    hash-exchange on ``user_id & 63`` and each bucket emits its 1-row
    summary partial; only bucket summaries gather. Path equality pinned
    at ``block_gate=0``."""
    scan0 = FusedParquetScan(f"{sf_dir}/events.parquet", columns=["ts"])

    def day_bounds(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("ts"), pa.timestamp("us")), pa.int64()),
            _US_PER_DAY)
        lo, hi = pc.min(d).as_py(), pc.max(d).as_py()
        if lo is None:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([lo], pa.int64()),
                         "hi": pa.array([hi], pa.int64())})

    bounds = scan0.map_batches(day_bounds).to_pandas()
    empty = pd.DataFrame({
        "mid_day": pd.Series([0], dtype=np.int64),
        "n_v1": pd.Series([0], dtype=np.int64),
        "n_v2": pd.Series([0], dtype=np.int64),
        "n_added": pd.Series([0], dtype=np.int64),
        "n_changed": pd.Series([0], dtype=np.int64),
        "n_same": pd.Series([0], dtype=np.int64)})
    if not len(bounds):
        return empty
    lo, hi = int(bounds["lo"].min()), int(bounds["hi"].max())
    mid = lo + (hi - lo) // 2

    def partial(b: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                     pa.int64())
        d = pc.divide(ts, _US_PER_DAY)
        df = pd.DataFrame({
            "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
            "t": ts.to_numpy(zero_copy_only=False),
            "eid": b.column("event_id").to_numpy(zero_copy_only=False),
            "et": b.column("event_type").to_pandas(),
            "in1": pc.less_equal(d, mid).to_numpy(zero_copy_only=False)})
        df = df.sort_values(["user_id", "t", "eid"],
                            kind="mergesort")
        last2 = df.drop_duplicates("user_id", keep="last")
        d1 = df[df["in1"]]
        last1 = d1.drop_duplicates("user_id", keep="last")
        n2 = df.groupby("user_id", sort=False).size()
        n1 = d1.groupby("user_id", sort=False).size()
        out = last2.set_index("user_id")[["t", "eid", "et"]].rename(
            columns={"t": "t2", "eid": "e2", "et": "ty2"})
        out["n2"] = n2
        out = out.join(last1.set_index("user_id")[["t", "eid", "et"]]
                       .rename(columns={"t": "t1", "eid": "e1",
                                        "et": "ty1"}))
        out["n1"] = n1.reindex(out.index).fillna(0).astype(np.int64)
        out = out.reset_index()
        out["t1"] = out["t1"].fillna(-1).astype(np.int64)
        out["e1"] = out["e1"].fillna(-1).astype(np.int64)
        out["ty1"] = out["ty1"].where(out["ty1"].notna(), "")
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    def user_fold(df: pd.DataFrame) -> pd.DataFrame:
        """Fold per-batch per-user partials to the global per-user
        profiles, then to ONE summary row."""
        df = df.sort_values(["user_id", "t2", "e2"], kind="mergesort")
        g2 = df.drop_duplicates("user_id", keep="last") \
            .set_index("user_id")[["ty2"]]
        g2["n2"] = df.groupby("user_id", sort=False)["n2"].sum()
        d1 = df[df["n1"] > 0].sort_values(["user_id", "t1", "e1"],
                                          kind="mergesort")
        g1 = d1.drop_duplicates("user_id", keep="last") \
            .set_index("user_id")[["ty1"]]
        g1["n1"] = df.groupby("user_id", sort=False)["n1"].sum()
        j = g2.join(g1, how="left")
        has1 = j["n1"].notna() & (j["n1"] > 0)
        changed = has1 & ((j["n1"] != j["n2"]) | (j["ty1"] != j["ty2"]))
        same = has1 & ~changed
        return pd.DataFrame({
            "n_v1": [int(has1.sum())],
            "n_v2": [len(j)],
            "n_added": [int((~has1).sum())],
            "n_changed": [int(changed.sum())],
            "n_same": [int(same.sum())]})

    scan = FusedParquetScan(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    if scan.num_blocks() > block_gate:
        mask = pa.scalar(63, pa.uint64())

        def partial_b(b: pa.Table) -> pa.Table:
            t = partial(b)
            return t.append_column("__b", pc.cast(pc.bit_wise_and(
                pc.cast(t.column("user_id"), pa.uint64()), mask),
                pa.int32()))

        def per_bucket(g: pd.DataFrame) -> pa.Table:
            return pa.Table.from_pandas(
                user_fold(g.drop(columns="__b")), preserve_index=False) \
                .replace_schema_metadata(None)

        s = scan.map_batches(partial_b) \
            .groupby("__b").map_groups(per_bucket,
                                       batch_format="pandas").to_pandas()
        s = s.sum()
    else:
        parts = scan.map_batches(partial).to_pandas()
        if not len(parts):
            return empty
        s = user_fold(parts).iloc[0]

    return pd.DataFrame({
        "mid_day": pd.Series([mid], dtype=np.int64),
        "n_v1": pd.Series([int(s["n_v1"])], dtype=np.int64),
        "n_v2": pd.Series([int(s["n_v2"])], dtype=np.int64),
        "n_added": pd.Series([int(s["n_added"])], dtype=np.int64),
        "n_changed": pd.Series([int(s["n_changed"])], dtype=np.int64),
        "n_same": pd.Series([int(s["n_same"])], dtype=np.int64)})


PROFILE_DIFF_SQL = """
WITH b AS (SELECT CAST(epoch_us(min(ts)) // 86400000000 AS BIGINT) AS lo,
                  CAST(epoch_us(max(ts)) // 86400000000 AS BIGINT) AS hi
           FROM events),
a AS (SELECT lo + (hi - lo) // 2 AS mid FROM b),
e AS (SELECT user_id, event_type, event_id,
             CAST(epoch_us(ts) AS BIGINT) AS t,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
      FROM events),
r1 AS (SELECT user_id, event_type,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY t DESC, event_id DESC) AS rn,
              count(*) OVER (PARTITION BY user_id) AS n
       FROM e, a WHERE d <= a.mid),
p1 AS (SELECT user_id, n AS n1, event_type AS ty1 FROM r1 WHERE rn = 1),
r2 AS (SELECT user_id, event_type,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY t DESC, event_id DESC) AS rn,
              count(*) OVER (PARTITION BY user_id) AS n
       FROM e),
p2 AS (SELECT user_id, n AS n2, event_type AS ty2 FROM r2 WHERE rn = 1)
SELECT a.mid AS mid_day,
       CAST(count(p1.user_id) AS BIGINT) AS n_v1,
       CAST(count(*) AS BIGINT) AS n_v2,
       CAST(count(*) FILTER (WHERE p1.user_id IS NULL) AS BIGINT)
         AS n_added,
       CAST(count(*) FILTER (WHERE p1.user_id IS NOT NULL
             AND (p1.n1 <> p2.n2 OR p1.ty1 <> p2.ty2)) AS BIGINT)
         AS n_changed,
       CAST(count(*) FILTER (WHERE p1.user_id IS NOT NULL
             AND p1.n1 = p2.n2 AND p1.ty1 = p2.ty2) AS BIGINT)
         AS n_same
FROM p2 LEFT JOIN p1 USING (user_id), a GROUP BY a.mid
"""


MUTUAL_INFO_SQL = """
WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
           FROM documents GROUP BY 1, 2),
rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM c GROUP BY lang),
ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS s FROM c GROUP BY source),
t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c),
cells AS (
  SELECT c.o, CAST(rt.r AS DOUBLE) * ct.s / t.n AS e
  FROM c JOIN rt USING (lang) JOIN ct USING (source), t),
agg AS (SELECT CAST(sum(o * CAST(floor(ln(o / e) * 1000000)
                               AS HUGEINT)) AS BIGINT) AS mi_units
        FROM cells)
SELECT t.n AS n_rows, agg.mi_units,
       CAST(agg.mi_units AS DOUBLE) / (CAST(t.n AS DOUBLE) * 1000000)
         AS mi_nats
FROM t, agg
"""
