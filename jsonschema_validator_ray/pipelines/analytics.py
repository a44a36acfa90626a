"""Analytical join/aggregate queries over the TPC-H-ish tables — exercising
the hash-join, bucketed-join, and as-of-join operators with SQL oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sources.parquet import read_dim_table, read_parquet
from ..stages.joins import asof_join, bucketed_join, hash_join
from .relational import _US_PER_DAY, _epoch_us

# ---- revenue per market segment: both-sides-meaningful equi-join ----------


def _segment_revenue(join_fn):
    def q(sf_dir: str):
        orders = read_parquet(f"{sf_dir}/orders.parquet",
                                       columns=["o_custkey", "o_totalprice"])
        customer = read_parquet(f"{sf_dir}/customer.parquet",
                                         columns=["c_custkey", "c_mktsegment"])
        joined = join_fn(orders, customer, "o_custkey", right_on="c_custkey")

        def partial(b: pa.Table) -> pa.Table:
            cents = pc.cast(pc.round(pc.multiply(b.column("o_totalprice"), 100)),
                            pa.int64())
            t = pa.table({"c_mktsegment": b.column("c_mktsegment"),
                          "cents": cents})
            g = t.group_by("c_mktsegment").aggregate(
                [("cents", "sum"), ("cents", "count")])
            return pa.table({"c_mktsegment": g.column("c_mktsegment"),
                             "cents_sum": g.column("cents_sum"),
                             "n_partial": g.column("cents_count")})

        from ray.data.aggregate import Sum

        partials = joined.map_batches(partial, batch_format="pyarrow")
        return partials.groupby("c_mktsegment").aggregate(
            Sum("cents_sum", alias_name="revenue_cents"),
            Sum("n_partial", alias_name="n_orders"))

    return q


segment_revenue = _segment_revenue(hash_join)
segment_revenue_bucketed = _segment_revenue(
    lambda l, r, on, right_on: bucketed_join(l, r, on, right_on=right_on))


def _skew_join(l, r, on, right_on):
    """Exercise the salted hot-key path end-to-end: a low threshold makes
    the busiest custkeys 'hot' (capped at max_hot_keys), so both the
    salted-broadcast and the cold hashed path contribute rows; the oracle
    (plain SQL join) proves the split loses/duplicates nothing."""
    from ..stages.joins import skewed_join

    return skewed_join(l, r, on, right_on=right_on, hot_threshold=5)


segment_revenue_skewed = _segment_revenue(_skew_join)

SEGMENT_REVENUE_SQL = """
SELECT c_mktsegment,
       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

# ---- grouped top-k: top orders per market segment -------------------------


def top_orders_per_segment(sf_dir: str, k: int = 3):
    """Top-k orders by total price per market segment (grouped top-k):
    broadcast-join the tiny segment dimension into the fact scan, then
    per-batch partial top-k per segment and a final per-group head — the
    same partial/final shape as similarity top-k, keyed by group. Ties
    broken by o_orderkey ascending for determinism.

    The dimension probe is Arrow-native (``pc.index_in`` + ``take`` against
    broadcast key/segment arrays — an Arrow hashmap lookup), and the partial
    top-k runs on the sorted table with a vectorized within-group rank; no
    pandas conversion in the fact scan (VERDICT r1 item 8)."""
    import numpy as np
    import ray

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey",
                                            "o_totalprice"])
    dim = read_dim_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    seg_ref = ray.put((dim.column("c_custkey").combine_chunks(),
                       dim.column("c_mktsegment").combine_chunks()))

    class Partial:
        def __init__(self, ref, kk):
            self.keys, self.segs = (ray.get(ref)
                                    if isinstance(ref, ray.ObjectRef) else ref)
            self.k = kk

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(b.column("o_custkey"), value_set=self.keys)
            seg = self.segs.take(idx)          # null index → null segment
            t = pa.table({"c_mktsegment": seg,
                          "o_orderkey": b.column("o_orderkey"),
                          "o_totalprice": b.column("o_totalprice")})
            t = t.filter(pc.is_valid(seg))     # unmatched custkeys drop
            if t.num_rows == 0:
                return t
            order = pc.sort_indices(t, sort_keys=[
                ("c_mktsegment", "ascending"), ("o_totalprice", "descending"),
                ("o_orderkey", "ascending")])
            t = t.take(order)
            segs = t.column("c_mktsegment").combine_chunks()
            if len(segs) > 1:
                brk = pc.invert(pc.equal(
                    segs.slice(1), segs.slice(0, len(segs) - 1)))
                new_group = np.r_[True,
                                  pc.fill_null(brk, True).to_numpy(
                                      zero_copy_only=False)]
            else:
                new_group = np.array([True])
            starts = np.flatnonzero(new_group)
            gid = np.cumsum(new_group) - 1
            rank = np.arange(len(segs)) - starts[gid]
            return t.filter(pa.array(rank < self.k))

    # class + fn_constructor_args so ray.get(seg_ref) resolves in the
    # WORKER-side constructor (instantiating on the driver would embed the
    # whole dimension in every task spec, defeating the broadcast)
    partials = orders.map_batches(Partial, fn_constructor_args=(seg_ref, k),
                                  concurrency=(1, 2), batch_format="pyarrow")

    def final_head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["o_totalprice", "o_orderkey"],
                             ascending=[False, True], kind="mergesort").head(k)

    out = partials.groupby("c_mktsegment").map_groups(
        final_head, batch_format="pandas")
    df = out.to_pandas().sort_values(
        ["c_mktsegment", "o_totalprice", "o_orderkey"],
        ascending=[True, False, True]).reset_index(drop=True)
    return df


TOP_ORDERS_SQL = """
SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3
ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey
"""

# ---- as-of join: last click before each purchase, per user ----------------


def purchase_last_click(sf_dir: str):
    """For each purchase event, the most recent earlier click by the same
    user (NaT when none) — the as-of join shape. Output
    (event_id, user_id, click_ts)."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts", "event_type"])
    purchases = ev.filter(expr="event_type == 'purchase'") \
                  .select_columns(["event_id", "user_id", "ts"])

    def ren(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "click_ts": b.column("ts")})

    clicks = ev.filter(expr="event_type == 'click'") \
               .map_batches(ren, batch_format="pyarrow")
    out = asof_join(purchases, clicks, "user_id", "ts", right_ts="click_ts")

    def norm(b: pa.Table) -> pa.Table:
        # the padded union makes left columns nullable over right-side rows,
        # so pandas upcasts int64 → float64 in the group join; cast back
        return pa.table({
            "event_id": pc.cast(b.column("event_id"), pa.int64()),
            "user_id": pc.cast(b.column("user_id"), pa.int64()),
            "click_ts": pc.cast(b.column("click_ts"), pa.timestamp("us")),
        })

    return out.map_batches(norm, batch_format="pyarrow")


PURCHASE_LAST_CLICK_SQL = """
SELECT p.event_id, p.user_id, max(c.ts) AS click_ts
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
"""


# ---- ROLLUP: aggregate once at the finest grain, derive coarser levels -----


def rollup_revenue_lineitem(sf_dir: str):
    """(l_returnflag, l_linestatus, n_rows, revenue_cents) for GROUP BY
    ROLLUP(l_returnflag, l_linestatus): the finest grain is aggregated
    distributed (per-batch pandas partials — bounded by 6 distinct pairs
    per batch), then the coarser levels derive from the tiny finest table
    driver-side with the SAME integer arithmetic — one corpus scan for
    all three levels, never one scan per level."""
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_returnflag", "l_linestatus",
                               "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"),
                                             100)), pa.int64())
        df = pa.table({"l_returnflag": b.column("l_returnflag"),
                       "l_linestatus": b.column("l_linestatus"),
                       "cents": cents}).to_pandas()
        out = (df.groupby(["l_returnflag", "l_linestatus"], sort=False)
                 .agg(n_rows=("cents", "size"), revenue_cents=("cents", "sum"))
                 .reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)

    fine = (li.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
              .to_pandas()
              .groupby(["l_returnflag", "l_linestatus"], as_index=False)
              .sum())
    lvl1 = (fine.groupby("l_returnflag", as_index=False)
                [["n_rows", "revenue_cents"]].sum())
    lvl1["l_linestatus"] = None
    total = pd.DataFrame({"l_returnflag": [None], "l_linestatus": [None],
                          "n_rows": [fine["n_rows"].sum()],
                          "revenue_cents": [fine["revenue_cents"].sum()]})
    out = pd.concat([fine, lvl1, total], ignore_index=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out[["l_returnflag", "l_linestatus", "n_rows", "revenue_cents"]]


ROLLUP_REVENUE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


# ---- exact two-column correlation from integer moments ----------------------


def corr_qty_price_lineitem(sf_dir: str):
    """One-row Pearson correlation of l_quantity vs l_extendedprice with
    EXACT integer moments: per-batch int64 partial sums (batch sized so
    cents² sums can't overflow), folded driver-side in arbitrary-precision
    Python ints, one float conversion per output column — the same
    expression tree the HUGEINT oracle evaluates, so the floats match
    bitwise."""
    import math

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(b.column("l_quantity")),
                    pa.int64()).to_numpy(zero_copy_only=False)
        c = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "n": [len(q)], "sx": [int(q.sum())], "sy": [int(c.sum())],
            "sxx": [int((q * q).sum())], "syy": [int((c * c).sum())],
            "sxy": [int((q * c).sum())]})

    # cents² ≤ 1.2e14 ⇒ ≤ 32768 rows/batch keeps the int64 partial exact;
    # the driver fold below is arbitrary-precision
    parts = li.map_batches(partial, batch_format="pyarrow",
                           batch_size=32768).to_pandas()
    n, sx, sy, sxx, syy, sxy = (int(parts[k].astype(object).sum())
                                for k in ("n", "sx", "sy", "sxx", "syy",
                                          "sxy"))
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    corr = float(num) / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
    return pd.DataFrame({
        "n_rows": [n], "sum_qty": [sx], "sum_cents": [sy], "sxx": [sxx],
        "syy": [float(syy)], "sxy": [float(sxy)], "corr_qp": [corr]})


CORR_QTY_PRICE_SQL = """
WITH m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS HUGEINT)
           AS sy,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)) AS sxx,
         sum(CAST(round(l_extendedprice*100) AS HUGEINT)
             * CAST(round(l_extendedprice*100) AS HUGEINT)) AS syy,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_extendedprice*100) AS HUGEINT)) AS sxy
  FROM lineitem)
SELECT CAST(n AS BIGINT) AS n_rows, CAST(sx AS BIGINT) AS sum_qty,
       CAST(sy AS BIGINT) AS sum_cents, CAST(sxx AS BIGINT) AS sxx,
       CAST(syy AS DOUBLE) AS syy, CAST(sxy AS DOUBLE) AS sxy,
       CAST(n*sxy - sx*sy AS DOUBLE)
         / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
            * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr_qp
FROM m
"""


# ---- semi / anti joins: EXISTS / NOT EXISTS filters ------------------------


def orders_without_customer(sf_dir: str):
    """(o_orderkey, o_custkey) of orders whose custkey has no customer row —
    anti join on the shuffle path (both sides hash-exchanged; right side
    keys-only), the 100-TB shape where the dimension's key set outgrows a
    worker heap. The dimension is restricted (c_custkey <= 100, as in
    fk_orders_custkey) so the check fires on this referentially-clean
    testdata — same answer as the broadcast FK check, via the scale path."""
    from ..stages.joins import anti_join

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"])
    cust = read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey"]).filter(expr="c_custkey <= 100")
    return anti_join(orders, cust, "o_custkey", right_on="c_custkey",
                     strategy="shuffle", num_buckets=32
                     ).select_columns(["o_orderkey", "o_custkey"])


ORDERS_WITHOUT_CUSTOMER_SQL = """
SELECT o_orderkey, o_custkey FROM orders o
WHERE o_custkey IS NOT NULL AND NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_custkey <= 100)
"""


def parts_in_lineitem(sf_dir: str):
    """(p_partkey, p_name) of parts referenced by at least one lineitem —
    semi join on the broadcast path (distinct l_partkey gathered once,
    probed with is_in in an actor pool; no shuffle)."""
    from ..stages.joins import semi_join

    part = read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_name"])
    li = read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
    return semi_join(part, li, "p_partkey", right_on="l_partkey",
                     strategy="broadcast")


PARTS_IN_LINEITEM_SQL = """
SELECT p_partkey, p_name FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
"""


def orders_customer_left(sf_dir: str):
    """(o_orderkey, o_custkey, c_name) — LEFT OUTER enrichment join of
    orders against a RESTRICTED customer dimension (c_custkey <= 100, so
    most orders miss and carry a NULL c_name): the padded-null join shape,
    via the explicit bucketed join (both sides hash-exchanged on the key
    bucket — the 100-TB path when the dimension outgrows broadcast).
    Exercises the null-padding / int64-upcast boundary documented in
    stages/joins."""
    from ..stages.joins import bucketed_join

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"])
    cust = read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_name"]
                        ).filter(expr="c_custkey <= 100")
    return bucketed_join(orders, cust, "o_custkey", right_on="c_custkey",
                         join_type="left_outer", num_buckets=32
                         ).select_columns(["o_orderkey", "o_custkey",
                                           "c_name"])


ORDERS_CUSTOMER_LEFT_SQL = """
SELECT o.o_orderkey, o.o_custkey, c.c_name
FROM orders o
LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 100) c
  ON c.c_custkey = o.o_custkey
"""


# ---- pivot: long → wide conditional aggregation ----------------------------


def pivot_priority_status(sf_dir: str):
    """Revenue cents per (order priority × order status) as a WIDE table —
    one row per priority, one column per status (stages/pivot.py). Cents
    are integer before any accumulation, so sums are arithmetic-identical
    to the SQL conditional aggregates."""
    from ..stages.pivot import pivot_table

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderpriority", "o_orderstatus",
                                   "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "o_orderstatus": b.column("o_orderstatus"),
            "cents": pc.cast(pc.round(pc.multiply(
                b.column("o_totalprice"), 100)), pa.int64()),
        })

    return pivot_table(orders.map_batches(cents, batch_format="pyarrow"),
                       "o_orderpriority", "o_orderstatus", "cents",
                       agg="sum", num_buckets=8)


PIVOT_PRIORITY_STATUS_SQL = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus='F' THEN CAST(round(o_totalprice*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents_F,
       CAST(sum(CASE WHEN o_orderstatus='O' THEN CAST(round(o_totalprice*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents_O,
       CAST(sum(CASE WHEN o_orderstatus='P' THEN CAST(round(o_totalprice*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents_P
FROM orders
GROUP BY o_orderpriority
"""


def cohort_retention(sf_dir: str):
    """Weekly cohort-retention matrix over the events log: users grouped by
    the epoch-week of their FIRST event (cohort), distinct active users
    counted per (cohort_week, week_offset). The classic product-analytics
    wide shape, built from two exchanges that both move only keys:

    1. first-event week per user — native ``groupby(user).min(ts)``
       (shuffle of (user, ts) pairs), broadcast as a dict (bounded by the
       DISTINCT user count; for 10^9 users swap in a bucketed join — the
       pattern of stages/joins);
    2. exact distinct users per cell via the two-phase pair exchange of
       stages/uniqueness.group_distinct_count over a packed int64
       ``cohort_week * 100000 + week_offset`` cell key (epoch weeks < 10^4
       and offsets are bounded by the log's time span, so the pack is
       collision-free), unpacked after the final fold.

    Output (cohort_week, week_offset, n_users) — all int64, exact oracle.
    """
    import numpy as np

    from ..stages.uniqueness import group_distinct_count

    WEEK_US = 7 * 86400 * 1_000_000
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts"])
    first = ev.groupby("user_id").min("ts").to_pandas()
    fmap = {int(u): int(pd.Timestamp(t).value // 1000)   # ns → us epoch
            for u, t in zip(first["user_id"], first["min(ts)"])}
    ref = ray.put(fmap)

    def cell(b: pa.Table) -> pa.Table:
        import ray as _ray

        m = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        t = pc.cast(b.column("ts"), pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        f = np.array([m[int(u)] for u in uid], dtype=np.int64)
        cohort = f // WEEK_US
        offset = t // WEEK_US - cohort
        return pa.table({
            "cell": pa.array(cohort * 100000 + offset, type=pa.int64()),
            "user_id": b.column("user_id"),
        })

    cells = ev.map_batches(cell, batch_format="pyarrow")
    out = group_distinct_count(cells, "cell", "user_id")

    def unpack(b: pa.Table) -> pa.Table:
        c = b.column("cell").to_numpy(zero_copy_only=False)
        return pa.table({
            "cohort_week": pa.array(c // 100000, type=pa.int64()),
            "week_offset": pa.array(c % 100000, type=pa.int64()),
            "n_users": pc.cast(b.column("n_distinct"), pa.int64()),
        })

    return out.map_batches(unpack, batch_format="pyarrow")


COHORT_RETENTION_SQL = """
WITH f AS (
  SELECT user_id,
         CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT f.cohort_week,
       CAST(floor(epoch(e.ts) / 604800) AS BIGINT) - f.cohort_week
         AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN f USING (user_id)
GROUP BY 1, 2
"""


# ---- lag windows: per-user inter-event gaps --------------------------------


def event_gaps_users(sf_dir: str):
    """Per-user inter-event-time aggregates (the LAG window shape): events
    are hash-bucketed by user, each bucket task sorts its slice once and
    diffs per user in one pandas C-path pass — one key exchange, no global
    sort, never one Ray task per user (the measured 27 s/20k-keys rule).
    Gaps are integer microseconds (epoch_us parity with the oracle), so
    every output is exact. Users with a single event have no gap and are
    dropped (HAVING count(*) >= 2), which also keeps the output null-free.

    Output (user_id, n_events, max_gap_us, span_us) — all int64."""
    import numpy as np

    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id"])

    def add_bucket(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "t": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                         pa.int64()),
            "__b": pa.array((uid % 32).astype(np.int32)),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        gaps = g.groupby("user_id", sort=False)["t"].diff()
        agg = g.assign(__gap=gaps).groupby("user_id", sort=False).agg(
            n_events=("t", "size"), max_gap_us=("__gap", "max"),
            t_min=("t", "min"), t_max=("t", "max"))
        agg = agg[agg["n_events"] >= 2]
        return pd.DataFrame({
            "user_id": agg.index.to_numpy(),
            "n_events": agg["n_events"].to_numpy().astype(np.int64),
            "max_gap_us": agg["max_gap_us"].to_numpy().astype(np.int64),
            "span_us": (agg["t_max"] - agg["t_min"]).to_numpy()
            .astype(np.int64),
        })

    return ev.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas")


EVENT_GAPS_SQL = """
WITH g AS (
  SELECT user_id, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS pt
  FROM events)
SELECT user_id, count(*) AS n_events,
       max(t - pt) AS max_gap_us,
       max(t) - min(t) AS span_us
FROM g GROUP BY user_id HAVING count(*) >= 2
"""


# ---- percent-of-total window: value share per event type -------------------


def value_share_by_type(sf_dir: str):
    """Share of total event value per event type, in integer basis points
    (the SUM() OVER () percent-of-total window shape): one partial pass
    folds per-batch (type, cents, count) rows, the grand total and shares
    are computed driver-side over the handful of type rows. Values are
    floor-cents and the share is integer division — exact in both engines
    (cents are non-negative here, where truncating and floor division
    agree; epsilon-free)."""
    from ..sources.parquet import FusedParquetScan

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(b.column("value"), 100.0)),
                        pa.int64())
        t = pa.table({"event_type": b.column("event_type"), "cents": cents})
        g = t.group_by(["event_type"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return pa.table({"event_type": g.column("event_type"),
                         "cents_sum": g.column("cents_sum"),
                         "n_partial": g.column("cents_count")})

    src = FusedParquetScan(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value"])
    df = src.map_batches(partial).to_pandas()
    g = (df.groupby("event_type", as_index=False, sort=True)
           .agg(value_cents=("cents_sum", "sum"),
                n_events=("n_partial", "sum")))
    total = int(g["value_cents"].sum())
    return pa.table({
        "event_type": pa.array(g["event_type"]),
        "value_cents": pa.array(g["value_cents"].astype("int64")),
        "n_events": pa.array(g["n_events"].astype("int64")),
        "share_bp": pa.array(
            (g["value_cents"].astype("int64") * 10000 // total)
            .astype("int64")),
    })


VALUE_SHARE_SQL = """
WITH t AS (
  SELECT event_type,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents,
         count(*) AS n_events
  FROM events GROUP BY event_type)
SELECT event_type, value_cents, n_events,
       CAST(value_cents * 10000 // sum(value_cents) OVER () AS BIGINT)
         AS share_bp
FROM t
"""


# ---- first-seen cohorts: new users per day ---------------------------------


def new_users_daily(sf_dir: str):
    """New (first-ever-seen) users per day — the growth-accounting shape:
    per-batch combiner reduces to distinct (user, min_ts) pairs, then the
    per-user global min and the per-day count fold driver-side below the
    512-block gate (pairs are bounded by the distinct user count — KBs
    here; past the gate, swap the fold for the bucketed grouped-min
    exchange of stages/uniqueness.group_distinct_count's shape). Exact:
    integer microsecond min, day = truncation to 86400-second bins.

    Output (day timestamp[us], new_users int64)."""
    import numpy as np

    from ..sources.parquet import FusedParquetScan

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": b.column("user_id"),
            "t": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                         pa.int64())})
        return t.group_by(["user_id"]).aggregate([("t", "min")])

    src = FusedParquetScan(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts"])
    df = src.map_batches(partial).to_pandas()
    first = df.groupby("user_id", sort=False)["t_min"].min()
    DAY_US = 86400 * 1_000_000
    day = (first.to_numpy() // DAY_US) * DAY_US
    days, counts = np.unique(day, return_counts=True)
    return pa.table({
        "day": pc.cast(pa.array(days, type=pa.int64()),
                       pa.timestamp("us")),
        "new_users": pa.array(counts.astype(np.int64)),
    })


NEW_USERS_DAILY_SQL = """
SELECT CAST(date_trunc('day', first_ts) AS TIMESTAMP) AS day,
       count(*) AS new_users
FROM (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id)
GROUP BY 1
"""


# ---- full-output window ranking: length rank within language ----------------


def rank_length_in_lang(sf_dir: str):
    """Every document's length rank WITHIN its language plus the partition
    size (the full-output ROW_NUMBER()/COUNT() OVER (PARTITION BY ...)
    window shape — top_orders_per_segment truncates to k, this ranks all
    rows). lang has a handful of values, so the partition groupby is a few
    coarse tasks, each one pandas mergesort + arange — for a high-
    cardinality partition key, hash-bucket the key and offset ranks by
    per-bucket counts instead. doc_id tiebreak makes ranks deterministic;
    everything int64-exact.

    Output (doc_id, lang, n_chars, rank_in_lang, n_lang)."""
    import numpy as np

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"])

    def per_lang(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"], kind="mergesort")
        return g.assign(
            rank_in_lang=np.arange(1, len(g) + 1, dtype=np.int64),
            n_lang=np.int64(len(g)))

    return docs.groupby("lang").map_groups(per_lang, batch_format="pandas")


RANK_IN_LANG_SQL = """
SELECT doc_id, lang, n_chars,
       row_number() OVER (PARTITION BY lang
                          ORDER BY n_chars, doc_id) AS rank_in_lang,
       count(*) OVER (PARTITION BY lang) AS n_lang
FROM documents
"""


# ---- hourly active users: two-phase distinct on a derived time bucket ------


def hourly_active_users(sf_dir: str):
    """(hour, n_users) — distinct active users per hour of the events log
    (the DAU/HAU shape). The hour key derives per batch with
    ``pc.floor_temporal`` and rides the existing two-phase distinct
    exchange (stages/uniqueness.group_distinct_count): each batch reduces
    to its distinct (hour, user) pairs first, so a chatty user reaches the
    shuffle once per batch, not once per event."""
    from ..stages.uniqueness import group_distinct_count

    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["ts", "user_id"])

    def add_hour(b: pa.Table) -> pa.Table:
        return pa.table({
            "hour": pc.floor_temporal(pc.cast(b.column("ts"),
                                              pa.timestamp("us")),
                                      unit="hour"),
            "user_id": b.column("user_id"),
        })

    out = ev.map_batches(add_hour, batch_format="pyarrow")
    return group_distinct_count(out, "hour", "user_id")


HOURLY_ACTIVE_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       COUNT(DISTINCT user_id) AS n_distinct
FROM events GROUP BY 1
"""


# ---- event transition counts: per-user LAG pairs → global Markov counts ----


def event_transitions(sf_dir: str):
    """(prev_type, event_type, n) — how often each event type follows each
    other within a user's timeline (the behavioral transition-matrix /
    Markov-chain shape). Events hash-bucket on user, each bucket sorts its
    slice once and shifts per user in one pandas C-path pass (never a task
    per user), then emits per-bucket PARTIAL pair counts — only ≤ |types|²
    rows per bucket cross to the final fold, folded driver-side (the pair
    vocabulary is tiny by construction; counts are integer-exact)."""
    import numpy as np

    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id", "event_type"])

    def add_bucket(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
            "t": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                         pa.int64()),
            "__b": pa.array((uid % 32).astype(np.int32)),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        by_user = g.groupby("user_id", sort=False)
        prev = by_user["event_type"].shift()
        pairs = pd.DataFrame({"prev_type": prev,
                              "event_type": g["event_type"]})
        pairs = pairs[pairs["prev_type"].notna()]  # first event has no prev
        # dropna=False: a NULL event_type still forms a (prev, NULL) pair,
        # matching the SQL GROUP BY (zero nulls in testdata; latent parity)
        cnt = pairs.groupby(["prev_type", "event_type"], sort=False,
                            dropna=False).size().reset_index(name="n")
        cnt["n"] = cnt["n"].astype(np.int64)
        return cnt

    partials = ev.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas") \
        .to_pandas()
    out = partials.groupby(["prev_type", "event_type"], sort=False,
                           as_index=False)["n"].sum()
    return out


EVENT_TRANSITIONS_SQL = """
WITH g AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type, count(*) AS n
FROM g WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


# ---- JSON field extraction + aggregate over the semi-structured column -----


def props_value_by_type(sf_dir: str):
    """(event_type, k_sum, n_extracted) — extract the integer ``k`` field
    from the events' JSON ``props`` string with ONE vectorized RE2 pass
    (``pc.extract_regex`` — no per-row json.loads), then integer-sum per
    event type: per-batch C-path partials, driver fold of the tiny
    per-type rows. The oracle extracts with the same RE2 pattern in
    DuckDB, so sums are arithmetic-identical."""
    import numpy as np

    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_type", "props"])

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(pc.fill_null(b.column("props"), ""),
                              pattern=r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        # non-matching rows: count 0, contribute 0 — stays int64 end to end
        valid = pc.is_valid(k).to_numpy(zero_copy_only=False)
        kv = pc.fill_null(k, 0).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pandas(),
            "k": kv, "m": valid.astype("int64")})
        agg = df.groupby("event_type", sort=False).agg(
            k_sum=("k", "sum"), n_extracted=("m", "sum")).reset_index()
        return pa.table({
            "event_type": pa.array(agg["event_type"], type=pa.string()),
            "k_sum": pa.array(agg["k_sum"].to_numpy(), type=pa.int64()),
            "n_extracted": pa.array(agg["n_extracted"].to_numpy(),
                                    type=pa.int64()),
        })

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.groupby("event_type", sort=False, as_index=False)[
        ["k_sum", "n_extracted"]].sum()


PROPS_VALUE_SQL = """
SELECT event_type,
       CAST(sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT))
            AS BIGINT) AS k_sum,
       count(regexp_extract(props, '"k": (\\d+)', 1)) AS n_extracted
FROM events GROUP BY event_type
"""


# ---- one-scan correlation matrix: 10 integer moments, 3 exact floats -------


def corr_matrix_lineitem(sf_dir: str):
    """(var_x, var_y, corr) — all three pairwise Pearson correlations of
    quantity / price-cents / discount-percent in ONE scan: each batch emits
    the 10 shared integer moments (n, 3 sums, 3 squares, 3 cross-products)
    as int64 partials (batch sized against cents² overflow), folded
    driver-side in arbitrary-precision ints, one float conversion per
    output — the identical expression tree the HUGEINT oracle evaluates, so
    the floats match bitwise. The multi-statistic-per-scan shape: k
    correlations never cost k passes."""
    import math

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_quantity", "l_extendedprice",
                               "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(b.column("l_quantity")),
                    pa.int64()).to_numpy(zero_copy_only=False)
        c = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        d = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "n": [len(q)],
            "s1": [int(q.sum())], "s2": [int(c.sum())], "s3": [int(d.sum())],
            "s11": [int((q * q).sum())], "s22": [int((c * c).sum())],
            "s33": [int((d * d).sum())], "s12": [int((q * c).sum())],
            "s13": [int((q * d).sum())], "s23": [int((c * d).sum())]})

    # cents² ≤ ~1e14 ⇒ ≤ 32768 rows/batch keeps every int64 partial exact
    parts = li.map_batches(partial, batch_format="pyarrow",
                           batch_size=32768).to_pandas()
    m = {k: int(parts[k].astype(object).sum()) for k in parts.columns}

    def corr(sx, sy, sxx, syy, sxy):
        num = m["n"] * m[sxy] - m[sx] * m[sy]
        d1 = m["n"] * m[sxx] - m[sx] * m[sx]
        d2 = m["n"] * m[syy] - m[sy] * m[sy]
        return float(num) / (math.sqrt(float(d1)) * math.sqrt(float(d2)))

    return pd.DataFrame({
        "var_x": ["qty", "qty", "cents"],
        "var_y": ["cents", "disc", "disc"],
        "corr": [corr("s1", "s2", "s11", "s22", "s12"),
                 corr("s1", "s3", "s11", "s33", "s13"),
                 corr("s2", "s3", "s22", "s33", "s23")]})


CORR_MATRIX_SQL = """
WITH m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS s1,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS HUGEINT)
           AS s2,
         CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS HUGEINT) AS s3,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)) AS s11,
         sum(CAST(round(l_extendedprice*100) AS HUGEINT)
             * CAST(round(l_extendedprice*100) AS HUGEINT)) AS s22,
         sum(CAST(round(l_discount*100) AS HUGEINT)
             * CAST(round(l_discount*100) AS HUGEINT)) AS s33,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_extendedprice*100) AS HUGEINT)) AS s12,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_discount*100) AS HUGEINT)) AS s13,
         sum(CAST(round(l_extendedprice*100) AS HUGEINT)
             * CAST(round(l_discount*100) AS HUGEINT)) AS s23
  FROM lineitem)
SELECT 'qty' AS var_x, 'cents' AS var_y,
       CAST(n*s12 - s1*s2 AS DOUBLE)
         / (sqrt(CAST(n*s11 - s1*s1 AS DOUBLE))
            * sqrt(CAST(n*s22 - s2*s2 AS DOUBLE))) AS corr FROM m
UNION ALL
SELECT 'qty', 'disc',
       CAST(n*s13 - s1*s3 AS DOUBLE)
         / (sqrt(CAST(n*s11 - s1*s1 AS DOUBLE))
            * sqrt(CAST(n*s33 - s3*s3 AS DOUBLE))) FROM m
UNION ALL
SELECT 'cents', 'disc',
       CAST(n*s23 - s2*s3 AS DOUBLE)
         / (sqrt(CAST(n*s22 - s2*s2 AS DOUBLE))
            * sqrt(CAST(n*s33 - s3*s3 AS DOUBLE))) FROM m
"""


# ---- grouped ordered string_agg: the manifest-building shape ---------------


def manifest_by_lang(sf_dir: str):
    """(lang, n_docs, doc_ids) — per language, the count and the
    comma-joined doc_id list in ascending order (the training-manifest /
    shard-listing shape). Groups hash-bucket into Ray tasks; each bucket
    sorts once and joins per group on the pandas path. Contract (same as
    grouped quantiles): one GROUP's id list must fit a task — groups here
    are languages, a bounded vocabulary; at 100 TB you'd shard the manifest
    by (lang, id-range) instead of concatenating one string per lang."""
    import numpy as np

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang"])

    def add_bucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column("lang").to_pandas(), index=False).to_numpy()
        return pa.table({"doc_id": b.column("doc_id"),
                         "lang": b.column("lang"),
                         "__b": pa.array((h % np.uint64(8)).astype(np.int32))})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "doc_id"], kind="mergesort")
        agg = g.groupby("lang", sort=False)["doc_id"].agg(
            n_docs="size",
            doc_ids=lambda s: ",".join(map(str, s))).reset_index()
        agg["n_docs"] = agg["n_docs"].astype(np.int64)
        return agg[["lang", "n_docs", "doc_ids"]]

    return docs.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas")


MANIFEST_BY_LANG_SQL = """
SELECT lang, count(*) AS n_docs,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
FROM documents GROUP BY lang
"""


def pagerank_custsupp(sf_dir: str):
    """(node, rank) — 3 exact-integer PageRank rounds over the symmetric
    customer–supplier trade graph (distinct (o_custkey, l_suppkey) pairs
    from orders ⋈ lineitem, both directions, nodes namespaced 'c…'/'s…').
    stages/pagerank: all-integer micro-rank updates, so a fixed iteration
    count is bit-reproducible — and SQL-checkable via chained CTEs."""
    import numpy as np

    from ..stages.pagerank import pagerank

    o = read_parquet(f"{sf_dir}/orders.parquet",
                     columns=["o_orderkey", "o_custkey"])
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_suppkey"])
    j = bucketed_join(li, o, on="l_orderkey", right_on="o_orderkey")

    def pair_partials(b: pa.Table) -> pa.Table:
        src = pc.binary_join_element_wise(
            "c", pc.cast(b.column("o_custkey"), pa.string()), "")
        dst = pc.binary_join_element_wise(
            "s", pc.cast(b.column("l_suppkey"), pa.string()), "")
        t = pa.table({"src": src, "dst": dst})
        df = t.to_pandas().drop_duplicates()
        h = pd.util.hash_pandas_object(
            df["src"] + "\x00" + df["dst"], index=False).to_numpy()
        return pa.Table.from_pandas(
            df.assign(__pb=(h % 32).astype(np.int32)),
            preserve_index=False)

    dedup = j.map_batches(pair_partials, batch_format="pyarrow") \
        .groupby("__pb").map_groups(
            lambda g: g.drop(columns="__pb").drop_duplicates(),
            batch_format="pandas")

    def symmetric(b: pa.Table) -> pa.Table:
        return pa.concat_tables([
            b, pa.table({"src": b.column("dst"), "dst": b.column("src")})])

    edges = dedup.map_batches(symmetric, batch_format="pyarrow")
    return pagerank(edges, "src", "dst", iterations=3)


_PR_STEP = """
c{k} AS (SELECT e.dst AS node, sum(r{p}.rank // r{p}.d) AS s
         FROM e JOIN r{p} ON r{p}.node = e.src GROUP BY e.dst),
r{k} AS (SELECT deg.node, deg.d,
                CAST((15 * 1000000) // 100
                     + (85 * COALESCE(c{k}.s, 0)) // 100 AS BIGINT) AS rank
         FROM deg LEFT JOIN c{k} USING (node))"""

PAGERANK_SQL = ("""
WITH e0 AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                            's' || CAST(l_suppkey AS VARCHAR) AS dst
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
e AS (SELECT src, dst FROM e0
      UNION ALL SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
r0 AS (SELECT node, d, CAST(1000000 AS BIGINT) AS rank FROM deg),"""
                + ",".join(_PR_STEP.format(k=k, p=k - 1)
                           for k in (1, 2, 3))
                + """
SELECT node, rank FROM r3
""")


# ---- TPC-H-Q5-shaped 5-table join ------------------------------------------


def revenue_by_nation(sf_dir: str, region: str = "ASIA",
                      broadcast_orders_limit: int = 4_000_000):
    """(n_name, revenue_x10000, n_items) — the classic 5-table star join
    (TPC-H Q5 shape): revenue per nation for line items whose CUSTOMER and
    SUPPLIER share a nation inside ``region``.

    Join plan, sized by table role — and pruned BEFORE the exchanges:

    - supplier / nation / region are DIMENSIONS, broadcast once (``ray.put``
      Arrow arrays, ``pc.index_in`` probe — never re-shipped or shuffled);
    - the lineitem SCAN probes the supplier→nation map, keeps only rows
      whose supplier nation lies in ``region`` (~1/|regions| of the fact
      never leaves the scan), and reduces each row to THREE int64s
      ``(l_orderkey, snat, x)`` — the float price/discount columns die at
      the read;
    - fact join 1: pruned lineitem ⋈ orders on orderkey (hash exchange);
    - a per-batch COMBINER collapses to (o_custkey, snat) partial sums
      before fact join 2 against the region-filtered customer side —
      the second exchange moves ~|orders-per-region| rows, not lineitem;
    - final filter snat == c_nationkey, 25-group aggregate.

    Exact floats: revenue accumulates as int64
    ``extprice_cents · (100 − disc_pct)`` (= extprice·(1−discount)·10⁴
    exactly); the SQL oracle sums the identical integers. int64 partial
    bound: ~1e9/row · 65k rows/batch ≪ 2⁶³; the GLOBAL sum stays exact to
    ~9·10⁹ rows per nation — past that the oracle spelling (HUGEINT) and a
    two-level Ray fold would both widen."""
    import numpy as np
    import ray

    from ..stages.joins import hash_join

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"])

    # dimension side: supplier→nation map + region-restricted nation names
    sup = read_dim_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    import pyarrow.parquet as pq
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rkeys = reg.filter(pc.equal(reg.column("r_name"), region)) \
        .column("r_regionkey")
    nat = nation.filter(pc.is_in(nation.column("n_regionkey"),
                                 value_set=rkeys.combine_chunks()))
    name_by_key = dict(zip(nat.column("n_nationkey").to_pylist(),
                           nat.column("n_name").to_pylist()))
    dim_ref = ray.put((sup.column("s_suppkey").combine_chunks(),
                       sup.column("s_nationkey").combine_chunks(),
                       pa.array(sorted(name_by_key), type=pa.int64())))

    def li_prune(b: pa.Table) -> pa.Table:
        skeys, snats, region_nats = ray.get(dim_ref)
        snat = pc.cast(snats.take(pc.index_in(
            b.column("l_suppkey"), value_set=skeys)), pa.int64())
        t = pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "snat": snat,
            "x": pc.multiply(
                pc.cast(pc.round(pc.multiply(
                    b.column("l_extendedprice"), 100)), pa.int64()),
                pc.subtract(pa.scalar(100, pa.int64()),
                            pc.cast(pc.round(pc.multiply(
                                b.column("l_discount"), 100)), pa.int64()))),
        })
        return t.filter(pc.fill_null(
            pc.is_in(snat, value_set=region_nats), False))

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_suppkey",
                               "l_extendedprice", "l_discount"]) \
        .map_batches(li_prune, batch_format="pyarrow")

    # Round-4 fast path: below the gate, the orderkey→customer-nation map
    # is itself broadcast-small (two int64 arrays), so the WHOLE star
    # collapses into ONE fused lineitem scan probing two sorted lookup
    # arrays — zero exchanges. Past the gate (orders outgrow a broadcast)
    # the original two-exchange plan below runs unchanged.
    import pyarrow.parquet as pq_

    n_orders = pq_.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    if n_orders <= broadcast_orders_limit:
        from ..sources.parquet import FusedParquetScan

        cdim = read_dim_table(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])
        cnat_all = pc.cast(cdim.column("c_nationkey"), pa.int64())
        ckeep = pc.fill_null(pc.is_in(
            cnat_all, value_set=pa.array(sorted(name_by_key),
                                         type=pa.int64())), False)
        cdim_r = pa.table({"k": cdim.column("c_custkey"),
                           "n": cnat_all}).filter(ckeep)
        ot = pq_.read_table(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey"])
        oidx = pc.index_in(ot.column("o_custkey"),
                           value_set=cdim_r.column("k").combine_chunks())
        olive = pc.is_valid(oidx)
        okeys = ot.column("o_orderkey").filter(olive) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ocnat = cdim_r.column("n").combine_chunks() \
            .take(pc.filter(oidx, olive)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        order_sort = np.argsort(okeys, kind="stable")
        okeys, ocnat = okeys[order_sort], ocnat[order_sort]
        skeys_l = sup.column("s_suppkey").combine_chunks()
        snats_l = sup.column("s_nationkey").combine_chunks()

        def li_star(b: pa.Table) -> pa.Table:
            snat = pc.cast(snats_l.take(pc.index_in(
                b.column("l_suppkey"), value_set=skeys_l)), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(okeys, lk)
            pos[pos == len(okeys)] = 0
            hit = (len(okeys) > 0) & (okeys[pos] == lk)
            ok = hit & (ocnat[pos] == snat)
            if not ok.any():
                return pa.table({"n_nationkey": pa.array([], pa.int64()),
                                 "rev": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            x = (pc.cast(pc.round(pc.multiply(
                b.column("l_extendedprice"), 100)), pa.int64())
                .to_numpy(zero_copy_only=False)[ok]
                * (100 - pc.cast(pc.round(pc.multiply(
                    b.column("l_discount"), 100)), pa.int64())
                   .to_numpy(zero_copy_only=False)[ok]))
            df_ = pd.DataFrame({"n": snat[ok], "x": x})
            g = df_.groupby("n", sort=False)["x"].agg(["sum", "size"])
            return pa.table({
                "n_nationkey": pa.array(g.index.to_numpy(), pa.int64()),
                "rev": pa.array(g["sum"].to_numpy().astype(np.int64)),
                "cnt": pa.array(g["size"].to_numpy().astype(np.int64)),
            })

        parts = FusedParquetScan(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey",
                     "l_extendedprice", "l_discount"]) \
            .map_batches(li_star).to_pandas()
        if not len(parts):
            return pd.DataFrame({"n_name": pd.Series([], dtype=object),
                                 "revenue_x10000": pd.Series([],
                                                             dtype=np.int64),
                                 "n_items": pd.Series([], dtype=np.int64)})
        agg = parts.groupby("n_nationkey", as_index=False).agg(
            revenue_x10000=("rev", "sum"), n_items=("cnt", "sum"))
        agg["n_name"] = agg["n_nationkey"].map(name_by_key)
        agg["n_items"] = agg["n_items"].astype(np.int64)
        agg["revenue_x10000"] = agg["revenue_x10000"].astype(np.int64)
        return agg[["n_name", "revenue_x10000", "n_items"]] \
            .sort_values("n_name").reset_index(drop=True)

    def cust_prune(b: pa.Table) -> pa.Table:
        _, _, region_nats = ray.get(dim_ref)
        cnat = pc.cast(b.column("c_nationkey"), pa.int64())
        return pa.table({"c_custkey": b.column("c_custkey"),
                         "cnat": cnat}).filter(
            pc.fill_null(pc.is_in(cnat, value_set=region_nats), False))

    cust = read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"]) \
        .map_batches(cust_prune, batch_format="pyarrow")

    # BOTH native joins are live at once in the streaming executor and
    # each reserves num_partitions aggregator actors — size them so the
    # pair plus map tasks fits the session (32 each deadlocks an 8-CPU
    # session; repo conventions: partitions ≲ CPUs)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = max(2, min(16, cpus // 4))

    j1 = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                   num_partitions=nparts)

    def combine(b: pa.Table) -> pa.Table:
        g = b.select(["o_custkey", "snat", "x"]) \
            .group_by(["o_custkey", "snat"]).aggregate(
                [("x", "sum"), ("x", "count")])
        return pa.table({"o_custkey": g.column("o_custkey"),
                         "snat": g.column("snat"),
                         "rev": g.column("x_sum"),
                         "cnt": g.column("x_count")})

    j2 = hash_join(j1.map_batches(combine, batch_format="pyarrow"),
                   cust, on="o_custkey", right_on="c_custkey",
                   num_partitions=nparts)

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("snat"), b.column("cnat")))
        g = t.select(["snat", "rev", "cnt"]).group_by("snat").aggregate(
            [("rev", "sum"), ("cnt", "sum")])
        return pa.table({"n_nationkey": g.column("snat"),
                         "rev": g.column("rev_sum"),
                         "cnt": g.column("cnt_sum")})

    from ray.data.aggregate import Sum

    agg = j2.map_batches(partial, batch_format="pyarrow") \
        .groupby("n_nationkey").aggregate(
            Sum("rev", alias_name="revenue_x10000"),
            Sum("cnt", alias_name="n_items")).to_pandas()
    agg["n_name"] = agg["n_nationkey"].map(name_by_key)
    agg["n_items"] = agg["n_items"].astype(np.int64)
    return agg[["n_name", "revenue_x10000", "n_items"]] \
        .sort_values("n_name").reset_index(drop=True)


REVENUE_BY_NATION_SQL = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_x10000,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name ORDER BY n_name
"""


# ---- TPC-H-Q1-shaped pricing summary ---------------------------------------


def pricing_summary_lineitem(sf_dir: str):
    """(l_returnflag, l_linestatus, sum_qty, sum_base_price_cents,
    sum_disc_price_x10000, sum_charge_x1000000, avg_qty, avg_price,
    avg_disc, count_order) — the canonical one-scan pricing summary
    (TPC-H Q1 shape): shipdate-filtered, 8 aggregates per
    (returnflag, linestatus) cell computed from ONE pass of integer
    partials.

    Exact-float contract: every sum is an exact int64 —
    qty, price cents, cents·(100−disc), cents·(100−disc)·(100+tax) —
    and each avg is ONE float division (÷ a power of ten after), the
    identical expression the SQL oracle spells. The date predicate is a
    timestamp comparison against the same literal in both engines."""
    from datetime import datetime

    import numpy as np

    from ray.data.aggregate import Sum

    cutoff = datetime(1998, 9, 2)
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_returnflag", "l_linestatus", "l_quantity",
                               "l_extendedprice", "l_discount", "l_tax",
                               "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(
            b.column("l_shipdate"),
            pa.scalar(cutoff, type=pa.timestamp("us"))))
        q = pc.cast(pc.round(b.column("l_quantity")), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(
            b.column("l_extendedprice"), 100)), pa.int64())
        dk = pc.subtract(pa.scalar(100, pa.int64()),
                         pc.cast(pc.round(pc.multiply(
                             b.column("l_discount"), 100)), pa.int64()))
        tk = pc.add(pa.scalar(100, pa.int64()),
                    pc.cast(pc.round(pc.multiply(
                        b.column("l_tax"), 100)), pa.int64()))
        disc_price = pc.multiply(cents, dk)
        t = pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "sum_qty": q,
            "sum_base_price_cents": cents,
            "sum_disc_price_x10000": disc_price,
            "sum_charge_x1000000": pc.multiply(disc_price, tk),
            "sum_disc_pct": pc.subtract(pa.scalar(100, pa.int64()), dk),
            "n": pa.array(np.ones(len(q), np.int64)),
        })
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [(c, "sum") for c in t.column_names[2:]])
        return g.rename_columns(
            ["l_returnflag", "l_linestatus"]
            + [c[:-4] for c in g.column_names[2:]])

    cols = ["sum_qty", "sum_base_price_cents", "sum_disc_price_x10000",
            "sum_charge_x1000000", "sum_disc_pct", "n"]
    agg = li.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            *[Sum(c, alias_name=c) for c in cols]).to_pandas()
    n = agg["n"].to_numpy(np.float64)
    agg["avg_qty"] = agg["sum_qty"].to_numpy(np.float64) / n
    agg["avg_price"] = (agg["sum_base_price_cents"].to_numpy(np.float64)
                        / n / 100.0)
    agg["avg_disc"] = agg["sum_disc_pct"].to_numpy(np.float64) / n / 100.0
    agg["count_order"] = agg["n"].astype(np.int64)
    return agg[["l_returnflag", "l_linestatus", "sum_qty",
                "sum_base_price_cents", "sum_disc_price_x10000",
                "sum_charge_x1000000", "avg_qty", "avg_price", "avg_disc",
                "count_order"]] \
        .sort_values(["l_returnflag", "l_linestatus"]) \
        .reset_index(drop=True)


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
         AS sum_base_price_cents,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
         AS sum_disc_price_x10000,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))
                * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT)
         AS sum_charge_x1000000,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg_qty,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) / 100.0 AS avg_price,
       CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) / 100.0 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---- TPC-H-Q3-shaped ranked join -------------------------------------------


def top_unshipped_orders(sf_dir: str, segment: str = "BUILDING",
                         cutoff_s: str = "1997-01-01", k: int = 10,
                         broadcast_orders_limit: int = 4_000_000):
    """(l_orderkey, revenue_x10000, o_orderdate, o_orderpriority) — the
    classic shipping-priority query (TPC-H Q3 shape): the ``k`` highest-
    revenue orders of one customer segment, ordered before the cutoff but
    (partly) shipped after it.

    Distributed shape: both fact scans filter AT THE READ (orderdate /
    shipdate predicates inside the first map — rows die before any
    exchange); the segment restriction is a SEMI join (stages/joins —
    payload never moves, broadcast/shuffle auto-switch); one hash join
    keys the surviving facts; per-batch integer partials aggregate per
    order; the global top-k merges BOUNDED per-block heads
    (each block's top-k, then one driver head over blocks·k rows) —
    no global sort of the aggregate. Ties break (revenue DESC,
    o_orderdate ASC, l_orderkey ASC) in both engines."""
    from datetime import datetime

    import numpy as np
    import ray

    from ..stages.joins import hash_join

    cutoff = datetime.fromisoformat(cutoff_s)
    ts = pa.scalar(cutoff, type=pa.timestamp("us"))

    # the segment key set is customer-dimension-bounded: read it driver-
    # side (read_dim_table's loud gate) and fuse the SEMI filter into the
    # orders prune as one index_in pass — payload never moves, and the
    # separate semi-join execution disappears (the shuffle semi path stays
    # exercised by priority_counts, broadcast semi by parts_in_lineitem)
    cdim = read_dim_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_mktsegment"])
    seg_keys = cdim.filter(pc.equal(cdim.column("c_mktsegment"), segment)) \
        .column("c_custkey").combine_chunks()

    # Round-4 fast path: the QUALIFYING orders (segment ∩ pre-cutoff) are
    # a small fraction of an already-gated table — below the gate they
    # broadcast as sorted lookup arrays into ONE fused lineitem scan
    # (zero exchanges); past it the hash-join plan below runs unchanged.
    import pyarrow.parquet as pq_

    n_orders = pq_.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    if n_orders <= broadcast_orders_limit:
        from ..sources.parquet import FusedParquetScan

        ot = pq_.read_table(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey",
                                     "o_orderdate", "o_orderpriority"])
        keep = pc.and_(
            pc.less(pc.cast(ot.column("o_orderdate"), pa.timestamp("us")),
                    ts),
            pc.fill_null(pc.is_in(ot.column("o_custkey"),
                                  value_set=seg_keys), False))
        ot = ot.filter(keep)
        okeys = ot.column("o_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order_sort = np.argsort(okeys, kind="stable")
        okeys = okeys[order_sort]
        odate = pc.cast(ot.column("o_orderdate"), pa.timestamp("us")) \
            .to_numpy(zero_copy_only=False)[order_sort]
        opri = ot.column("o_orderpriority").to_numpy(
            zero_copy_only=False)[order_sort]

        def li_q3(b: pa.Table) -> pa.Table:
            b = b.filter(pc.greater(
                pc.cast(b.column("l_shipdate"), pa.timestamp("us")), ts))
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(okeys, lk)
            pos[pos == len(okeys)] = 0
            hit = (len(okeys) > 0) & (okeys[pos] == lk)
            if not hit.any():
                return pa.table({"oi": pa.array([], pa.int64()),
                                 "rev": pa.array([], pa.int64())})
            x = (pc.cast(pc.round(pc.multiply(
                b.column("l_extendedprice"), 100)), pa.int64())
                .to_numpy(zero_copy_only=False)[hit]
                * (100 - pc.cast(pc.round(pc.multiply(
                    b.column("l_discount"), 100)), pa.int64())
                   .to_numpy(zero_copy_only=False)[hit]))
            g = pd.DataFrame({"oi": pos[hit], "rev": x}) \
                .groupby("oi", sort=False, as_index=False)["rev"].sum()
            return pa.table({"oi": pa.array(g["oi"].to_numpy(),
                                            pa.int64()),
                             "rev": pa.array(g["rev"].to_numpy()
                                             .astype(np.int64))})

        parts = FusedParquetScan(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount",
                     "l_shipdate"]).map_batches(li_q3).to_pandas()
        if not len(parts):
            return pd.DataFrame({
                "l_orderkey": pd.Series([], dtype=np.int64),
                "revenue_x10000": pd.Series([], dtype=np.int64),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "o_orderpriority": pd.Series([], dtype=object)})
        agg = parts.groupby("oi", as_index=False)["rev"].sum()
        oi = agg["oi"].to_numpy()
        heads = pd.DataFrame({
            "l_orderkey": okeys[oi],
            "revenue_x10000": agg["rev"].to_numpy().astype(np.int64),
            "o_orderdate": odate[oi],
            "o_orderpriority": opri[oi],
        }).sort_values(["revenue_x10000", "o_orderdate", "l_orderkey"],
                       ascending=[False, True, True],
                       kind="mergesort").head(k)
        return heads.reset_index(drop=True)

    def o_prune(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("o_orderdate"), ts))
        return b.filter(pc.fill_null(
            pc.is_in(b.column("o_custkey"), value_set=seg_keys), False))

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey", "o_orderdate",
                                   "o_orderpriority"]) \
        .map_batches(o_prune, batch_format="pyarrow")

    def l_prune(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("l_shipdate"), ts))
        x = pc.multiply(
            pc.cast(pc.round(pc.multiply(
                b.column("l_extendedprice"), 100)), pa.int64()),
            pc.subtract(pa.scalar(100, pa.int64()),
                        pc.cast(pc.round(pc.multiply(
                            b.column("l_discount"), 100)), pa.int64())))
        return pa.table({"l_orderkey": b.column("l_orderkey"), "x": x})

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_extendedprice",
                               "l_discount", "l_shipdate"]) \
        .map_batches(l_prune, batch_format="pyarrow")

    cpus = int(ray.cluster_resources().get("CPU", 8))
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                  num_partitions=max(2, min(16, cpus // 2)))

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["l_orderkey", "o_orderdate", "o_orderpriority", "x"]) \
            .group_by(["l_orderkey", "o_orderdate", "o_orderpriority"]) \
            .aggregate([("x", "sum")])
        return g.rename_columns(list(g.column_names[:-1]) + ["rev"])

    def add_kb(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column("l_orderkey").to_pandas(), index=False).to_numpy()
        return b.append_column(
            "__kb", pa.array((h % np.uint64(32)).astype(np.int32)))

    def fold_head(g: pd.DataFrame) -> pd.DataFrame:
        # an order lives in exactly one bucket: full sums here, then the
        # bucket's own top-k — the driver merges only 32·k rows
        agg = (g.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"],
                         sort=False, as_index=False)["rev"].sum())
        return agg.sort_values(["rev", "o_orderdate", "l_orderkey"],
                               ascending=[False, True, True],
                               kind="mergesort").head(k)

    heads = j.map_batches(partial, batch_format="pyarrow") \
        .map_batches(add_kb, batch_format="pyarrow") \
        .groupby("__kb").map_groups(
            lambda g: fold_head(g.drop(columns="__kb")),
            batch_format="pandas").to_pandas()
    heads = heads.sort_values(
        ["rev", "o_orderdate", "l_orderkey"],
        ascending=[False, True, True], kind="mergesort").head(k)
    heads["revenue_x10000"] = heads["rev"].astype(np.int64)
    return heads[["l_orderkey", "revenue_x10000", "o_orderdate",
                  "o_orderpriority"]].reset_index(drop=True)


TOP_UNSHIPPED_SQL = """
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_x10000,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_x10000 DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def grouping_sets_revenue(sf_dir: str):
    """GROUP BY GROUPING SETS ((nation), (year), ()) over order revenue —
    the multi-level aggregate shape beyond ROLLUP's prefix hierarchy: one
    corpus scan folds the FINEST (nation, year) cells (bounded by
    |nations| × |years|), and every requested set derives from those cells
    driver-side with the same integer arithmetic. NULL marks the
    aggregated-out dimension exactly as SQL does."""
    import ray

    ctab = read_dim_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_nationkey"])
    ntab = read_dim_table(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"])
    nidx = pc.index_in(ctab.column("c_nationkey"),
                       value_set=ntab.column("n_nationkey"))
    cnation = ntab.column("n_name").take(nidx).combine_chunks()
    ref = ray.put((ctab.column("c_custkey").combine_chunks(), cnation))

    class Partial:
        def __init__(self, r):
            self.ck, self.cn = (ray.get(r)
                                if isinstance(r, ray.ObjectRef) else r)

        def __call__(self, b: pa.Table) -> pa.Table:
            cidx = pc.index_in(b.column("o_custkey"), value_set=self.ck)
            t = pa.table({
                "n_name": self.cn.take(cidx),
                "o_year": pc.year(b.column("o_orderdate")),
                "cents": pc.cast(pc.round(pc.multiply(
                    b.column("o_totalprice"), 100)), pa.int64())})
            g = t.group_by(["n_name", "o_year"]).aggregate(
                [("cents", "sum"), ("cents", "count")])
            return pa.table({
                "n_name": g.column("n_name"), "o_year": g.column("o_year"),
                "revenue_cents": g.column("cents_sum"),
                "n_orders": pc.cast(g.column("cents_count"), pa.int64())})

    fine = (read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])
            .map_batches(Partial, fn_constructor_args=(ref,), concurrency=(1, 2),
                         batch_format="pyarrow").to_pandas()
            .groupby(["n_name", "o_year"], as_index=False)
            [["revenue_cents", "n_orders"]].sum())
    by_nation = (fine.groupby("n_name", as_index=False)
                 [["revenue_cents", "n_orders"]].sum())
    # float64 with NaN, matching the dtype a NULL-bearing SQL int column
    # lands in pandas (canonical compare is repr-based)
    by_nation["o_year"] = np.nan
    by_year = (fine.groupby("o_year", as_index=False)
               [["revenue_cents", "n_orders"]].sum())
    by_year["n_name"] = None
    total = pd.DataFrame({
        "n_name": [None], "o_year": [np.nan],
        "revenue_cents": [fine["revenue_cents"].sum()],
        "n_orders": [fine["n_orders"].sum()]})
    cols = ["n_name", "o_year", "revenue_cents", "n_orders"]
    out = pd.concat([by_nation[cols], by_year[cols], total[cols]])
    out["o_year"] = out["o_year"].astype("float64")
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return (out.sort_values(["n_name", "o_year"], kind="mergesort",
                            na_position="last")
            .reset_index(drop=True))


GROUPING_SETS_SQL = """
SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY GROUPING SETS ((n.n_name), (year(o.o_orderdate)), ())
ORDER BY n_name NULLS LAST, o_year NULLS LAST
"""


def rolling_active_users(sf_dir: str, window_days: int = 7):
    """Per calendar day of the events log: how many DISTINCT users were
    active in the trailing ``window_days``-day window ending that day —
    the rolling-cohort liveness curve. Per-batch distinct (day, user)
    pairs (bounded by |days| × |users|, NOT event rows) fold driver-side;
    each day's window distinct count is exact.

    Day grid = days with ≥1 event (SQL mirrors with the same distinct-day
    CTE)."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        t_us = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                       pa.int64())
        day = pc.divide(t_us, 86_400_000_000)
        t = pa.table({"day": day, "user_id": b.column("user_id")})
        return t.group_by(["day", "user_id"]).aggregate([])

    pairs = (ev.map_batches(partial, batch_format="pyarrow").to_pandas()
             .drop_duplicates(["day", "user_id"]))
    days = np.sort(pairs["day"].unique())
    d = pairs["day"].to_numpy()
    u = pairs["user_id"].to_numpy()
    rows = []
    for day in days:
        m = (d > day - window_days) & (d <= day)
        rows.append((np.int64(day), np.int64(len(np.unique(u[m])))))
    out = pd.DataFrame(rows, columns=["day_epoch", "active_users"])
    return out


ROLLING_ACTIVE_SQL = """
WITH p AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
           FROM events),
days AS (SELECT DISTINCT day FROM p)
SELECT CAST(d.day AS BIGINT) AS day_epoch,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS active_users
FROM days d JOIN p ON p.day > d.day - 7 AND p.day <= d.day
GROUP BY 1 ORDER BY 1
"""


def linear_attribution_events(sf_dir: str):
    """Linear multi-touch attribution: every click is credited to the NEXT
    purchase of the same user, and each purchase's 1.000000 of credit
    (1e6 ppm) splits EVENLY over its attributed clicks — the integer
    remainder goes to the latest click (ties → highest event_id), so the
    split is exact and deterministic in both engines. Output: one row per
    credited click ``(event_id, user_id, credit_ppm)``.

    Shape: one hash-bucket exchange on user; per bucket, purchases and
    clicks of every user associate in one vectorized pass (the same
    segment-offset + searchsorted trick as the window stages — clicks
    search the purchase timeline for their next purchase)."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_id", "user_id", "ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("event_type"),
                     value_set=pa.array(["click", "purchase"]))
        b = b.filter(m)
        users = b.column("user_id")
        return pa.table({
            "event_id": b.column("event_id"), "user_id": users,
            "t": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                         pa.int64()),
            "is_click": pc.cast(pc.equal(b.column("event_type"), "click"),
                                pa.int8()),
            "__b": pc.cast(pc.bit_wise_and(users, 31), pa.int32())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                              "user_id": pd.Series([], dtype="int64"),
                              "credit_ppm": pd.Series([], dtype="int64")})
        if g.empty:
            return empty
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        pur = g[g["is_click"] == 0]
        clk = g[g["is_click"] == 1]
        if pur.empty or clk.empty:
            return empty
        # offset each user's purchase timeline onto a disjoint range so
        # one global searchsorted finds every click's next purchase
        users = np.union1d(pur["user_id"].to_numpy(),
                           clk["user_id"].to_numpy())
        uidx = {u: i for i, u in enumerate(users)}
        tmin = int(g["t"].min())
        span = np.int64(int(g["t"].max()) - tmin + 2)
        pu = pur["user_id"].map(uidx).to_numpy(dtype=np.int64)
        pt = (pur["t"].to_numpy() - tmin) + pu * span
        cu = clk["user_id"].map(uidx).to_numpy(dtype=np.int64)
        ct = (clk["t"].to_numpy() - tmin) + cu * span
        nxt = np.searchsorted(pt, ct, side="left")   # next p.t >= c.t
        # valid only when the found purchase belongs to the same user
        valid = (nxt < len(pt)) & (pu[np.minimum(nxt, len(pt) - 1)] == cu)
        clk = clk[valid]
        if clk.empty:
            return empty
        pid = pur["event_id"].to_numpy()[nxt[valid]]
        df = pd.DataFrame({"event_id": clk["event_id"].to_numpy(),
                           "user_id": clk["user_id"].to_numpy(),
                           "t": clk["t"].to_numpy(), "pid": pid})
        # remainder → the latest click of the window (max t, then max id)
        df = df.sort_values(["pid", "t", "event_id"], kind="mergesort")
        sizes = df.groupby("pid")["event_id"].transform("size").to_numpy()
        base = (1_000_000 // sizes).astype(np.int64)
        rem = (1_000_000 % sizes).astype(np.int64)
        last = np.zeros(len(df), dtype=bool)
        pid_arr = df["pid"].to_numpy()
        last[:-1] = pid_arr[:-1] != pid_arr[1:]
        last[-1] = True
        credit = base + np.where(last, rem, 0)
        out = pd.DataFrame({"event_id": df["event_id"].to_numpy(),
                            "user_id": df["user_id"].to_numpy(),
                            "credit_ppm": credit.astype(np.int64)})
        return out

    df = (ev.map_batches(partial, batch_format="pyarrow")
          .groupby("__b").map_groups(per_bucket, batch_format="pandas")
          ).to_pandas()
    if "event_id" not in df.columns:
        df = pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                           "user_id": pd.Series([], dtype=np.int64),
                           "credit_ppm": pd.Series([], dtype=np.int64)})
    return df.sort_values("event_id", kind="mergesort").reset_index(drop=True)


LINEAR_ATTRIBUTION_SQL = """
WITH pur AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events
             WHERE event_type = 'purchase'),
clk AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events
        WHERE event_type = 'click'),
nx AS (SELECT c.event_id, c.user_id, c.t,
              (SELECT p.event_id FROM pur p
               WHERE p.user_id = c.user_id AND p.t >= c.t
               ORDER BY p.t, p.event_id LIMIT 1) AS pid
       FROM clk c),
w AS (SELECT *, CAST(count(*) OVER (PARTITION BY pid) AS BIGINT) AS n,
             row_number() OVER (PARTITION BY pid ORDER BY t DESC,
                                event_id DESC) AS rn
      FROM nx WHERE pid IS NOT NULL)
SELECT event_id, user_id,
       CAST(1000000 // n + CASE WHEN rn = 1 THEN 1000000 % n ELSE 0 END
            AS BIGINT) AS credit_ppm
FROM w ORDER BY event_id
"""


def coverage_users_events(sf_dir: str, window_s: int = 600):
    """Per user: the total number of SECONDS covered by the union of the
    ``[t, t+window)`` activity intervals around their events — the
    interval-union sweep (overlaps merge, gaps don't count). One sorted
    pass per hash bucket: covered = Σ min(next_t − t, window) + window for
    each user's last event. Second resolution, exact integers.
    """
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_id", "user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        users = b.column("user_id")
        t_us = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                       pa.int64())
        return pa.table({
            "user_id": users, "t": pc.divide(t_us, 1_000_000),
            "__b": pc.cast(pc.bit_wise_and(users, 31), pa.int32())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "covered_seconds": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "t"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["t"].to_numpy().astype(np.int64)
        n = len(g)
        nxt_same = np.zeros(n, dtype=bool)
        if n > 1:
            nxt_same[:-1] = u[:-1] == u[1:]
        gap = np.full(n, np.int64(window_s))
        if n > 1:
            d = t[1:] - t[:-1]
            gap[:-1] = np.where(nxt_same[:-1],
                                np.minimum(d, window_s), window_s)
        df = pd.DataFrame({"user_id": u, "c": gap})
        out = df.groupby("user_id", sort=False).agg(
            covered_seconds=("c", "sum"), n_events=("c", "size"))
        out = out.reset_index()
        out["covered_seconds"] = out["covered_seconds"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    df = (ev.map_batches(partial, batch_format="pyarrow")
          .groupby("__b").map_groups(per_bucket, batch_format="pandas")
          ).to_pandas()
    if "user_id" not in df.columns:
        df = pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                           "covered_seconds": pd.Series([], dtype=np.int64),
                           "n_events": pd.Series([], dtype=np.int64)})
    return df.sort_values("user_id", kind="mergesort").reset_index(drop=True)


COVERAGE_USERS_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS t FROM events),
w AS (SELECT user_id, t,
             lead(t) OVER (PARTITION BY user_id ORDER BY t) AS nt
      FROM e)
SELECT user_id,
       CAST(sum(least(coalesce(nt - t, 600), 600)) AS BIGINT)
         AS covered_seconds,
       CAST(count(*) AS BIGINT) AS n_events
FROM w GROUP BY 1 ORDER BY 1
"""


def event_lift_daily(sf_dir: str):
    """Per event-type pair: in how many distinct (user, day) activity
    cells do both types occur, and the co-occurrence LIFT in exact ppm —
    ``(n_ab · n_cells · 10⁶) // (n_a · n_b)``, pure integer floor, where
    n_cells is the total distinct (user, day) count. Lift > 1e6 ⇔ the
    types attract. Per-batch distinct (user, day, type) triples (bounded
    by |users| × |days| × |types|) hash on (user, day) so each bucket
    enumerates its cells' pairs with one ordered self-merge."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        t_us = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                       pa.int64())
        t = pa.table({"user_id": b.column("user_id"),
                      "day": pc.divide(t_us, 86_400_000_000),
                      "event_type": b.column("event_type")})
        g = t.group_by(["user_id", "day", "event_type"]).aggregate([])
        users = g.column("user_id")
        bucket = pc.bit_wise_and(pc.add(pc.multiply(users, 31),
                                        g.column("day")), 31)
        return g.append_column("__b", pc.cast(bucket, pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day", "event_type"])
        m = g.merge(g, on=["user_id", "day"], suffixes=("_a", "_b"))
        m = m[m["event_type_a"] < m["event_type_b"]]
        pairs = (m.groupby(["event_type_a", "event_type_b"], sort=False)
                 .size().reset_index(name="n_ab"))
        singles = (g.groupby("event_type", sort=False)
                   .size().reset_index(name="n_t"))
        cells = g.drop_duplicates(["user_id", "day"])
        pairs["kind"] = "pair"
        singles["kind"] = "single"
        meta = pd.DataFrame({"kind": ["cells"], "n_ab": [len(cells)]})
        return pd.concat([pairs, singles, meta], ignore_index=True)

    raw = (ev.map_batches(partial, batch_format="pyarrow")
           .groupby("__b").map_groups(per_bucket, batch_format="pandas")
           ).to_pandas()
    n_cells = int(raw.loc[raw["kind"] == "cells", "n_ab"].sum())
    singles = (raw[raw["kind"] == "single"]
               .groupby("event_type")["n_t"].sum().astype(int).to_dict())
    pairs = (raw[raw["kind"] == "pair"]
             .groupby(["event_type_a", "event_type_b"], as_index=False)
             ["n_ab"].sum())
    rows = []
    for _, r in pairs.iterrows():
        ta, tb, nab = r["event_type_a"], r["event_type_b"], int(r["n_ab"])
        lift = (nab * n_cells * 1_000_000) // (singles[ta] * singles[tb])
        rows.append((ta, tb, np.int64(nab), np.int64(lift)))
    out = pd.DataFrame(rows, columns=["event_type_a", "event_type_b",
                                      "n_ab", "lift_ppm"])
    return (out.sort_values(["event_type_a", "event_type_b"],
                            kind="mergesort").reset_index(drop=True))


EVENT_LIFT_SQL = """
WITH d AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day,
                  event_type FROM events),
cells AS (SELECT CAST(count(*) AS BIGINT) AS n
          FROM (SELECT DISTINCT user_id, day FROM d)),
s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
      FROM d GROUP BY 1),
p AS (SELECT a.event_type AS event_type_a, b.event_type AS event_type_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM d a JOIN d b ON b.user_id = a.user_id AND b.day = a.day
                       AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT p.event_type_a, p.event_type_b, p.n_ab,
       CAST((p.n_ab * cells.n * 1000000) // (sa.n_t * sb.n_t) AS BIGINT)
         AS lift_ppm
FROM p JOIN s sa ON sa.event_type = p.event_type_a
       JOIN s sb ON sb.event_type = p.event_type_b, cells
ORDER BY 1, 2
"""


def peak_concurrency_events(sf_dir: str, window_s: int = 600):
    """One row: the maximum number of SIMULTANEOUSLY open activity
    intervals ``[t, t+window)`` across all users, and the earliest second
    it is reached — the classic boundary sweep (+1 at starts, −1 at ends,
    ends before starts at equal times for half-open semantics, running
    max of the prefix sum). Per-batch boundary partials are just the
    event timestamps; the sweep needs the GLOBAL order, so boundaries
    pre-reduce to per-second net deltas (bounded by the active-second
    count) before the driver-side prefix scan."""
    ev = read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        t_us = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                       pa.int64())
        t = pc.divide(t_us, 1_000_000)
        tt = pa.table({"t": t})
        starts = tt.group_by("t").aggregate([("t", "count")])
        out_s = pa.table({"t": starts.column("t"),
                          "d": pc.cast(starts.column("t_count"),
                                       pa.int64())})
        ends = pa.table({
            "t": pc.add(starts.column("t"), window_s),
            "d": pc.multiply(pc.cast(starts.column("t_count"), pa.int64()),
                             -1)})
        return pa.concat_tables([out_s, ends])

    df = (ev.map_batches(partial, batch_format="pyarrow").to_pandas()
          .groupby("t", as_index=False)["d"].sum())
    df = df.sort_values("t", kind="mergesort")
    run = df["d"].cumsum()
    peak = int(run.max())
    first_t = int(df["t"].to_numpy()[int(np.argmax(run.to_numpy()))])
    return pd.DataFrame({
        "peak": pd.Series([peak], dtype=np.int64),
        "first_t_sec": pd.Series([first_t], dtype=np.int64)})


PEAK_CONCURRENCY_SQL = """
WITH t AS (SELECT epoch_us(ts) // 1000000 AS t FROM events),
b AS (SELECT t, CAST(count(*) AS BIGINT) AS d FROM t GROUP BY 1
      UNION ALL
      SELECT t + 600 AS t, -CAST(count(*) AS BIGINT) AS d FROM t GROUP BY 1),
n AS (SELECT t, CAST(sum(d) AS BIGINT) AS d FROM b GROUP BY 1),
r AS (SELECT t, sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS run
      FROM n),
m AS (SELECT max(run) AS peak FROM r)
SELECT CAST(m.peak AS BIGINT) AS peak,
       CAST(min(r.t) AS BIGINT) AS first_t_sec
FROM r JOIN m ON r.run = m.peak GROUP BY m.peak
"""


def twap_users_events(sf_dir: str, cap_s: int = 3600):
    """Per user: the TIME-WEIGHTED average of the value column — each
    event's value holds until the next event (capped at ``cap_s``
    seconds; the last event holds the full cap). Exact integers end to
    end: weights are capped second gaps, the numerator Σ cents·w folds as
    Python ints, and the output is the floor micro-value
    ``(Σ cents·w · 10⁴) // Σ w`` — the TWAP shape of financial/telemetry
    rollups. One bucket exchange, per-user lead gaps vectorized per
    bucket."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        users = b.column("user_id")
        return pa.table({
            "user_id": users, "event_id": b.column("event_id"),
            "t": pc.divide(pc.cast(pc.cast(b.column("ts"),
                                           pa.timestamp("us")), pa.int64()),
                           1_000_000),
            "cents": pc.cast(pc.floor(pc.multiply(b.column("value"), 100)),
                             pa.int64()),
            "__b": pc.cast(pc.bit_wise_and(users, 31), pa.int32())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "weight_s": pd.Series([], dtype="int64"),
                "twap_micro": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["t"].to_numpy().astype(np.int64)
        c = g["cents"].to_numpy().astype(np.int64)
        n = len(g)
        same = np.zeros(n, dtype=bool)
        if n > 1:
            same[:-1] = u[:-1] == u[1:]
        w = np.full(n, np.int64(cap_s))
        if n > 1:
            w[:-1] = np.where(same[:-1], np.minimum(t[1:] - t[:-1], cap_s),
                              cap_s)
        df = pd.DataFrame({"user_id": u, "w": w, "cw": c * w})
        out = df.groupby("user_id", sort=False).agg(
            weight_s=("w", "sum"), cw=("cw", "sum")).reset_index()
        out["twap_micro"] = (out["cw"] * 10_000) // out["weight_s"]
        out["weight_s"] = out["weight_s"].astype(np.int64)
        out["twap_micro"] = out["twap_micro"].astype(np.int64)
        return out[["user_id", "weight_s", "twap_micro"]]

    df = (ev.map_batches(partial, batch_format="pyarrow")
          .groupby("__b").map_groups(per_bucket, batch_format="pandas")
          ).to_pandas()
    return df.sort_values("user_id", kind="mergesort").reset_index(drop=True)


TWAP_USERS_SQL = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS t,
                  CAST(floor(value*100) AS BIGINT) AS cents
           FROM events),
w AS (SELECT user_id, cents,
             least(coalesce(lead(t) OVER (PARTITION BY user_id
                                          ORDER BY t, event_id) - t,
                            3600), 3600) AS w
      FROM e)
SELECT user_id, CAST(sum(w) AS BIGINT) AS weight_s,
       CAST((sum(cents * w) * 10000) // sum(w) AS BIGINT) AS twap_micro
FROM w GROUP BY 1 ORDER BY 1
"""


def longest_type_run_users(sf_dir: str):
    """Per user: the longest run of CONSECUTIVE same-type events in
    (ts, event_id) order, with the type that achieved it (ties → the
    lexicographically first type) — run-length analysis over the
    behavioral log. One bucket exchange; runs segment via shift
    comparison + cumsum per bucket."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        users = b.column("user_id")
        return pa.table({
            "user_id": users, "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
            "t": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                         pa.int64()),
            "__b": pc.cast(pc.bit_wise_and(users, 31), pa.int32())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "run_type": pd.Series([], dtype=object),
                "run_len": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        ty = g["event_type"].to_numpy()
        n = len(g)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = (u[1:] != u[:-1]) | (ty[1:] != ty[:-1])
        rid = np.cumsum(new)
        runs = (pd.DataFrame({"user_id": u, "event_type": ty, "rid": rid})
                .groupby("rid", sort=False)
                .agg(user_id=("user_id", "first"),
                     event_type=("event_type", "first"),
                     run_len=("rid", "size")).reset_index(drop=True))
        runs = runs.sort_values(["user_id", "run_len", "event_type"],
                                ascending=[True, False, True],
                                kind="mergesort")
        best = runs.drop_duplicates("user_id")
        return pd.DataFrame({"user_id": best["user_id"].to_numpy(),
                             "run_type": best["event_type"].to_numpy(),
                             "run_len": best["run_len"].to_numpy()
                             .astype(np.int64)})

    df = (ev.map_batches(partial, batch_format="pyarrow")
          .groupby("__b").map_groups(per_bucket, batch_format="pandas")
          ).to_pandas()
    return df.sort_values("user_id", kind="mergesort").reset_index(drop=True)


LONGEST_TYPE_RUN_SQL = """
WITH o AS (SELECT user_id, event_type, ts, event_id,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rt
           FROM events),
runs AS (SELECT user_id, event_type,
                CAST(count(*) AS BIGINT) AS run_len
         FROM o GROUP BY user_id, event_type, rn - rt),
best AS (SELECT user_id, max(run_len) AS run_len FROM runs GROUP BY 1)
SELECT b.user_id, min(r.event_type) AS run_type,
       CAST(b.run_len AS BIGINT) AS run_len
FROM best b JOIN runs r ON r.user_id = b.user_id
                       AND r.run_len = b.run_len
GROUP BY 1, 3 ORDER BY 1
"""


def conditional_entropy_transitions(sf_dir: str):
    """One row: the conditional entropy H(next_type | current_type) of the
    user-timeline transition matrix, in micronats — how predictable the
    next event is. Integer-ln per transition cell: ``lp = floor(ln(n_ij /
    n_i·)·10⁶)`` where the argument is ONE IEEE division of exact ints;
    the weighted sum folds in exact integers and divides by N once.
    Transition pairs come from the same per-bucket shift pass as
    event_transitions (≤ |types|² partial rows per bucket)."""
    import math

    pairs = event_transitions(sf_dir)
    if hasattr(pairs, "to_pandas"):
        pairs = pairs.to_pandas()
    pairs = pairs.groupby(["prev_type", "event_type"],
                          as_index=False)["n"].sum()
    big_n = int(pairs["n"].sum())
    row_n = pairs.groupby("prev_type")["n"].sum().to_dict()
    acc = 0
    for _, r in pairs.iterrows():
        nij = int(r["n"])
        lp = math.floor(math.log(float(nij) /
                                 float(row_n[r["prev_type"]])) * 1_000_000)
        acc += nij * lp
    h = -float(acc) / float(big_n)
    return pd.DataFrame({
        "n_transitions": pd.Series([big_n], dtype=np.int64),
        "cond_entropy_micronats": [h]})


COND_ENTROPY_SQL = """
WITH o AS (SELECT user_id, event_type, ts, event_id,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS nxt
           FROM events),
cells AS (SELECT event_type AS prev_type, nxt,
                 CAST(count(*) AS BIGINT) AS n
          FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
rows_ AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS rn
          FROM cells GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM cells),
lp AS (SELECT c.n,
              CAST(floor(ln(CAST(c.n AS DOUBLE) / CAST(r.rn AS DOUBLE))
                         * 1000000) AS BIGINT) AS lp
       FROM cells c JOIN rows_ r ON r.prev_type = c.prev_type)
SELECT t.big_n AS n_transitions,
       -CAST(sum(CAST(lp.n AS HUGEINT) * lp.lp) AS DOUBLE)
         / CAST(t.big_n AS DOUBLE) AS cond_entropy_micronats
FROM lp, t GROUP BY t.big_n
"""


def gini_customers(sf_dir: str):
    """One row: the Gini coefficient of revenue concentration across
    customers — ``G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n`` over revenues sorted
    ascending (ties ranked by custkey, deterministic in both engines).
    Per-customer revenue folds from per-batch partials in one bucket
    exchange; the rank-weighted sum needs the GLOBAL sorted order, so the
    (custkey, cents) list — bounded by the customer dimension, gate
    documented — gathers once and the driver computes A = Σ i·xᵢ in
    Python ints. The two final divisions are spelled identically in SQL."""
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"c": b.column("o_custkey"),
                      "v": pc.cast(pc.round(pc.multiply(
                          b.column("o_totalprice"), 100)), pa.int64())})
        g = t.group_by("c").aggregate([("v", "sum")])
        return pa.table({"custkey": g.column("c"),
                         "cents": g.column("v_sum")})

    df = (orders.map_batches(partial, batch_format="pyarrow").to_pandas()
          .groupby("custkey", as_index=False)["cents"].sum())
    if len(df) > 50_000_000:
        raise ValueError("gini_customers driver gather gate: "
                         f"{len(df)} customers; pre-bucket the rank fold")
    df = df.sort_values(["cents", "custkey"], kind="mergesort")
    x = [int(v) for v in df["cents"]]
    n = len(x)
    s = sum(x)
    a = sum((i + 1) * xi for i, xi in enumerate(x))
    gini = (float(2 * a) / float(n * s)) - (float(n + 1) / float(n))
    return pd.DataFrame({
        "n_customers": pd.Series([n], dtype=np.int64),
        "total_cents": pd.Series([s], dtype=np.int64),
        "gini": [gini]})


GINI_CUSTOMERS_SQL = """
WITH r AS (SELECT o_custkey,
                  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM orders GROUP BY 1),
o AS (SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS rn
      FROM r),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS s,
             CAST(sum(CAST(rn AS HUGEINT) * cents) AS HUGEINT) AS a
      FROM o)
SELECT CAST(n AS BIGINT) AS n_customers, CAST(s AS BIGINT) AS total_cents,
       CAST(2 * a AS DOUBLE) / CAST(n * s AS DOUBLE)
         - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
FROM m
"""


def longest_doc_per_cell(sf_dir: str):
    """Per (lang, source) cell: the single longest document (argmax by
    n_chars, ties → lowest doc_id) — grouped-argmax, the same associative
    sort+first fold as the Q2 min-cost supplier but on a composite group.
    Cells are bounded by |langs| × |sources| so partials fold
    driver-side."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang", "source", "n_chars"])

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "lang": b.column("lang").to_pandas(),
            "source": b.column("source").to_pandas(),
            "doc_id": b.column("doc_id").to_numpy(zero_copy_only=False),
            "n_chars": b.column("n_chars").to_numpy(zero_copy_only=False)})
        df = df.sort_values(["lang", "source", "n_chars", "doc_id"],
                            ascending=[True, True, False, True],
                            kind="mergesort")
        return df.drop_duplicates(["lang", "source"])

    df = (docs.map_batches(partial, batch_format="pyarrow").to_pandas()
          .sort_values(["lang", "source", "n_chars", "doc_id"],
                       ascending=[True, True, False, True],
                       kind="mergesort")
          .drop_duplicates(["lang", "source"]))
    df["doc_id"] = df["doc_id"].astype(np.int64)
    df["n_chars"] = df["n_chars"].astype(np.int64)
    return (df[["lang", "source", "doc_id", "n_chars"]]
            .sort_values(["lang", "source"], kind="mergesort")
            .reset_index(drop=True))


LONGEST_DOC_SQL = """
WITH m AS (SELECT lang, source, max(n_chars) AS n_chars
           FROM documents GROUP BY 1, 2)
SELECT d.lang, d.source, CAST(min(d.doc_id) AS BIGINT) AS doc_id,
       CAST(m.n_chars AS BIGINT) AS n_chars
FROM documents d JOIN m ON m.lang = d.lang AND m.source = d.source
                       AND d.n_chars = m.n_chars
GROUP BY 1, 2, 4 ORDER BY d.lang, d.source
"""


# ---- Pareto coverage: smallest top-k customer set reaching 80 % revenue -----


def pareto_customers(sf_dir: str):
    """One row: how many top customers (by revenue, ties → lower custkey)
    cover ≥ 80 % of total revenue — the 80/20 concentration diagnostic
    beside :func:`gini_customers`. Per-customer cents fold from per-batch
    partials (customer-bounded driver fold, gate documented); the
    threshold test is the exact cross-multiplication ``5·cum ≥ 4·total``
    so no float exists on the boundary."""
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"c": b.column("o_custkey"),
                      "v": pc.cast(pc.round(pc.multiply(
                          b.column("o_totalprice"), 100)), pa.int64())})
        g = t.group_by("c").aggregate([("v", "sum")])
        return pa.table({"c": g.column("c"), "v": g.column("v_sum")})

    df = (orders.map_batches(partial, batch_format="pyarrow").to_pandas()
          .groupby("c", as_index=False)["v"].sum())
    if len(df) > 50_000_000:
        raise ValueError("pareto_customers driver fold gate: "
                         f"{len(df)} customers; pre-bucket the rank fold")
    df = df.sort_values(["v", "c"], ascending=[False, True],
                        kind="mergesort")
    x = [int(v) for v in df["v"]]
    total = sum(x)
    cum = 0
    n_top = 0
    covered = 0
    for xi in x:
        cum += xi
        n_top += 1
        if 5 * cum >= 4 * total:
            covered = cum
            break
    return pd.DataFrame({
        "n_top_customers": pd.Series([n_top], dtype=np.int64),
        "n_customers": pd.Series([len(x)], dtype=np.int64),
        "covered_cents": pd.Series([covered], dtype=np.int64),
        "total_cents": pd.Series([total], dtype=np.int64)})


PARETO_CUSTOMERS_SQL = """
WITH r AS (SELECT o_custkey,
                  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM orders GROUP BY 1),
o AS (SELECT cents,
             sum(CAST(cents AS HUGEINT)) OVER (
               ORDER BY cents DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM r),
t AS (SELECT CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS total,
             CAST(count(*) AS BIGINT) AS n FROM r)
SELECT CAST((SELECT count(*) FROM o
             WHERE 5*cum < 4*(SELECT total FROM t)) + 1 AS BIGINT)
         AS n_top_customers,
       (SELECT n FROM t) AS n_customers,
       CAST((SELECT min(cum) FROM o
             WHERE 5*cum >= 4*(SELECT total FROM t)) AS BIGINT)
         AS covered_cents,
       CAST((SELECT total FROM t) AS BIGINT) AS total_cents
"""


# ---- RFM scoring: recency / frequency / monetary quintiles ------------------


def rfm_users_events(sf_dir: str):
    """Per user: recency (days since last event, vs the global max day),
    frequency (event count), monetary (value cents) plus 1-5 quintile
    scores. The per-user fold is user-bounded (driver fold, gate
    documented). Scores use DISCRETE quintile edges (``quantile_disc``
    rank ``ceil(q·n)−1``) and the all-integer rule ``1 + Σ [v > edge]`` —
    no ntile() row-order dependence, so both engines agree exactly."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.divide(_epoch_us(b.column("ts")), _US_PER_DAY)
        t = pa.table({"u": b.column("user_id"), "d": day,
                      "v": pc.cast(pc.round(pc.multiply(
                          b.column("value"), 100)), pa.int64())})
        # frequency counts ROWS (SQL count(*)), so count the never-null
        # day column, not value
        g = t.group_by("u").aggregate([("d", "max"), ("v", "sum"),
                                       ("d", "count")])
        return pa.table({"u": g.column("u"), "last": g.column("d_max"),
                         "m": g.column("v_sum"),
                         "f": pc.cast(g.column("d_count"), pa.int64())})

    df = (ev.map_batches(partial, batch_format="pyarrow").to_pandas()
          .groupby("u", as_index=False)
          .agg(last=("last", "max"), m=("m", "sum"), f=("f", "sum")))
    if len(df) > 50_000_000:
        raise ValueError("rfm_users_events driver fold gate: "
                         f"{len(df)} users; pre-bucket the fold")
    gmax = int(df["last"].max())
    df["r_days"] = gmax - df["last"].to_numpy(np.int64)

    def disc_edges(vals: np.ndarray) -> list[int]:
        s = np.sort(vals)
        n = len(s)
        return [int(s[max(int(np.ceil(q * n)) - 1, 0)])
                for q in (0.2, 0.4, 0.6, 0.8)]

    def score(vals: np.ndarray, edges: list[int]) -> np.ndarray:
        sc = np.ones(len(vals), dtype=np.int64)
        for e in edges:
            sc += (vals > e)
        return sc

    r = df["r_days"].to_numpy(np.int64)
    f = df["f"].to_numpy(np.int64)
    m = df["m"].to_numpy(np.int64)
    out = pd.DataFrame({
        "user_id": df["u"].to_numpy(np.int64),
        "r_days": r, "frequency": f, "monetary_cents": m,
        "r_score": score(r, disc_edges(r)),
        "f_score": score(f, disc_edges(f)),
        "m_score": score(m, disc_edges(m))})
    return out.sort_values("user_id", kind="mergesort").reset_index(
        drop=True)


RFM_SQL = """
WITH u AS (
  SELECT user_id,
         max(epoch_us(ts) // 86400000000) AS last_day,
         CAST(count(*) AS BIGINT) AS f,
         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS m
  FROM events GROUP BY 1),
r AS (SELECT user_id, (SELECT max(last_day) FROM u) - last_day AS r_days,
             f, m FROM u),
e AS (SELECT quantile_disc(r_days, 0.2) AS r1, quantile_disc(r_days, 0.4)
         AS r2, quantile_disc(r_days, 0.6) AS r3,
         quantile_disc(r_days, 0.8) AS r4,
         quantile_disc(f, 0.2) AS f1, quantile_disc(f, 0.4) AS f2,
         quantile_disc(f, 0.6) AS f3, quantile_disc(f, 0.8) AS f4,
         quantile_disc(m, 0.2) AS m1, quantile_disc(m, 0.4) AS m2,
         quantile_disc(m, 0.6) AS m3, quantile_disc(m, 0.8) AS m4
      FROM r)
SELECT user_id, CAST(r_days AS BIGINT) AS r_days, f AS frequency,
       m AS monetary_cents,
       CAST(1 + CASE WHEN r_days > e.r1 THEN 1 ELSE 0 END
              + CASE WHEN r_days > e.r2 THEN 1 ELSE 0 END
              + CASE WHEN r_days > e.r3 THEN 1 ELSE 0 END
              + CASE WHEN r_days > e.r4 THEN 1 ELSE 0 END AS BIGINT)
         AS r_score,
       CAST(1 + CASE WHEN f > e.f1 THEN 1 ELSE 0 END
              + CASE WHEN f > e.f2 THEN 1 ELSE 0 END
              + CASE WHEN f > e.f3 THEN 1 ELSE 0 END
              + CASE WHEN f > e.f4 THEN 1 ELSE 0 END AS BIGINT) AS f_score,
       CAST(1 + CASE WHEN m > e.m1 THEN 1 ELSE 0 END
              + CASE WHEN m > e.m2 THEN 1 ELSE 0 END
              + CASE WHEN m > e.m3 THEN 1 ELSE 0 END
              + CASE WHEN m > e.m4 THEN 1 ELSE 0 END AS BIGINT) AS m_score
FROM r, e ORDER BY user_id
"""


# ---- weekly churn: active in week w, absent in week w+1 ---------------------


def weekly_churn_users(sf_dir: str):
    """Per epoch-week: active users and how many of them CHURN (no event
    in week w+1 — the trailing week churns by definition, same as the
    SQL's left join). Distinct (user, week) partials ride one user-hash
    bucket exchange; each bucket holds every week of its users, so the
    churn flag is a per-user sorted-diff; per-week partial counts fold
    driver-side (calendar-bounded)."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts"])
    us_per_week = 604_800_000_000

    def partial(b: pa.Table) -> pa.Table:
        week = pc.divide(_epoch_us(b.column("ts")), us_per_week)
        t = pa.table({"user_id": b.column("user_id"), "week": week})
        g = t.group_by(["user_id", "week"]).aggregate([])
        return g.append_column(
            "__b", pc.cast(pc.bit_wise_and(g.column("user_id"), 31),
                           pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["user_id", "week"]].drop_duplicates()
        d = d.sort_values(["user_id", "week"], kind="mergesort")
        u = d["user_id"].to_numpy()
        w = d["week"].to_numpy()
        nxt_same = np.zeros(len(d), dtype=bool)
        if len(d) > 1:
            nxt_same[:-1] = (u[:-1] == u[1:]) & (w[:-1] + 1 == w[1:])
        out = pd.DataFrame({"week": w, "churn": (~nxt_same).astype(
            np.int64)})
        agg = out.groupby("week", as_index=False).agg(
            n_active=("churn", "size"), n_churned=("churn", "sum"))
        return agg

    parts = (ev.map_batches(partial, batch_format="pyarrow")
             .groupby("__b").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    out = parts.groupby("week", as_index=False)[
        ["n_active", "n_churned"]].sum()
    out["week"] = out["week"].astype(np.int64)
    out["n_active"] = out["n_active"].astype(np.int64)
    out["n_churned"] = out["n_churned"].astype(np.int64)
    return out.sort_values("week", kind="mergesort").reset_index(drop=True)


WEEKLY_CHURN_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
  FROM events)
SELECT a.week, CAST(count(*) AS BIGINT) AS n_active,
       CAST(sum(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_churned
FROM uw a LEFT JOIN uw b
  ON b.user_id = a.user_id AND b.week = a.week + 1
GROUP BY 1 ORDER BY 1
"""


# ---- monthly stickiness: avg DAU / MAU --------------------------------------


def stickiness_monthly(sf_dir: str):
    """Per calendar month: Σ-of-daily-actives, distinct active days,
    monthly actives, and stickiness = sum_dau / (n_days · mau) — ONE
    double division of exact integers. Distinct (user, day) pairs ride a
    user-hash bucket exchange (a user's whole history lands in one
    bucket, so per-month DISTINCT-user partials are exact and summable);
    the day-cardinality fold is calendar-bounded and folds driver-side."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.divide(_epoch_us(b.column("ts")), _US_PER_DAY)
        t = pa.table({"user_id": b.column("user_id"), "day": day})
        g = t.group_by(["user_id", "day"]).aggregate([])
        return g.append_column(
            "__b", pc.cast(pc.bit_wise_and(g.column("user_id"), 31),
                           pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["user_id", "day"]].drop_duplicates()
        ts = pd.to_datetime(d["day"].to_numpy() * 86400, unit="s")
        d = d.assign(month=(ts.year * 100 + ts.month).astype(np.int64))
        dau = d.groupby("month", as_index=False).agg(
            sum_dau=("user_id", "size"))
        mau = (d[["month", "user_id"]].drop_duplicates()
               .groupby("month", as_index=False)
               .agg(mau=("user_id", "size")))
        return dau.merge(mau, on="month")

    parts = (ev.map_batches(partial, batch_format="pyarrow")
             .groupby("__b").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("month", as_index=False)[["sum_dau", "mau"]].sum()

    # distinct active days per month: calendar-bounded driver fold
    def day_partial(b: pa.Table) -> pa.Table:
        day = pc.divide(_epoch_us(b.column("ts")), _US_PER_DAY)
        return pa.table({"day": pc.unique(day)})

    days = (ev.map_batches(day_partial, batch_format="pyarrow")
            .to_pandas()["day"].drop_duplicates())
    ts = pd.to_datetime(days.to_numpy() * 86400, unit="s")
    nd = (pd.DataFrame({"month": (ts.year * 100 + ts.month).astype(
        np.int64)}).groupby("month", as_index=False)
        .agg(n_days=("month", "size")))
    out = agg.merge(nd, on="month")
    out["month"] = out["month"].astype(np.int64)
    out["sum_dau"] = out["sum_dau"].astype(np.int64)
    out["mau"] = out["mau"].astype(np.int64)
    out["n_days"] = out["n_days"].astype(np.int64)
    out["stickiness"] = (out["sum_dau"].map(float)
                         / (out["n_days"] * out["mau"]).map(float))
    return out.sort_values("month", kind="mergesort").reset_index(drop=True)


STICKINESS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events),
m AS (SELECT user_id, day,
             CAST(year(to_timestamp(day * 86400)) * 100
                  + month(to_timestamp(day * 86400)) AS BIGINT) AS month
      FROM ud)
SELECT month, CAST(count(*) AS BIGINT) AS sum_dau,
       CAST(count(DISTINCT user_id) AS BIGINT) AS mau,
       CAST(count(DISTINCT day) AS BIGINT) AS n_days,
       CAST(count(*) AS DOUBLE)
         / CAST(count(DISTINCT day) * count(DISTINCT user_id) AS DOUBLE)
         AS stickiness
FROM m GROUP BY 1 ORDER BY 1
"""


# ---- session statistics off the fused sessionizer ---------------------------


def session_stats_events(sf_dir: str, gap_s: int = 1800):
    """One row of corpus-level session stats: session count, events per
    session and mean session duration (µs), for gap-based sessions
    (> ``gap_s`` silence starts a new one). One user-hash bucket exchange;
    each bucket sorts its users' timelines once, labels sessions with the
    gap-break cumsum, and emits a 3-int partial. The two means are single
    double divisions of exact integers. Duplicate timestamps can't flip
    session breaks (diff 0 is never > gap in either engine)."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts"])
    gap_us = gap_s * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"user_id": b.column("user_id"),
                      "t": _epoch_us(b.column("ts"))})
        return t.append_column(
            "__b", pc.cast(pc.bit_wise_and(t.column("user_id"), 31),
                           pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "t"], kind="mergesort")
        u = d["user_id"].to_numpy()
        t = d["t"].to_numpy()
        brk = np.ones(len(d), dtype=np.int64)
        if len(d) > 1:
            brk[1:] = ((u[1:] != u[:-1])
                       | (t[1:] - t[:-1] > gap_us)).astype(np.int64)
        sid = np.cumsum(brk)
        seg = pd.DataFrame({"sid": sid, "t": t}).groupby(
            "sid", sort=False)["t"].agg(["size", "min", "max"])
        return pd.DataFrame({
            "n_sessions": [np.int64(len(seg))],
            "n_events": [np.int64(seg["size"].sum())],
            "dur_us": [np.int64((seg["max"] - seg["min"]).sum())]})

    parts = (ev.map_batches(partial, batch_format="pyarrow")
             .groupby("__b").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    ns = int(parts["n_sessions"].sum())
    ne = int(parts["n_events"].sum())
    dur = int(parts["dur_us"].sum())
    return pd.DataFrame({
        "n_sessions": pd.Series([ns], dtype=np.int64),
        "n_events": pd.Series([ne], dtype=np.int64),
        "total_duration_us": pd.Series([dur], dtype=np.int64),
        "mean_events": [float(ne) / float(ns)],
        "mean_duration_us": [float(dur) / float(ns)]})


SESSION_STATS_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
l AS (SELECT user_id, t,
             CASE WHEN lag(t) OVER w IS NULL
                    OR t - lag(t) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
s AS (SELECT user_id, t,
             sum(brk) OVER (PARTITION BY user_id ORDER BY t
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM l),
g AS (SELECT user_id, sid, count(*) AS n, max(t) - min(t) AS dur
      FROM s GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(sum(dur) AS BIGINT) AS total_duration_us,
       CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_events,
       CAST(sum(dur) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS mean_duration_us
FROM g
"""


# ---- second-purchase conversion ----------------------------------------------


def second_purchase_events(sf_dir: str):
    """One row: how many users purchase at least once / at least twice,
    the repeat rate in exact ppm, and the DISCRETE median days between
    first and second purchase. Each batch pre-truncates to its LOCAL
    first-2 purchases per user (the global first-2 is a subset of the
    union); one user-hash bucket exchange re-sorts and keeps the true
    first two; the tiny (user, gap) set folds driver-side (user-bounded,
    gate documented). Order is (t, event_id) in both engines, so ties are
    deterministic."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "purchase"))
        df = pa.table({"user_id": b.column("user_id"),
                       "t": _epoch_us(b.column("ts")),
                       "event_id": b.column("event_id")}).to_pandas()
        df = df.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        df = df[df.groupby("user_id", sort=False).cumcount() < 2]
        df["__b"] = (df["user_id"].to_numpy() % 32).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        d = d[d.groupby("user_id", sort=False).cumcount() < 2]
        cnt = d.groupby("user_id", sort=False)["t"].agg(["size", "min",
                                                         "max"])
        return pd.DataFrame({
            "user_id": cnt.index.to_numpy().astype(np.int64),
            "n_purch": cnt["size"].to_numpy().astype(np.int64),
            "gap_us": (cnt["max"] - cnt["min"]).to_numpy().astype(
                np.int64)})

    parts = (ev.map_batches(partial, batch_format="pyarrow")
             .groupby("__b").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    if len(parts) > 50_000_000:
        raise ValueError("second_purchase_events driver fold gate: "
                         f"{len(parts)} users; pre-bucket the fold")
    buyers = len(parts)
    repeat = parts[parts["n_purch"] >= 2]
    n_rep = len(repeat)
    ppm = (n_rep * 1_000_000) // buyers if buyers else 0
    if n_rep:
        days = np.sort(repeat["gap_us"].to_numpy(np.int64) // _US_PER_DAY)
        med = int(days[max(int(np.ceil(0.5 * n_rep)) - 1, 0)])
    else:
        med = 0
    return pd.DataFrame({
        "n_buyers": pd.Series([buyers], dtype=np.int64),
        "n_repeat": pd.Series([n_rep], dtype=np.int64),
        "repeat_ppm": pd.Series([ppm], dtype=np.int64),
        "median_gap_days": pd.Series([med], dtype=np.int64)})


SECOND_PURCHASE_SQL = """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS t, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events WHERE event_type = 'purchase'),
u AS (SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_purch,
             max(CASE WHEN rn = 2 THEN t END)
               - max(CASE WHEN rn = 1 THEN t END) AS gap_us
      FROM p WHERE rn <= 2 GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_buyers,
       CAST(sum(CASE WHEN n_purch >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       CAST(sum(CASE WHEN n_purch >= 2 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS repeat_ppm,
       CAST(coalesce(quantile_disc(CASE WHEN n_purch >= 2
                                        THEN gap_us // 86400000000 END,
                                   0.5), 0) AS BIGINT) AS median_gap_days
FROM u
"""


# ---- weekday activity profile ------------------------------------------------


def weekday_profile_events(sf_dir: str):
    """Per day-of-week (0=Thursday epoch anchor, ``(epoch_day + 4) % 7``
    spelled identically in both engines — no engine-specific dayofweek
    convention): events, distinct users, value cents. Distinct-user
    partials ride the user-hash bucket exchange (a user's rows colocate,
    so per-dow distinct partials are exact and summable); counts and cents
    are plain per-batch partials on the same exchange."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.divide(_epoch_us(b.column("ts")), _US_PER_DAY)
        dow = pc.subtract(pc.add(day, 4),
                          pc.multiply(pc.divide(pc.add(day, 4), 7), 7))
        t = pa.table({"dow": dow, "user_id": b.column("user_id"),
                      "v": pc.cast(pc.round(pc.multiply(
                          b.column("value"), 100)), pa.int64()),
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        # n counts ROWS (SQL count(*)) — sum an explicit ones column, not
        # a count of the nullable value column
        g = t.group_by(["dow", "user_id"]).aggregate([("v", "sum"),
                                                      ("one", "sum")])
        out = pa.table({"dow": g.column("dow"),
                        "user_id": g.column("user_id"),
                        "cents": g.column("v_sum"),
                        "n": g.column("one_sum")})
        return out.append_column(
            "__b", pc.cast(pc.bit_wise_and(out.column("user_id"), 31),
                           pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["dow", "user_id"], sort=False, as_index=False)[
            ["cents", "n"]].sum()
        out = agg.groupby("dow", as_index=False).agg(
            n_events=("n", "sum"), n_users=("user_id", "size"),
            cents=("cents", "sum"))
        return out

    parts = (ev.map_batches(partial, batch_format="pyarrow")
             .groupby("__b").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    out = parts.groupby("dow", as_index=False)[
        ["n_events", "n_users", "cents"]].sum()
    for c in ("dow", "n_events", "n_users", "cents"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("dow", kind="mergesort").reset_index(drop=True)


WEEKDAY_PROFILE_SQL = """
SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY 1 ORDER BY 1
"""


# ---- windowed dedup: first event per (user, type, hour) ----------------------


def windowed_dedup_events(sf_dir: str):
    """Full output: the FIRST event per (user, event_type, hour) —
    windowed deduplication, the at-most-one-per-key-per-window shape of
    log compaction (the keep-latest sibling lives in stages/compaction).
    One user-hash bucket exchange; each bucket sorts once and keeps the
    head row per composite key. Ties break (t, event_id) in both
    engines."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id", "event_type"])
    us_per_hour = 3_600_000_000

    def partial(b: pa.Table) -> pa.Table:
        t = _epoch_us(b.column("ts"))
        tab = pa.table({"user_id": b.column("user_id"),
                        "event_type": b.column("event_type"),
                        "hour": pc.divide(t, us_per_hour),
                        "t": t, "event_id": b.column("event_id")})
        df = tab.to_pandas()
        df = df.sort_values(["user_id", "event_type", "hour", "t",
                             "event_id"], kind="mergesort")
        df = df.drop_duplicates(["user_id", "event_type", "hour"])
        df["__b"] = (df["user_id"].to_numpy() % 32).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "event_type", "hour", "t",
                           "event_id"], kind="mergesort")
        d = d.drop_duplicates(["user_id", "event_type", "hour"])
        return pd.DataFrame({
            "event_id": d["event_id"].to_numpy().astype(np.int64),
            "user_id": d["user_id"].to_numpy().astype(np.int64),
            "event_type": d["event_type"].to_numpy(),
            "hour": d["hour"].to_numpy().astype(np.int64)})

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("__b").map_groups(per_bucket, batch_format="pandas"))


WINDOWED_DEDUP_SQL = """
WITH r AS (
  SELECT event_id, user_id, event_type,
         epoch_us(ts) // 3600000000 AS hour,
         row_number() OVER (PARTITION BY user_id, event_type,
                                         epoch_us(ts) // 3600000000
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events)
SELECT event_id, user_id, event_type, hour
FROM r WHERE rn = 1
"""


# ---- Markov next-event predictor accuracy -------------------------------------


def markov_accuracy_events(sf_dir: str):
    """(prev_type, predicted_next, n_transitions, n_correct, accuracy_ppm)
    — train the global transition-matrix predictor (per current type, the
    most frequent next type, ties → lexicographically first) and score it
    on the SAME transitions, all from the one pair-count fold of
    :func:`event_transitions` — no second pass over the log. Counts are
    exact integers; the ppm is floor division."""
    cnt = event_transitions(sf_dir)  # prev_type, event_type, n (driver df)
    cnt = cnt.sort_values(["prev_type", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
    pred = cnt.drop_duplicates("prev_type")[["prev_type", "event_type"]] \
        .rename(columns={"event_type": "predicted_next"})
    tot = cnt.groupby("prev_type", as_index=False)["n"].sum() \
        .rename(columns={"n": "n_transitions"})
    hit = cnt.merge(pred, left_on=["prev_type", "event_type"],
                    right_on=["prev_type", "predicted_next"])[
        ["prev_type", "n"]].rename(columns={"n": "n_correct"})
    out = pred.merge(tot, on="prev_type").merge(hit, on="prev_type")
    out["n_transitions"] = out["n_transitions"].astype(np.int64)
    out["n_correct"] = out["n_correct"].astype(np.int64)
    out["accuracy_ppm"] = (out["n_correct"] * 1_000_000) \
        // out["n_transitions"]
    return out.sort_values("prev_type", kind="mergesort").reset_index(
        drop=True)


MARKOV_ACCURACY_SQL = """
WITH g AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
c AS (SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
      FROM g WHERE prev_type IS NOT NULL GROUP BY 1, 2),
p AS (SELECT prev_type, event_type AS predicted_next,
             row_number() OVER (PARTITION BY prev_type
                                ORDER BY n DESC, event_type) AS rn
      FROM c),
t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_transitions
      FROM c GROUP BY 1)
SELECT p.prev_type, p.predicted_next, t.n_transitions,
       c.n AS n_correct,
       CAST(c.n * 1000000 // t.n_transitions AS BIGINT) AS accuracy_ppm
FROM p
JOIN t ON t.prev_type = p.prev_type
JOIN c ON c.prev_type = p.prev_type AND c.event_type = p.predicted_next
WHERE p.rn = 1 ORDER BY p.prev_type
"""


# ---- lines-per-order distribution ---------------------------------------------


def lines_per_order_hist(sf_dir: str):
    """(n_lines, n_orders) — how many orders have k lineitems, the fact
    fan-out profile (order_count_distribution's sibling one level down).
    Per-batch (orderkey → n) partials ride one order-hash bucket exchange;
    each bucket histograms its orders' exact totals; the tiny
    (distinct-count)-bounded histogram folds driver-side."""
    li = read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"k": b.column("l_orderkey"),
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by("k").aggregate([("one", "sum")])
        return pa.table({"k": g.column("k"), "n": g.column("one_sum"),
                         "__b": pc.cast(pc.bit_wise_and(g.column("k"), 31),
                                        pa.int32())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("k", sort=False)["n"].sum()
        h = tot.value_counts()
        return pd.DataFrame({"n_lines": h.index.to_numpy().astype(np.int64),
                             "n_orders": h.to_numpy().astype(np.int64)})

    parts = (li.map_batches(partial, batch_format="pyarrow")
             .groupby("__b").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    out = parts.groupby("n_lines", as_index=False)["n_orders"].sum()
    out["n_lines"] = out["n_lines"].astype(np.int64)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values("n_lines", kind="mergesort").reset_index(
        drop=True)


LINES_PER_ORDER_SQL = """
WITH c AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
           FROM lineitem GROUP BY 1)
SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
FROM c GROUP BY 1 ORDER BY 1
"""


# ---- revenue seasonality index -------------------------------------------------


def seasonality_orders(sf_dir: str):
    """(o_year, o_month, cents, share_ppm) — each month's exact share of
    its year's revenue in floor-ppm, the seasonality index. Per-batch
    (year, month) integer partials (calendar-bounded) fold driver-side;
    the share is integer floor division so no boundary float exists."""
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate")
        t = pa.table({"y": pc.cast(pc.year(d), pa.int64()),
                      "m": pc.cast(pc.month(d), pa.int64()),
                      "v": pc.cast(pc.round(pc.multiply(
                          b.column("o_totalprice"), 100)), pa.int64())})
        g = t.group_by(["y", "m"]).aggregate([("v", "sum")])
        return pa.table({"y": g.column("y"), "m": g.column("m"),
                         "cents": g.column("v_sum")})

    df = (orders.map_batches(partial, batch_format="pyarrow").to_pandas()
          .groupby(["y", "m"], as_index=False)["cents"].sum())
    yr = df.groupby("y")["cents"].transform("sum")
    df["share_ppm"] = (df["cents"] * 1_000_000) // yr
    out = df.rename(columns={"y": "o_year", "m": "o_month"})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["o_year", "o_month"],
                           kind="mergesort").reset_index(drop=True)


SEASONALITY_SQL = """
WITH m AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(month(o_orderdate) AS BIGINT) AS o_month,
         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2)
SELECT o_year, o_month, cents,
       CAST(cents * 1000000
            // sum(cents) OVER (PARTITION BY o_year) AS BIGINT)
         AS share_ppm
FROM m ORDER BY 1, 2
"""


# ---- heterogeneous-fact activity calendar --------------------------------------


def combined_activity_daily(sf_dir: str):
    """(day, n_events, n_orders) — the two heterogeneous fact tables
    folded onto one epoch-day calendar via a TAGGED-UNION scan: each side
    pre-reduces to (day, kind, n) partials, the union streams into one
    driver fold bounded by the calendar, and absent days on either side
    read as 0 via the dense merge (both engines spell the day as
    ``epoch_us // 86400000000``)."""
    ev = read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderdate"])

    def ev_partial(b: pa.Table) -> pa.Table:
        day = pc.divide(_epoch_us(b.column("ts")), _US_PER_DAY)
        t = pa.table({"day": day,
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by("day").aggregate([("one", "sum")])
        return pa.table({"day": g.column("day"), "n": g.column("one_sum"),
                         "kind": pa.array(
                             np.zeros(g.num_rows, np.int8))})

    def o_partial(b: pa.Table) -> pa.Table:
        day = pc.divide(_epoch_us(pc.cast(b.column("o_orderdate"),
                                          pa.timestamp("us"))), _US_PER_DAY)
        t = pa.table({"day": day,
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by("day").aggregate([("one", "sum")])
        return pa.table({"day": g.column("day"), "n": g.column("one_sum"),
                         "kind": pa.array(np.ones(g.num_rows, np.int8))})

    union = ev.map_batches(ev_partial, batch_format="pyarrow").union(
        orders.map_batches(o_partial, batch_format="pyarrow"))
    df = union.to_pandas()
    ev_n = df[df["kind"] == 0].groupby("day")["n"].sum()
    o_n = df[df["kind"] == 1].groupby("day")["n"].sum()
    days = sorted(set(ev_n.index) | set(o_n.index))
    return pd.DataFrame({
        "day": np.array(days, np.int64),
        "n_events": np.array([int(ev_n.get(d, 0)) for d in days],
                             np.int64),
        "n_orders": np.array([int(o_n.get(d, 0)) for d in days],
                             np.int64)})


COMBINED_ACTIVITY_SQL = """
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
o AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1),
d AS (SELECT day FROM e UNION SELECT day FROM o)
SELECT d.day, coalesce(e.n, 0) AS n_events, coalesce(o.n, 0) AS n_orders
FROM d LEFT JOIN e USING (day) LEFT JOIN o USING (day)
ORDER BY d.day
"""


# ---- windowed conversion funnel --------------------------------------------------


def windowed_conversion_events(sf_dir: str, window_days: int = 7):
    """One row: signup→purchase conversion WITHIN a time window — n_signups
    (users who ever sign up), n_converted (first purchase AFTER the first
    signup and within ``window_days``), floor-ppm rate, and the DISCRETE
    median conversion lag in hours. Each batch pre-reduces to per-user
    (first signup µs, candidate purchase µs) partials; the user-hash
    bucket fold computes the true firsts (min is associative; the
    qualifying purchase is the min purchase ≥ the FINAL signup time, so
    the fold keeps per-user purchase lists pre-truncated to the batch min
    AFTER each batch's own signup — conservative: it keeps the batch min
    purchase unconditionally, which is always ≤ any qualifying one, and
    re-checks the ≥ signup constraint at the fold over ALL kept
    candidates). Everything integer until the single ppm division."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_type"])
    win_us = window_days * 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"user_id": b.column("user_id"),
                      "t": _epoch_us(b.column("ts")),
                      "event_type": b.column("event_type")}).to_pandas()
        s = t[t["event_type"] == "signup"].groupby(
            "user_id", as_index=False)["t"].min()
        s["kind"] = np.int8(0)
        # keep ALL purchase times per user per batch? bounded: keep the
        # batch's purchases sorted-first-8 per user — the qualifying one
        # is the first ≥ signup; signup is the GLOBAL min signup, which
        # is ≤ this batch's min signup, so any batch purchase could
        # qualify; keeping the first 8 per user per batch bounds the
        # exchange while covering every candidate unless a user has > 8
        # purchases in ONE batch all before their global signup — then
        # the batch also contains no qualifying candidate anyway only if
        # all 8 kept are < signup AND a later one ≥ signup exists: to
        # stay EXACT, keep the batch min purchase ≥ each possible signup
        # by keeping per user: all purchases (small per batch) — events
        # per user per batch are bounded by batch_size; we keep them all.
        p = t[t["event_type"] == "purchase"][["user_id", "t"]].copy()
        p["kind"] = np.int8(1)
        out = pd.concat([s, p], ignore_index=True)
        out["__b"] = (out["user_id"].to_numpy() % 32).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g[g["kind"] == 0].groupby("user_id")["t"].min()
        p = g[g["kind"] == 1]
        p = p.merge(s.rename("s0"), left_on="user_id", right_index=True)
        p = p[p["t"] >= p["s0"]]
        first_p = p.groupby("user_id")["t"].min()
        lag = (first_p - s.reindex(first_p.index)).astype(np.int64)
        lag = lag[lag <= win_us]
        return pd.DataFrame({
            "n_signups": [np.int64(len(s))],
            "n_converted": [np.int64(len(lag))],
            "lags": [lag.to_numpy(np.int64).tolist()]})

    parts = (ev.map_batches(partial, batch_format="pyarrow")
             .groupby("__b").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    n_sign = int(parts["n_signups"].sum())
    lags = np.sort(np.concatenate(
        [np.asarray(x, np.int64) for x in parts["lags"]])) \
        if len(parts) else np.array([], np.int64)
    n_conv = int(len(lags))
    ppm = (n_conv * 1_000_000) // n_sign if n_sign else 0
    med_h = int(lags[max(int(np.ceil(0.5 * n_conv)) - 1, 0)]
                // 3_600_000_000) if n_conv else 0
    return pd.DataFrame({
        "n_signups": pd.Series([n_sign], dtype=np.int64),
        "n_converted": pd.Series([n_conv], dtype=np.int64),
        "conversion_ppm": pd.Series([ppm], dtype=np.int64),
        "median_lag_hours": pd.Series([med_h], dtype=np.int64)})


WINDOWED_CONVERSION_SQL = """
WITH s AS (SELECT user_id, min(epoch_us(ts)) AS s0 FROM events
           WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS p0
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.s0
      GROUP BY 1),
l AS (SELECT p.p0 - s.s0 AS lag FROM p JOIN s ON s.user_id = p.user_id
      WHERE p.p0 - s.s0 <= 604800000000)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_signups,
       CAST(count(*) AS BIGINT) AS n_converted,
       CAST(count(*) * 1000000
            // (SELECT count(*) FROM s) AS BIGINT) AS conversion_ppm,
       CAST(coalesce(quantile_disc(lag // 3600000000, 0.5), 0) AS BIGINT)
         AS median_lag_hours
FROM l
"""


# ---- revenue-decile migration matrix ---------------------------------------------


def decile_migration_customers(sf_dir: str, y1: int = 1996, y2: int = 1997):
    """(decile_a, decile_b, n_customers) — each customer's revenue decile
    in year ``y1`` vs year ``y2`` (customers active in BOTH), the
    rank-drift / churn-risk migration matrix. Per-(customer, year) cents
    fold from per-batch partials (customer-bounded driver fold, gate
    documented); decile edges are the period's own DISCRETE quantiles
    (rank ``ceil(q·n)−1``) and assignment is the all-integer
    ``1 + Σ[v > edge]`` — no ntile order dependence, so both engines
    agree exactly on every boundary."""
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_custkey", "o_orderdate",
                                   "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(b.column("o_orderdate")), pa.int64())
        keep = pc.or_(pc.equal(yr, y1), pc.equal(yr, y2))
        b2 = pa.table({"c": b.column("o_custkey"), "y": yr,
                       "v": pc.cast(pc.round(pc.multiply(
                           b.column("o_totalprice"), 100)), pa.int64())
                       }).filter(keep)
        g = b2.group_by(["c", "y"]).aggregate([("v", "sum")])
        return pa.table({"c": g.column("c"), "y": g.column("y"),
                         "cents": g.column("v_sum")})

    df = (orders.map_batches(partial, batch_format="pyarrow").to_pandas()
          .groupby(["c", "y"], as_index=False)["cents"].sum())
    if len(df) > 50_000_000:
        raise ValueError("decile_migration driver fold gate: "
                         f"{len(df)} (customer, year) rows; bucket the fold")

    def edges(vals: np.ndarray) -> np.ndarray:
        s = np.sort(vals)
        n = len(s)
        return np.array([s[max(int(np.ceil(q / 10 * n)) - 1, 0)]
                         for q in range(1, 10)], np.int64)

    def assign(vals: np.ndarray, e: np.ndarray) -> np.ndarray:
        d = np.ones(len(vals), np.int64)
        for x in e:
            d += (vals > x)
        return d

    a = df[df["y"] == y1].set_index("c")["cents"]
    b = df[df["y"] == y2].set_index("c")["cents"]
    both = a.index.intersection(b.index)
    va = a.to_numpy(np.int64)
    vb = b.to_numpy(np.int64)
    da = pd.Series(assign(va, edges(va)), index=a.index)
    db = pd.Series(assign(vb, edges(vb)), index=b.index)
    mig = pd.DataFrame({"decile_a": da.reindex(both).to_numpy(np.int64),
                        "decile_b": db.reindex(both).to_numpy(np.int64)})
    out = mig.groupby(["decile_a", "decile_b"]).size() \
        .reset_index(name="n_customers")
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["decile_a", "decile_b"],
                           kind="mergesort").reset_index(drop=True)


DECILE_MIGRATION_SQL = """
WITH r AS (
  SELECT o_custkey AS c, CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders WHERE year(o_orderdate) IN (1996, 1997) GROUP BY 1, 2),
ea AS (SELECT quantile_disc(cents, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
         AS e FROM r WHERE y = 1996),
eb AS (SELECT quantile_disc(cents, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
         AS e FROM r WHERE y = 1997),
da AS (SELECT c, 1 + len(list_filter(ea.e, x -> r.cents > x)) AS d
       FROM r, ea WHERE y = 1996),
db AS (SELECT c, 1 + len(list_filter(eb.e, x -> r.cents > x)) AS d
       FROM r, eb WHERE y = 1997)
SELECT CAST(da.d AS BIGINT) AS decile_a, CAST(db.d AS BIGINT) AS decile_b,
       CAST(count(*) AS BIGINT) AS n_customers
FROM da JOIN db USING (c)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---- SCD-2 validity intervals from the change log -----------------------------


def type_intervals_users(sf_dir: str):
    """(user_id, event_type, valid_from_us, valid_to_us) — slowly-changing
    -dimension (type-2) interval reconstruction from the event log: per
    user, consecutive same-type events collapse to one row starting at the
    first change point, and each interval closes at the NEXT change's
    timestamp (int64-max sentinel for the open current interval — the
    repo's absent-value convention, null-free output). The warehouse
    snapshot-rebuild shape.

    Shape: ONE user-hash exchange; each bucket sorts its slice once and
    computes both the LAG change mask and the LEAD interval end in the
    same pandas pass — never a task per user. Ordering ties break on
    (ts, event_id) identically in both engines; timestamps are integer
    epoch-µs so every boundary is exact."""
    import numpy as np

    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id", "event_type"])

    def add_bucket(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
            "t": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                         pa.int64()),
            "__b": pa.array((uid % 32).astype(np.int32)),
        })

    OPEN = np.int64((1 << 63) - 1)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        typ = g["event_type"].to_numpy()
        same_user = np.r_[False, uid[1:] == uid[:-1]]
        same_type = np.r_[False, typ[1:] == typ[:-1]]
        change = ~(same_user & same_type)          # first row per user too
        ch = g[change]
        cu = ch["user_id"].to_numpy()
        ct = ch["t"].to_numpy().astype(np.int64)
        nxt = np.r_[ct[1:], OPEN]
        nxt[np.r_[cu[1:] != cu[:-1], True]] = OPEN  # last change per user
        return pd.DataFrame({
            "user_id": cu,
            "event_type": ch["event_type"].to_numpy(),
            "valid_from_us": ct,
            "valid_to_us": nxt,
        })

    return ev.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas")


TYPE_INTERVALS_SQL = """
WITH o AS (
  SELECT user_id, event_type, epoch_us(ts) AS t,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev,
         event_id
  FROM events),
ch AS (
  SELECT user_id, event_type, t, event_id FROM o
  WHERE prev IS NULL OR event_type <> prev)
SELECT user_id, event_type, t AS valid_from_us,
       coalesce(lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id),
                9223372036854775807) AS valid_to_us
FROM ch
"""


# ---- audience migration: FULL OUTER diff of two activity windows -------------


def audience_migration_events(sf_dir: str, block_gate: int = 512):
    """(status, n_users) — audience migration between the log's two
    first and last single DAYS (Jan 1 vs Jan 30 — one-day windows keep all
    three statuses populated on the synthetic log): 'new' = active only
    in the second window, 'churned' = only in the first, 'retained' =
    both — the FULL OUTER JOIN of two distinct-user sets, folded to
    counts.

    Shape: ONE fused scan; each batch reduces to distinct
    (user, in_p1, in_p2) flag partials (groupby max — the OR-fold
    combiner), folded per user via stages/folds.fold_cells (driver-side
    under the block gate, one user-hash exchange past it); the tiny
    status histogram is driver math."""
    import numpy as np

    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    D1_LO = int(pd.Timestamp("2024-01-01").value // 1000)   # epoch µs
    D1_HI = int(pd.Timestamp("2024-01-02").value // 1000)
    D2_LO = int(pd.Timestamp("2024-01-30").value // 1000)
    D2_HI = int(pd.Timestamp("2024-01-31").value // 1000)

    def partial(b: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")), pa.int64())
        f1 = pc.and_(pc.greater_equal(t, D1_LO), pc.less(t, D1_HI))
        f2 = pc.and_(pc.greater_equal(t, D2_LO), pc.less(t, D2_HI))
        keep = pc.or_(f1, f2)
        tt = pa.table({
            "user_id": b.column("user_id"),
            "f1": pc.cast(f1, pa.int8()),
            "f2": pc.cast(f2, pa.int8()),
        }).filter(keep)
        g = tt.group_by("user_id").aggregate([("f1", "max"), ("f2", "max")])
        return g.rename_columns(["user_id", "f1", "f2"])

    scan = FusedParquetScan(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])
    agg = fold_cells(scan, partial, ["user_id"], maxs=["f1", "f2"],
                     block_gate=block_gate)
    if not len(agg):
        return pd.DataFrame({"status": pd.Series([], dtype=object),
                             "n_users": pd.Series([], dtype=np.int64)})
    status = np.where(agg["f1"].to_numpy() == 0, "new",
                      np.where(agg["f2"].to_numpy() == 0, "churned",
                               "retained"))
    u, c = np.unique(status, return_counts=True)
    return pd.DataFrame({"status": u, "n_users": c.astype(np.int64)}) \
        .sort_values("status").reset_index(drop=True)


AUDIENCE_MIGRATION_SQL = """
WITH p1 AS (SELECT DISTINCT user_id FROM events
            WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-02'),
p2 AS (SELECT DISTINCT user_id FROM events
       WHERE ts >= TIMESTAMP '2024-01-30' AND ts < TIMESTAMP '2024-01-31'),
j AS (SELECT CASE WHEN p1.user_id IS NULL THEN 'new'
                  WHEN p2.user_id IS NULL THEN 'churned'
                  ELSE 'retained' END AS status
      FROM p1 FULL OUTER JOIN p2 ON p1.user_id = p2.user_id)
SELECT status, CAST(count(*) AS BIGINT) AS n_users
FROM j GROUP BY status ORDER BY status
"""


def recency_scores_users(sf_dir: str, block_gate: int = 512):
    """(user_id, n_events, score_cents) — recency-weighted activity score
    per user: each event contributes ``value_cents // 2^days_old`` (days
    before the log's last day) — EXPONENTIAL DECAY with a half-life of one
    day, kept EXACT by using powers of two and floor division of
    non-negative ints (both engines agree bit-for-bit; a float ``exp``
    decay could never cross-check). The recommendation/recency-ranking
    shape.

    Shape: the decay anchor (max ts) folds from per-batch maxima in the
    same fused scan's partials (ONE 8-byte row per block — bounded at any
    scale, always driver-folded); per-batch per-user partial sums are
    NOT possible without the anchor, so this is an honest TWO-pass over
    the same fused scan (anchor pass is metadata-cheap). The per-USER
    partials fold driver-side under the block gate; PAST it they
    hash-exchange on ``user_id % 64`` and fold per bucket on the pandas
    C-path, returning the per-user result as a Dataset (never gathered).
    Path-equality pinned at block_gate=0 (tests/test_corpus_scale.py)."""
    import numpy as np

    from ..sources.parquet import FusedParquetScan

    US_PER_DAY = 86_400_000_000

    def max_partial(b: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")), pa.int64())
        m = pc.max(t).as_py()
        return pa.table({"m": pa.array(
            [] if m is None else [m], pa.int64())})

    scan = FusedParquetScan(f"{sf_dir}/events.parquet",
                            columns=["ts"])
    mp = scan.map_batches(max_partial).to_pandas()
    if not len(mp):
        return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                             "n_events": pd.Series([], dtype=np.int64),
                             "score_cents": pd.Series([], dtype=np.int64)})
    anchor_day = int(mp["m"].max()) // US_PER_DAY

    def partial(b: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                    pa.int64()).to_numpy(zero_copy_only=False)
        days_old = anchor_day - t // US_PER_DAY
        cents = pc.cast(pc.round(pc.multiply(
            pc.fill_null(b.column("value"), 0), 100)), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        # 2^days_old overflows int64 past 62 — contributions are 0 there
        contrib = np.where(days_old < 63,
                           cents // (np.int64(1) << np.minimum(
                               days_old, 62)), 0)
        df = pd.DataFrame({
            "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
            "c": contrib})
        agg = df.groupby("user_id", sort=False)["c"].agg(["sum", "size"])
        return pa.table({
            "user_id": pa.array(agg.index.to_numpy().astype(np.int64)),
            "s": pa.array(agg["sum"].to_numpy().astype(np.int64)),
            "n": pa.array(agg["size"].to_numpy().astype(np.int64)),
        })

    scan2 = FusedParquetScan(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts", "value"])
    if scan2.num_blocks() > block_gate:
        mask = pa.scalar(63, pa.uint64())

        def partial_b(b: pa.Table) -> pa.Table:
            t = partial(b)
            return t.append_column("__b", pc.cast(pc.bit_wise_and(
                pc.cast(t.column("user_id"), pa.uint64()), mask),
                pa.int32()))

        def per_user(g: pd.DataFrame) -> pa.Table:
            agg = g.groupby("user_id", sort=False).agg(
                n_events=("n", "sum"), score_cents=("s", "sum"))
            return pa.table({
                "user_id": pa.array(
                    agg.index.to_numpy().astype(np.int64)),
                "n_events": pa.array(
                    agg["n_events"].to_numpy().astype(np.int64)),
                "score_cents": pa.array(
                    agg["score_cents"].to_numpy().astype(np.int64))})

        return scan2.map_batches(partial_b) \
            .groupby("__b").map_groups(per_user, batch_format="pandas")

    parts = scan2.map_batches(partial).to_pandas()
    agg = parts.groupby("user_id", as_index=False).agg(
        n_events=("n", "sum"), score_cents=("s", "sum"))
    agg["user_id"] = agg["user_id"].astype(np.int64)
    agg["n_events"] = agg["n_events"].astype(np.int64)
    agg["score_cents"] = agg["score_cents"].astype(np.int64)
    return agg.sort_values("user_id").reset_index(drop=True)


RECENCY_SCORES_SQL = """
WITH a AS (SELECT CAST(epoch_us(max(ts)) // 86400000000 AS BIGINT)
             AS anchor_day FROM events),
e AS (SELECT user_id,
             CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS cents,
             a.anchor_day - CAST(epoch_us(ts) // 86400000000 AS BIGINT)
               AS days_old
      FROM events, a)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN days_old < 63
                     THEN cents // CAST(power(2, LEAST(days_old, 62))
                                        AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS score_cents
FROM e GROUP BY user_id ORDER BY user_id
"""


def source_share_within_lang(sf_dir: str, block_gate: int = 512):
    """(lang, source, n_docs, share_bp) — percent-of-parent reporting:
    each source's share of its LANGUAGE's documents in exact integer
    basis points (``n·10000 // lang_total`` — non-negative floor
    division, identical cross-engine). The drill-down composition shape
    (share within parent group, not of the grand total — value_share_by_
    type covers that one).

    Shape: ONE fused scan; (lang, source) count partials are
    cell-bounded and fold via stages/folds.fold_cells (driver-side under
    the block gate, one cell-hash exchange past it)."""
    import numpy as np

    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["lang", "source"]) \
            .group_by(["lang", "source"]).aggregate([("source", "count")])
        return g.rename_columns(["lang", "source", "n"])

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "source"])
    cells = fold_cells(scan, partial, ["lang", "source"], sums=["n"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({"lang": pd.Series([], dtype=object),
                             "source": pd.Series([], dtype=object),
                             "n_docs": pd.Series([], dtype=np.int64),
                             "share_bp": pd.Series([], dtype=np.int64)})
    agg = cells.rename(columns={"n": "n_docs"})
    tot = agg.groupby("lang")["n_docs"].transform("sum")
    agg["share_bp"] = (agg["n_docs"] * 10_000 // tot).astype(np.int64)
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    return agg.sort_values(["lang", "source"], kind="mergesort") \
        .reset_index(drop=True)


SOURCE_SHARE_SQL = """
WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY 1, 2)
SELECT lang, source, n_docs,
       CAST(n_docs * 10000 // sum(n_docs) OVER (PARTITION BY lang)
            AS BIGINT) AS share_bp
FROM c ORDER BY lang, source
"""


def sample_quota_by_lang(sf_dir: str, k: int = 100, block_gate: int = 512):
    """(lang, n_docs, quota) — largest-remainder (Hamilton) apportionment
    of ``k`` sample slots across languages proportional to corpus counts:
    base = ``n·k // N`` then the remaining slots go to the largest
    remainders (``n·k mod N`` DESC, lang ASC) — the deterministic
    integer allocator behind stratified sampling budgets (quotas always
    sum to exactly ``k``, unlike rounded floats).

    Shape: ONE fused scan; per-batch lang counts fold via
    stages/folds.fold_cells (driver-side under the block gate, one
    lang-hash exchange past it); the apportionment itself is O(|langs|)
    driver math, fully integer."""
    import numpy as np

    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    def partial(b: pa.Table) -> pa.Table:
        vc = b.column("lang").combine_chunks().value_counts()
        return pa.table({
            "lang": pc.struct_field(vc, "values"),
            "n": pc.cast(pc.struct_field(vc, "counts"), pa.int64())})

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang"])
    cells = fold_cells(scan, partial, ["lang"], sums=["n"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({"lang": pd.Series([], dtype=object),
                             "n_docs": pd.Series([], dtype=np.int64),
                             "quota": pd.Series([], dtype=np.int64)})
    agg = cells.rename(columns={"n": "n_docs"})
    N = int(agg["n_docs"].sum())
    agg["base"] = agg["n_docs"] * k // N
    agg["rem"] = agg["n_docs"] * k % N
    leftover = k - int(agg["base"].sum())
    agg = agg.sort_values(["rem", "lang"], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    agg["quota"] = agg["base"] + (np.arange(len(agg)) < leftover) \
        .astype(np.int64)
    out = agg[["lang", "n_docs", "quota"]] \
        .sort_values("lang", kind="mergesort").reset_index(drop=True)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["quota"] = out["quota"].astype(np.int64)
    assert int(out["quota"].sum()) == k
    return out


SAMPLE_QUOTA_SQL = """
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY lang),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
b AS (SELECT lang, n_docs,
             CAST(n_docs * 100 // t.total AS BIGINT) AS base,
             CAST(n_docs * 100 % t.total AS BIGINT) AS rem
      FROM c, t),
lo AS (SELECT CAST(100 - sum(base) AS BIGINT) AS leftover FROM b),
r AS (SELECT lang, n_docs, base,
             row_number() OVER (ORDER BY rem DESC, lang) AS rk
      FROM b)
SELECT lang, n_docs,
       CAST(base + CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM r, lo ORDER BY lang
"""


def bounce_rate_daily(sf_dir: str, gap_minutes: int = 30):
    """(day, n_sessions, n_bounce, bounce_bp) — daily bounce rate: a
    session is a maximal per-user event run with gaps < ``gap_minutes``;
    a bounce is a single-event session; sessions are dated by their FIRST
    event's day. Rate in exact integer basis points (floor division).

    Shape: ONE user-hash exchange; each bucket sorts its slice once,
    finds session starts with a vectorized gap mask, counts events per
    session by run-length, and emits per-day (sessions, bounces)
    partials; the calendar-bounded fold is driver-side."""
    import numpy as np

    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id"])
    GAP_US = gap_minutes * 60 * 1_000_000
    DAY_US = 86_400_000_000

    def add_bucket(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "t": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                         pa.int64()),
            "__b": pa.array((uid % 32).astype(np.int32)),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        t = g["t"].to_numpy().astype(np.int64)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        start = new_user | np.r_[False, (t[1:] - t[:-1]) >= GAP_US]
        sid = np.cumsum(start) - 1
        n_per = np.bincount(sid)
        start_t = t[np.flatnonzero(start)]
        day = (start_t // DAY_US) * DAY_US
        df = pd.DataFrame({"day": day, "one": 1,
                           "bounce": (n_per == 1).astype(np.int64)})
        agg = df.groupby("day", sort=False, as_index=False).agg(
            n_sessions=("one", "sum"), n_bounce=("bounce", "sum"))
        return agg

    parts = ev.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas") \
        .to_pandas()
    if "day" not in parts.columns or not len(parts):
        return pd.DataFrame({"day": pd.Series([], dtype="datetime64[us]"),
                             "n_sessions": pd.Series([], dtype=np.int64),
                             "n_bounce": pd.Series([], dtype=np.int64),
                             "bounce_bp": pd.Series([], dtype=np.int64)})
    agg = parts.groupby("day", as_index=False).agg(
        n_sessions=("n_sessions", "sum"), n_bounce=("n_bounce", "sum"))
    agg["bounce_bp"] = (agg["n_bounce"] * 10_000
                        // agg["n_sessions"]).astype(np.int64)
    agg["day"] = pd.to_datetime(agg["day"].astype(np.int64), unit="us")
    agg["n_sessions"] = agg["n_sessions"].astype(np.int64)
    agg["n_bounce"] = agg["n_bounce"].astype(np.int64)
    return agg.sort_values("day").reset_index(drop=True)


BOUNCE_RATE_SQL = """
WITH o AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS pt
  FROM events),
s AS (SELECT user_id, event_id, t,
             CASE WHEN pt IS NULL OR t - pt >= 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM o),
sess AS (SELECT user_id, t,
                sum(is_start) OVER (PARTITION BY user_id
                                    ORDER BY t, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
         FROM s),
per AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n,
               CAST(min(t) // 86400000000 * 86400000000 AS BIGINT)
                 AS day_us
        FROM sess GROUP BY 1, 2)
SELECT CAST(to_timestamp(day_us // 1000000) AS TIMESTAMP) AS day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 10000 // count(*)
            AS BIGINT) AS bounce_bp
FROM per GROUP BY day_us ORDER BY day
"""


def followups_events(sf_dir: str, window_s: int = 3600):
    """(prev_type, event_type, n) — gap-window sequence mining: how often
    an event of type B follows an event of type A by the SAME user within
    ``window_s`` seconds (strictly later in time — the not-necessarily-
    adjacent sibling of event_transitions, the "followed-by" funnel
    primitive). Counts are exact ints.

    Shape: one user-hash exchange; each bucket sorts once and counts
    every (a, b) window pair with TWO vectorized searchsorted calls over
    user-offset timestamps (the burst_users_events trick — no per-user
    task, no python loop over events), emitting ≤ |types|² partial cells;
    driver folds the tiny pair vocabulary."""
    import numpy as np

    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_type"])
    win_us = window_s * 1_000_000

    def add_bucket(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "event_type": b.column("event_type"),
            "t": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                         pa.int64()),
            "__b": pa.array((uid % 32).astype(np.int32)),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t"], kind="mergesort")
        t = g["t"].to_numpy(np.int64)
        codes = pd.factorize(g["user_id"].to_numpy(),
                             use_na_sentinel=False)[0].astype(np.int64)
        if not len(t):
            return pd.DataFrame({"prev_type": pd.Series([], dtype=object),
                                 "event_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        span = np.int64(int(t.max()) - int(t.min()) + win_us + 1)
        shifted = (t - t.min()) + codes * span
        # b strictly later: (shifted_a, shifted_a + W]
        lo = np.searchsorted(shifted, shifted, side="right")
        hi = np.searchsorted(shifted, shifted + win_us, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return pd.DataFrame({"prev_type": pd.Series([], dtype=object),
                                 "event_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        types = g["event_type"].to_numpy()
        a_idx = np.repeat(np.arange(len(t)), cnt)
        cum = np.concatenate(([0], np.cumsum(cnt)))
        b_idx = (np.arange(total, dtype=np.int64)
                 - np.repeat(cum[:-1], cnt) + np.repeat(lo, cnt))
        pairs = pd.DataFrame({"prev_type": types[a_idx],
                              "event_type": types[b_idx]})
        out = pairs.groupby(["prev_type", "event_type"], sort=False) \
            .size().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = ev.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas") \
        .to_pandas()
    if not len(parts):
        return pd.DataFrame({"prev_type": pd.Series([], dtype=object),
                             "event_type": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    out = parts.groupby(["prev_type", "event_type"],
                        as_index=False)["n"].sum()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["prev_type", "event_type"],
                           kind="mergesort").reset_index(drop=True)


FOLLOWUPS_SQL = """
WITH e AS (SELECT user_id, event_type,
                  CAST(epoch_us(ts) AS BIGINT) AS t FROM events)
SELECT a.event_type AS prev_type, b.event_type AS event_type,
       CAST(count(*) AS BIGINT) AS n
FROM e a JOIN e b
  ON b.user_id = a.user_id AND b.t > a.t AND b.t <= a.t + 3600000000
GROUP BY 1, 2 ORDER BY 1, 2
"""


def markov_entropy_events(sf_dir: str):
    """One-row (n_pairs, h_units, h_cond_micronats) — the conditional
    entropy H(next | prev) of the user-timeline event-type Markov chain
    (sequence predictability: 0 = deterministic journeys, ln|types| =
    uniform chaos). Built on the event_transitions cells; the integer-ln
    technique per cell — ``h_units = Σ_ij c_ij·floor(ln(c_ij/c_i·)·10⁶)``
    (one correctly-rounded double division of two exact ints, scalar libm
    log, floor) — so the statistic folds as an exact integer and the one
    output float is a single division, bitwise equal cross-engine.

    Adjacency pairs come from the SAME user-bucket exchange as
    event_transitions (ties (t, event_id); a bucket's per-user shift is
    exact); the ≤|types|² cell table folds driver-side."""
    import math

    import numpy as np

    cells = event_transitions(sf_dir)
    if not len(cells):
        return pd.DataFrame({
            "n_pairs": pd.Series([0], dtype=np.int64),
            "h_units": pd.Series([0], dtype=np.int64),
            "h_cond_micronats": pd.Series([0.0], dtype=np.float64)})
    n = int(cells["n"].sum())
    row = cells.groupby("prev_type")["n"].transform("sum") \
        .to_numpy(np.int64)
    c = cells["n"].to_numpy(np.int64)
    h_units = 0
    for cij, ci in zip(c, row):
        h_units += int(cij) * math.floor(
            math.log(float(cij) / float(ci)) * 1_000_000)
    h = float(-h_units) / float(n)
    return pd.DataFrame({
        "n_pairs": pd.Series([n], dtype=np.int64),
        "h_units": pd.Series([h_units], dtype=np.int64),
        "h_cond_micronats": pd.Series([h], dtype=np.float64)})


MARKOV_ENTROPY_SQL = """
WITH r AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
c AS (SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
      FROM r WHERE prev_type IS NOT NULL GROUP BY 1, 2),
m AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS rn FROM c
      GROUP BY prev_type),
agg AS (SELECT CAST(sum(c.n) AS BIGINT) AS n_pairs,
               CAST(sum(c.n * CAST(floor(ln(CAST(c.n AS DOUBLE)
                    / CAST(m.rn AS DOUBLE)) * 1000000) AS BIGINT))
                    AS BIGINT) AS h_units
        FROM c JOIN m USING (prev_type))
SELECT n_pairs, h_units,
       CAST(-h_units AS DOUBLE) / CAST(n_pairs AS DOUBLE)
         AS h_cond_micronats
FROM agg
"""


def lorenz_deciles_customers(sf_dir: str):
    """Per revenue decile (poorest → richest customers): (decile, n,
    cents, cum_share_ppm) — the full Lorenz curve behind
    :func:`gini_customers`'s single number and
    :func:`pareto_customers`'s 80/20 point. Customers sort ascending by
    (revenue cents, custkey) and split into ten exact-rank deciles
    ``decile = 10·(rank−1) // n`` (first deciles get the extra customers
    when 10 ∤ n — the same floor spelling in both engines);
    ``cum_share_ppm = 10⁶·cumcents // total`` is exact floor-ppm.

    Scale shape: per-customer cents fold from per-batch partials
    (customer-bounded driver fold, the gini/pareto gate documented
    there); ranking is one driver sort of the customer aggregate."""
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"c": b.column("o_custkey"),
                      "v": pc.cast(pc.round(pc.multiply(
                          b.column("o_totalprice"), 100)), pa.int64())})
        g = t.group_by("c").aggregate([("v", "sum")])
        return pa.table({"c": g.column("c"), "v": g.column("v_sum")})

    df = (orders.map_batches(partial, batch_format="pyarrow").to_pandas()
          .groupby("c", as_index=False)["v"].sum())
    if len(df) > 50_000_000:
        raise ValueError("lorenz_deciles driver fold gate: "
                         f"{len(df)} customers; pre-bucket the rank fold")
    if not len(df):
        return pd.DataFrame({
            "decile": pd.Series([], dtype=np.int64),
            "n": pd.Series([], dtype=np.int64),
            "cents": pd.Series([], dtype=np.int64),
            "cum_share_ppm": pd.Series([], dtype=np.int64)})
    df = df.sort_values(["v", "c"], ascending=[True, True],
                        kind="mergesort").reset_index(drop=True)
    n = len(df)
    dec = (10 * np.arange(n, dtype=np.int64)) // n
    v = df["v"].to_numpy(np.int64)
    total = int(v.sum())
    rows = []
    cum = 0
    for d in range(10):
        m = dec == d
        if not m.any():
            continue
        cents = int(v[m].sum())
        cum += cents
        rows.append((np.int64(d), np.int64(int(m.sum())), np.int64(cents),
                     np.int64((1_000_000 * cum) // total if total else 0)))
    return pd.DataFrame(rows, columns=["decile", "n", "cents",
                                       "cum_share_ppm"])


LORENZ_DECILES_SQL = """
WITH cc AS (SELECT o_custkey AS c,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS v
            FROM orders GROUP BY 1),
r AS (SELECT v, 10 * (row_number() OVER (ORDER BY v, c) - 1)
               // (SELECT count(*) FROM cc) AS decile
      FROM cc),
d AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS cents
      FROM r GROUP BY 1),
w AS (SELECT decile, n, cents,
             CAST(sum(cents) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
             CAST((SELECT sum(v) FROM cc) AS BIGINT) AS total
      FROM d)
SELECT CAST(decile AS BIGINT) AS decile, n, cents,
       CAST(CASE WHEN total = 0 THEN 0
                 ELSE 1000000 * cum // total END AS BIGINT)
         AS cum_share_ppm
FROM w ORDER BY decile
"""


# ---- Goh–Barabási burstiness of per-user inter-event gaps --------------------

def burstiness_users(sf_dir: str, n_buckets: int = 64):
    """(user_id, n_gaps, b) — the Goh–Barabási burstiness coefficient of
    each user's inter-event gap sequence: B = (σ − μ)/(σ + μ) over the
    gaps in whole seconds (B → −1 metronome, 0 Poisson, → 1 bursty — the
    bot-vs-human activity-shape signal that complements
    burst_users_events' window-count heuristic). Exactness: gaps are
    exact ints (µs difference // 10⁶, nonnegative so floor = trunc in
    both engines); per-user (n, S=Σg, SS=Σg²) are int64 folds; with the
    population σ the n's cancel and

        B = (√D − S) / (√D + S),   D = n·SS − S²  (≥ 0 by Cauchy–Schwarz)

    — D is computed in PYTHON ints (n·SS overflows int64 for long-lived
    users; SQL uses HUGEINT) and each IEEE step of the spelling is
    correctly rounded from exact integers, so the doubles are bitwise
    equal. Users need ≥ 2 gaps and S > 0 (B undefined on all-simultaneous
    streams).

    Scale shape: ONE hash exchange of (user_id, ts µs) on ``user_id %
    n_buckets`` — gap adjacency requires co-location, the
    ts_inversions_users contract; each bucket sorts once and folds its
    users on the pandas C-path; output is one row per qualifying user."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts"])
    mod = np.int64(n_buckets)

    def add_bucket(b: pa.Table) -> pa.Table:
        t = pa.table({"user_id": b.column("user_id"),
                      "t": pc.cast(pc.cast(b.column("ts"),
                                           pa.timestamp("us")), pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array((u % mod).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        out0 = pa.table({"user_id": pa.array([], pa.int64()),
                         "n_gaps": pa.array([], pa.int64()),
                         "b": pa.array([], pa.float64())})
        if not len(g):
            return out0
        g = g.sort_values(["user_id", "t"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["t"].to_numpy(np.int64)
        same = np.concatenate(([False], u[1:] == u[:-1]))
        gap = (t - np.concatenate(([0], t[:-1]))) // 1_000_000
        gf = pd.DataFrame({"user_id": u[same], "g": gap[same]})
        if not len(gf):
            return out0
        agg = gf.groupby("user_id", sort=False).agg(
            n=("g", "size"), s=("g", "sum"),
            ss=("g", lambda x: int((x.to_numpy(np.int64) ** 2).sum())))
        agg = agg[(agg["n"] >= 2) & (agg["s"] > 0)]
        if not len(agg):
            return out0
        # D in Python ints: n·SS overflows int64 on long gap series
        d = [int(n) * int(ss) - int(s) * int(s)
             for n, s, ss in zip(agg["n"], agg["s"], agg["ss"])]
        sd = np.sqrt(np.array([float(x) for x in d], np.float64))
        sf_ = agg["s"].to_numpy(np.int64).astype(np.float64)
        b = (sd - sf_) / (sd + sf_)
        return pa.table({
            "user_id": pa.array(agg.index.to_numpy(np.int64)),
            "n_gaps": pa.array(agg["n"].to_numpy(np.int64)),
            "b": pa.array(b)})

    out = (ev.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("__b").map_groups(per_bucket, batch_format="pandas")
           .to_pandas())
    if not len(out):
        return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                             "n_gaps": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.float64)})
    return out.sort_values("user_id").reset_index(drop=True)


BURSTINESS_SQL = """
WITH o AS (SELECT user_id, epoch_us(ts) AS t,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts) AS pt
           FROM events),
g AS (SELECT user_id, (t - pt) // 1000000 AS gs FROM o
      WHERE pt IS NOT NULL),
a AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(gs) AS HUGEINT) AS s,
             CAST(sum(CAST(gs AS HUGEINT) * gs) AS HUGEINT) AS ss
      FROM g GROUP BY 1),
f AS (SELECT user_id, n, s, n * ss - s * s AS d FROM a
      WHERE n >= 2 AND s > 0)
SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
       (sqrt(CAST(d AS DOUBLE)) - CAST(s AS DOUBLE))
       / (sqrt(CAST(d AS DOUBLE)) + CAST(s AS DOUBLE)) AS b
FROM f ORDER BY user_id
"""


# ---- HITS hubs/authorities over the trade graph ------------------------------

def hits_custsupp(sf_dir: str):
    """(kind, key, score) — 3 exact-integer HITS rounds over the DIRECTED
    bipartite trade graph (distinct (o_custkey → l_suppkey) pairs from
    orders ⋈ lineitem): customers are HUBS (buy from many good
    suppliers), suppliers are AUTHORITIES (supply many good hubs) — the
    mutual-reinforcement ranking PageRank's single-score random walk
    cannot express. stages/pagerank.hits: all-integer in-neighbor sums +
    integer max-normalization per half-step, so the fixed iteration count
    is bit-reproducible — and SQL-checkable via chained CTEs.

    Edge build: orders is the SMALL side of the custkey lookup — under
    ``broadcast_orders_limit`` rows it broadcasts once as a SORTED
    (orderkey, custkey) array pair (``ray.put``; per-batch probe = one
    vectorized ``np.searchsorted`` — ``pc.index_in`` would rebuild a
    1.5M-key hash table per batch, measured 8 s vs ~3 s at sf0.1) and
    the per-batch-deduped pairs dedup DRIVER-side (they are gathered for
    the gated HITS iteration anyway — the distributed dedup exchange
    would only re-spread data the driver is about to collect); past the
    limit the bucketed fact-fact join + pair-hash dedup exchange take
    over. The deduped edge set is MATERIALIZED — every HITS half-step
    re-reads it, and lazy edges would re-execute the build 6×
    (measured 117 s lazy / 12 s joined / ~5 s broadcast at sf0.1)."""
    import ray
    import ray.data as rd

    from ..stages.pagerank import hits

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_suppkey"])
    import pyarrow.parquet as _pq

    meta = _pq.read_metadata(f"{sf_dir}/orders.parquet")
    broadcast_orders_limit = 4_000_000
    if meta.num_rows <= broadcast_orders_limit:
        ot = _pq.read_table(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey"])
        ok = ot.column("o_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cu = ot.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(ok, kind="mergesort")
        dim_ref = ray.put((ok[order], cu[order]))

        def probe_pairs(b: pa.Table) -> pa.Table:
            okeys, custs = ray.get(dim_ref)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            src = custs[np.searchsorted(okeys, lk)]
            df = pd.DataFrame({
                "src": src,
                "dst": b.column("l_suppkey").to_numpy(
                    zero_copy_only=False).astype(np.int64)}) \
                .drop_duplicates()
            return pa.Table.from_pandas(df, preserve_index=False) \
                .replace_schema_metadata(None)

        pdf = li.map_batches(probe_pairs, batch_format="pyarrow") \
            .to_pandas().drop_duplicates()
        dedup = rd.from_pandas(pdf.reset_index(drop=True)).materialize()
    else:
        o = read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
        j = bucketed_join(li, o, on="l_orderkey", right_on="o_orderkey")

        def pair_partials(b: pa.Table) -> pa.Table:
            df = pa.table({
                "src": pc.cast(b.column("o_custkey"), pa.int64()),
                "dst": pc.cast(b.column("l_suppkey"), pa.int64())}) \
                .to_pandas().drop_duplicates()
            h = pd.util.hash_pandas_object(
                df["src"] * np.int64(1_000_003) + df["dst"],
                index=False).to_numpy()
            return pa.Table.from_pandas(
                df.assign(__pb=(h % 32).astype(np.int32)),
                preserve_index=False).replace_schema_metadata(None)

        dedup = j.map_batches(pair_partials, batch_format="pyarrow") \
            .groupby("__pb").map_groups(
                lambda g: g.drop(columns="__pb").drop_duplicates(),
                batch_format="pandas").materialize()

    h_state, a_state = hits(dedup, "src", "dst", iterations=3)
    frames = []
    for kind, state in (("hub", h_state), ("auth", a_state)):
        if state is None:
            continue
        df = state.to_pandas()
        if not len(df):
            continue
        frames.append(pd.DataFrame({
            "kind": kind,
            "key": df["node"].astype(np.int64),
            "score": df["score"].astype(np.int64)}))
    if not frames:
        return pd.DataFrame({"kind": pd.Series([], dtype=object),
                             "key": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.int64)})
    return pd.concat(frames, ignore_index=True) \
        .sort_values(["kind", "key"]).reset_index(drop=True)


_HITS_STEP = """
h{k} AS (SELECT e.c AS node, CAST(sum(a{p}.score) AS BIGINT) AS s
         FROM e JOIN a{p} ON a{p}.node = e.s GROUP BY e.c),
hm{k} AS (SELECT max(s) AS m FROM h{k}),
hn{k} AS (SELECT node, (s * 1000000) // (SELECT m FROM hm{k}) AS score
          FROM h{k}),
aa{k} AS (SELECT e.s AS node, CAST(sum(hn{k}.score) AS BIGINT) AS s
          FROM e JOIN hn{k} ON hn{k}.node = e.c GROUP BY e.s),
am{k} AS (SELECT max(s) AS m FROM aa{k}),
a{k} AS (SELECT node, (s * 1000000) // (SELECT m FROM am{k}) AS score
         FROM aa{k})"""

HITS_SQL = ("""
WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
a0 AS (SELECT DISTINCT s AS node, CAST(1000000 AS BIGINT) AS score
       FROM e),"""
            + ",".join(_HITS_STEP.format(k=k, p=k - 1)
                       for k in (1, 2, 3))
            + """
SELECT 'hub' AS kind, node AS key, score FROM hn3
UNION ALL
SELECT 'auth' AS kind, node AS key, score FROM a3
ORDER BY kind, key
""")



# ---- partial correlation from the shared moment scan -------------------------

def partial_corr_lineitem(sf_dir: str):
    """(var_x, var_y, control, r, r_partial) — the three first-order
    partial correlations of quantity / price-cents / discount-percent:
    how much of each pairwise association survives controlling for the
    third variable,

        r_xy·z = (r_xy − r_xz·r_yz) / (√(1−r_xz²) · √(1−r_yz²))

    — the variable-confounding diagnostic on top of
    :func:`corr_matrix_lineitem`'s matrix, from the SAME one-scan
    10-integer-moment fold (k statistics never cost k passes). Exactness:
    every r is corr_matrix's identical IEEE expression over exact
    arbitrary-precision integer moments, and the partial formula is one
    more identically-spelled double composition, so the floats match
    bitwise (0.0 when a denominator factor is 0 — a perfectly correlated
    control)."""
    import math

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_quantity", "l_extendedprice",
                               "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(b.column("l_quantity")),
                    pa.int64()).to_numpy(zero_copy_only=False)
        c = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        d = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "n": [len(q)],
            "s1": [int(q.sum())], "s2": [int(c.sum())], "s3": [int(d.sum())],
            "s11": [int((q * q).sum())], "s22": [int((c * c).sum())],
            "s33": [int((d * d).sum())], "s12": [int((q * c).sum())],
            "s13": [int((q * d).sum())], "s23": [int((c * d).sum())]})

    parts = li.map_batches(partial, batch_format="pyarrow",
                           batch_size=32768).to_pandas()
    m = {k: int(parts[k].astype(object).sum()) for k in parts.columns}

    def corr(sx, sy, sxx, syy, sxy):
        num = m["n"] * m[sxy] - m[sx] * m[sy]
        d1 = m["n"] * m[sxx] - m[sx] * m[sx]
        d2 = m["n"] * m[syy] - m[sy] * m[sy]
        return float(num) / (math.sqrt(float(d1)) * math.sqrt(float(d2)))

    r12 = corr("s1", "s2", "s11", "s22", "s12")
    r13 = corr("s1", "s3", "s11", "s33", "s13")
    r23 = corr("s2", "s3", "s22", "s33", "s23")

    def pcorr(rxy, rxz, ryz):
        den = math.sqrt(1.0 - rxz * rxz) * math.sqrt(1.0 - ryz * ryz)
        return 0.0 if den == 0.0 else (rxy - rxz * ryz) / den

    return pd.DataFrame({
        "var_x": ["qty", "qty", "cents"],
        "var_y": ["cents", "disc", "disc"],
        "control": ["disc", "cents", "qty"],
        "r": [r12, r13, r23],
        "r_partial": [pcorr(r12, r13, r23), pcorr(r13, r12, r23),
                      pcorr(r23, r12, r13)]})


PARTIAL_CORR_SQL = """
WITH m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS s1,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS HUGEINT)
           AS s2,
         CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS HUGEINT) AS s3,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)) AS s11,
         sum(CAST(round(l_extendedprice*100) AS HUGEINT)
             * CAST(round(l_extendedprice*100) AS HUGEINT)) AS s22,
         sum(CAST(round(l_discount*100) AS HUGEINT)
             * CAST(round(l_discount*100) AS HUGEINT)) AS s33,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_extendedprice*100) AS HUGEINT)) AS s12,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_discount*100) AS HUGEINT)) AS s13,
         sum(CAST(round(l_extendedprice*100) AS HUGEINT)
             * CAST(round(l_discount*100) AS HUGEINT)) AS s23
  FROM lineitem),
r AS (
  SELECT CAST(n*s12 - s1*s2 AS DOUBLE)
           / (sqrt(CAST(n*s11 - s1*s1 AS DOUBLE))
              * sqrt(CAST(n*s22 - s2*s2 AS DOUBLE))) AS r12,
         CAST(n*s13 - s1*s3 AS DOUBLE)
           / (sqrt(CAST(n*s11 - s1*s1 AS DOUBLE))
              * sqrt(CAST(n*s33 - s3*s3 AS DOUBLE))) AS r13,
         CAST(n*s23 - s2*s3 AS DOUBLE)
           / (sqrt(CAST(n*s22 - s2*s2 AS DOUBLE))
              * sqrt(CAST(n*s33 - s3*s3 AS DOUBLE))) AS r23
  FROM m)
SELECT 'qty' AS var_x, 'cents' AS var_y, 'disc' AS control, r12 AS r,
       CASE WHEN sqrt(1.0 - r13*r13) * sqrt(1.0 - r23*r23) = 0.0 THEN 0.0
            ELSE (r12 - r13*r23)
                 / (sqrt(1.0 - r13*r13) * sqrt(1.0 - r23*r23))
       END AS r_partial FROM r
UNION ALL
SELECT 'qty', 'disc', 'cents', r13,
       CASE WHEN sqrt(1.0 - r12*r12) * sqrt(1.0 - r23*r23) = 0.0 THEN 0.0
            ELSE (r13 - r12*r23)
                 / (sqrt(1.0 - r12*r12) * sqrt(1.0 - r23*r23))
       END FROM r
UNION ALL
SELECT 'cents', 'disc', 'qty', r23,
       CASE WHEN sqrt(1.0 - r12*r12) * sqrt(1.0 - r13*r13) = 0.0 THEN 0.0
            ELSE (r23 - r12*r13)
                 / (sqrt(1.0 - r12*r12) * sqrt(1.0 - r13*r13))
       END FROM r
"""



# ---- event types co-occurring within one session ------------------------------

def session_type_pairs(sf_dir: str, gap_s: int = 3600,
                       n_buckets: int = 32):
    """(type_a, type_b, support) — for every unordered pair of event
    types, the number of SESSIONS (gap-based, same 3600 s rule as
    events_in_sessions) in which both occur: the within-session
    co-occurrence matrix behind "users who do X in a sitting also do Y".
    Market-basket mining composed with sessionization — the basket is
    DERIVED (a session), not a stored key.

    Scale shape: ONE hash exchange of (user_id, ts µs, event_type) on the
    user bucket — sessions are per-user, so each bucket owns complete
    baskets; the bucket task sessionizes (sorted diff > gap), dedups
    (session, type), self-merges ordered pairs and PRE-AGGREGATES pair
    counts, so only (type_a, type_b, partial) rows — bounded by the
    type-vocabulary square — reach the driver fold. No second exchange:
    unlike stages/itemsets.cooccur_pairs' generic two-exchange shape,
    the pair space here is vocabulary-bounded."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_type"])
    mod = np.int64(n_buckets)
    gap_us = int(gap_s) * 1_000_000

    def add_bucket(b: pa.Table) -> pa.Table:
        t = pa.table({"user_id": b.column("user_id"),
                      "t": pc.cast(pc.cast(b.column("ts"),
                                           pa.timestamp("us")), pa.int64()),
                      "event_type": b.column("event_type")})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array((u % mod).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        out0 = pa.table({"type_a": pa.array([], pa.string()),
                         "type_b": pa.array([], pa.string()),
                         "support": pa.array([], pa.int64())})
        if not len(g):
            return out0
        g = g.sort_values(["user_id", "t"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["t"].to_numpy(np.int64)
        new_s = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_s[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > gap_us)
        sid = np.cumsum(new_s)       # bucket-local session id
        d = pd.DataFrame({"sid": sid,
                          "ty": g["event_type"].to_numpy()}) \
            .drop_duplicates()
        m = d.merge(d, on="sid")
        m = m[m["ty_x"] < m["ty_y"]]
        if not len(m):
            return out0
        agg = m.groupby(["ty_x", "ty_y"], sort=False).size() \
            .reset_index(name="support")
        return pa.table({
            "type_a": pa.array(agg["ty_x"], pa.string()),
            "type_b": pa.array(agg["ty_y"], pa.string()),
            "support": pa.array(agg["support"].to_numpy(np.int64))})

    parts = (ev.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("__b").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    if not len(parts):
        return pd.DataFrame({"type_a": pd.Series([], dtype=object),
                             "type_b": pd.Series([], dtype=object),
                             "support": pd.Series([], dtype=np.int64)})
    out = parts.groupby(["type_a", "type_b"], as_index=False)[
        "support"].sum()
    out["support"] = out["support"].astype(np.int64)
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


SESSION_TYPE_PAIRS_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 3600 SECOND
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), d AS (
  SELECT DISTINCT user_id, sid, event_type FROM sess
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS support
FROM d a JOIN d b ON a.user_id = b.user_id AND a.sid = b.sid
                 AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---- spend-decile transition matrix ------------------------------------------

def spend_decile_transition_customers(sf_dir: str, n_buckets: int = 32):
    """(d1, d2, n_customers) — the decile-transition matrix of customer
    spend between the first and second calendar halves of the order
    history: each customer's total cents per half is decile-bucketed BY
    THAT HALF'S OWN exact deciles, and the matrix counts customers per
    (first-half decile, second-half decile) — the rank-migration /
    feature-drift shape ("did the top spenders stay on top?").
    Exactness: half split at the integer midpoint day (min+max)//2; per-
    customer cents are integer folds; decile thresholds come from the
    histogram-refinement exact-quantile stage (quantile_disc semantics —
    actual data elements, so ``v > t`` is an exact integer comparison)
    and the bucket index 1 + Σ[v > t_i] mirrors quartile_bins. Customers
    with no orders in a half count 0 cents in it.

    Scale shape: one customer-bucket exchange folds the per-customer
    halves; the decile thresholds are two exact_quantiles refinements
    over the folded (bounded-width) table; the final (d1, d2) cells are
    a 100-row fold. No global sort — rank-bucketing via thresholds."""
    from ..stages.quantiles import exact_quantiles

    o = read_parquet(f"{sf_dir}/orders.parquet",
                     columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def day_cents(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("o_orderdate"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        c = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), 100)), pa.int64())
        return pa.table({"cust": pc.cast(b.column("o_custkey"), pa.int64()),
                         "day": d, "c": c})

    base = o.map_batches(day_cents, batch_format="pyarrow").materialize()

    # global midpoint day (driver scalars from per-block min/max partials)
    def mm(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": [pc.min(b.column("day")).as_py()],
                         "hi": [pc.max(b.column("day")).as_py()]})

    mmp = base.map_batches(mm, batch_format="pyarrow").to_pandas()
    if not len(mmp):
        return pd.DataFrame({"d1": pd.Series([], dtype=np.int64),
                             "d2": pd.Series([], dtype=np.int64),
                             "n_customers": pd.Series([], dtype=np.int64)})
    mid = (int(mmp["lo"].min()) + int(mmp["hi"].max())) // 2
    mod = np.int64(n_buckets)

    def half_partial(b: pa.Table) -> pa.Table:
        day = b.column("day").to_numpy(zero_copy_only=False)
        c = b.column("c").to_numpy(zero_copy_only=False)
        h2 = day > mid
        df = pd.DataFrame({"cust": b.column("cust").to_numpy(
            zero_copy_only=False),
            "c1": np.where(h2, 0, c), "c2": np.where(h2, c, 0)})
        agg = df.groupby("cust", as_index=False)[["c1", "c2"]].sum()
        agg["__b"] = (agg["cust"].to_numpy(np.int64)
                      % mod).astype(np.int32)
        return pa.Table.from_pandas(agg, preserve_index=False) \
            .replace_schema_metadata(None)

    per_cust = base.map_batches(half_partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(
            lambda g: g.drop(columns="__b").groupby(
                "cust", as_index=False)[["c1", "c2"]].sum(),
            batch_format="pandas").materialize()

    ps = [i / 10.0 for i in range(1, 10)]
    t1 = exact_quantiles(per_cust, "c1", ps)
    t2 = exact_quantiles(per_cust, "c2", ps)
    th1 = np.array([int(t1[p]) for p in ps], np.int64)
    th2 = np.array([int(t2[p]) for p in ps], np.int64)

    def cells(b: pa.Table) -> pa.Table:
        c1 = b.column("c1").to_numpy(zero_copy_only=False)[:, None]
        c2 = b.column("c2").to_numpy(zero_copy_only=False)[:, None]
        d1 = 1 + (c1 > th1[None, :]).sum(axis=1).astype(np.int64)
        d2 = 1 + (c2 > th2[None, :]).sum(axis=1).astype(np.int64)
        g = pd.DataFrame({"d1": d1, "d2": d2}).groupby(
            ["d1", "d2"], as_index=False).size()
        return pa.table({"d1": pa.array(g["d1"].to_numpy(np.int64)),
                         "d2": pa.array(g["d2"].to_numpy(np.int64)),
                         "n_customers": pa.array(
                             g["size"].to_numpy(np.int64))})

    out = per_cust.map_batches(cells, batch_format="pyarrow").to_pandas() \
        .groupby(["d1", "d2"], as_index=False)["n_customers"].sum()
    out["n_customers"] = out["n_customers"].astype(np.int64)
    return out.sort_values(["d1", "d2"]).reset_index(drop=True)


SPEND_DECILE_TRANSITION_SQL = """
WITH b AS (SELECT o_custkey AS cust,
                  CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                    AS day,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS c
           FROM orders),
mm AS (SELECT (min(day) + max(day)) // 2 AS mid FROM b),
pc_ AS (SELECT cust,
          CAST(COALESCE(sum(c) FILTER (WHERE day <= (SELECT mid FROM mm)),
                        0) AS BIGINT) AS c1,
          CAST(COALESCE(sum(c) FILTER (WHERE day > (SELECT mid FROM mm)),
                        0) AS BIGINT) AS c2
        FROM b GROUP BY 1),
q AS (SELECT quantile_disc(c1, 0.1) AS a1, quantile_disc(c1, 0.2) AS a2,
             quantile_disc(c1, 0.3) AS a3, quantile_disc(c1, 0.4) AS a4,
             quantile_disc(c1, 0.5) AS a5, quantile_disc(c1, 0.6) AS a6,
             quantile_disc(c1, 0.7) AS a7, quantile_disc(c1, 0.8) AS a8,
             quantile_disc(c1, 0.9) AS a9,
             quantile_disc(c2, 0.1) AS b1, quantile_disc(c2, 0.2) AS b2,
             quantile_disc(c2, 0.3) AS b3, quantile_disc(c2, 0.4) AS b4,
             quantile_disc(c2, 0.5) AS b5, quantile_disc(c2, 0.6) AS b6,
             quantile_disc(c2, 0.7) AS b7, quantile_disc(c2, 0.8) AS b8,
             quantile_disc(c2, 0.9) AS b9
      FROM pc_),
d AS (SELECT 1 + CAST(c1 > a1 AS INT) + CAST(c1 > a2 AS INT)
               + CAST(c1 > a3 AS INT) + CAST(c1 > a4 AS INT)
               + CAST(c1 > a5 AS INT) + CAST(c1 > a6 AS INT)
               + CAST(c1 > a7 AS INT) + CAST(c1 > a8 AS INT)
               + CAST(c1 > a9 AS INT) AS d1,
             1 + CAST(c2 > b1 AS INT) + CAST(c2 > b2 AS INT)
               + CAST(c2 > b3 AS INT) + CAST(c2 > b4 AS INT)
               + CAST(c2 > b5 AS INT) + CAST(c2 > b6 AS INT)
               + CAST(c2 > b7 AS INT) + CAST(c2 > b8 AS INT)
               + CAST(c2 > b9 AS INT) AS d2
      FROM pc_, q)
SELECT CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2,
       CAST(count(*) AS BIGINT) AS n_customers
FROM d GROUP BY 1, 2 ORDER BY 1, 2
"""



# ---- Kaplan-Meier user survival with right-censoring -------------------------

def kaplan_meier_users(sf_dir: str, horizon_days: int = 7,
                       n_buckets: int = 64):
    """(t, n_risk, d_events, c_censored, km) — the Kaplan–Meier
    product-limit survival curve of user LIFETIME (days between a user's
    first and last event), with right-censoring: a user whose last event
    is within ``horizon_days`` of the corpus end is CENSORED (still
    alive), not a churn event — the estimator the naive lifetime
    histogram (survival_users_events) gets wrong whenever observation
    windows truncate lifetimes. Conventions (mirrored exactly in SQL):
    at-risk n_t counts users with lifetime ≥ t (censored and events
    alike); censorings at t do not reduce survival; steps with d = 0
    carry km unchanged. Exactness: lifetimes, event flags, at-risk
    suffix sums are all integer folds; km is the ONE float chain — an
    ordered product over steps ascending in t, each step one division +
    one multiply of exact-int-derived doubles, evaluated in the SAME
    order by the driver loop and the SQL RECURSIVE CTE, so every km is
    bitwise equal (the ewma_daily_events device).

    Scale shape: per-user (first, last) folds in ONE user-bucket
    exchange; the corpus end is a per-block max gather; (lifetime,
    event) cells are day-bounded → gated driver fold; the km recursion
    is O(steps) driver work at any corpus size."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts"])
    mod = np.int64(n_buckets)

    def user_partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("ts"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        df = pd.DataFrame({"user": b.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64),
            "d": d.to_numpy(zero_copy_only=False)})
        agg = df.groupby("user", as_index=False).agg(
            f=("d", "min"), l=("d", "max"))
        agg["__b"] = (agg["user"].to_numpy(np.int64)
                      % mod).astype(np.int32)
        return pa.Table.from_pandas(agg, preserve_index=False) \
            .replace_schema_metadata(None)

    per_user = ev.map_batches(user_partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(
            lambda g: g.drop(columns="__b").groupby(
                "user", as_index=False).agg(f=("f", "min"),
                                            l=("l", "max")),
            batch_format="pandas").materialize()

    empty = pd.DataFrame({
        "t": pd.Series([], dtype=np.int64),
        "n_risk": pd.Series([], dtype=np.int64),
        "d_events": pd.Series([], dtype=np.int64),
        "c_censored": pd.Series([], dtype=np.int64),
        "km": pd.Series([], dtype=np.float64)})

    def lmax(b: pa.Table) -> pa.Table:
        m = pc.max(b.column("l")).as_py()
        return pa.table({"l": pa.array(
            [] if m is None else [int(m)], pa.int64())})

    le = per_user.map_batches(lmax, batch_format="pyarrow").to_pandas()
    if not len(le):
        return empty
    end = int(le["l"].max())

    def cell_partial(b: pa.Table) -> pa.Table:
        f = b.column("f").to_numpy(zero_copy_only=False)
        last = b.column("l").to_numpy(zero_copy_only=False)
        g = pd.DataFrame({
            "t": last - f,
            "ev": ((end - last) > horizon_days).astype(np.int64)})
        agg = g.groupby("t", as_index=False).agg(
            d=("ev", "sum"), n=("ev", "size"))
        agg["c"] = agg["n"] - agg["d"]
        return pa.Table.from_pandas(agg[["t", "d", "c"]],
                                    preserve_index=False) \
            .replace_schema_metadata(None)

    parts = per_user.map_batches(cell_partial,
                                 batch_format="pyarrow").to_pandas()
    if not len(parts):
        return empty
    cells = parts.groupby("t", as_index=False)[["d", "c"]].sum() \
        .sort_values("t").reset_index(drop=True)
    d = cells["d"].to_numpy(np.int64)
    c = cells["c"].to_numpy(np.int64)
    n_risk = (d + c)[::-1].cumsum()[::-1]
    km_vals = []
    km = 1.0
    for di, ni in zip(d.tolist(), n_risk.tolist()):
        if di:
            km = km * (1.0 - float(di) / float(ni))
        km_vals.append(km)
    return pd.DataFrame({
        "t": cells["t"].astype(np.int64),
        "n_risk": pd.Series(n_risk, dtype=np.int64),
        "d_events": cells["d"].astype(np.int64),
        "c_censored": cells["c"].astype(np.int64),
        "km": pd.Series(km_vals, dtype=np.float64)})


KAPLAN_MEIER_SQL = """
WITH RECURSIVE
pu AS (SELECT user_id,
              CAST(epoch_us(min(ts)) // 86400000000 AS BIGINT) AS f,
              CAST(epoch_us(max(ts)) // 86400000000 AS BIGINT) AS l
       FROM events GROUP BY 1),
ee AS (SELECT max(l) AS e FROM pu),
du AS (SELECT l - f AS t,
              CASE WHEN (SELECT e FROM ee) - l > 7 THEN 1 ELSE 0 END AS ev
       FROM pu),
cells AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
                 CAST(sum(1 - ev) AS BIGINT) AS c
          FROM du GROUP BY 1),
steps AS (SELECT t, d, c,
                 CAST(sum(d + c) OVER (ORDER BY t DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS n_risk,
                 row_number() OVER (ORDER BY t) AS rn
          FROM cells),
rec AS (
  SELECT rn, t, n_risk, d, c,
         CASE WHEN d = 0 THEN 1.0
              ELSE 1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
         END AS km
  FROM steps WHERE rn = 1
  UNION ALL
  SELECT s.rn, s.t, s.n_risk, s.d, s.c,
         CASE WHEN s.d = 0 THEN rec.km
              ELSE rec.km * (1.0 - CAST(s.d AS DOUBLE)
                                   / CAST(s.n_risk AS DOUBLE))
         END
  FROM rec JOIN steps s ON s.rn = rec.rn + 1)
SELECT t, n_risk, d AS d_events, c AS c_censored, km
FROM rec ORDER BY t
"""



# ---- Page trend test across source activity -----------------------------------

def page_trend_event_types(sf_dir: str, block_gate: int = 512):
    """One-row (n_days, k_types, l2, z) — Page's L test for a MONOTONE
    ordering: blocks = calendar days, treatments = event types in
    alphabetical order; L detects a CONSISTENT day-after-day ranking of
    the types (a stable workload mix), which comparing totals cannot —
    totals can match while daily rankings churn. Exactness: per-(day, type)
    counts are calendar-bounded cells; within each day the k counts get
    DOUBLED midranks (2·minrank + ties − 1 ∈ ℤ); L2 = Σ_d Σ_j w_j·r2_dj
    (w = alphabetical ordinal) is an exact integer fold, and with
    E2 = n·k·(k+1)²/2 (always integral) and 4·Var = n·k²·(k+1)·(k²−1)/36,

        z = (L2 − E2) / √(n·k²·(k+1)·(k²−1) / 36.0)

    — one subtraction, one division by a sqrt of one division, all from
    exact integers, bitwise cross-engine (0.0 when k < 2 or n = 0).
    Days with no events count 0 for every type (dense zero-filled
    calendar, the crosscorr convention).

    Scale shape: (day, type) cells → shared gated cell fold; the per-day
    k×k midrank comparison is vectorized over the dense grid."""
    import math

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
    zero = pd.DataFrame({
        "n_days": pd.Series([0], dtype=np.int64),
        "k_types": pd.Series([0], dtype=np.int64),
        "l2": pd.Series([0], dtype=np.int64),
        "z": pd.Series([0.0], dtype=np.float64)})
    if not len(cells):
        return zero
    types = sorted(cells["ty"].unique())
    k = len(types)
    lo, hi = int(cells["d"].min()), int(cells["d"].max())
    n = hi - lo + 1
    grid = np.zeros((n, k), dtype=np.int64)
    tix = {t: i for i, t in enumerate(types)}
    grid[cells["d"].to_numpy(np.int64) - lo,
         [tix[t] for t in cells["ty"]]] = cells["c"].to_numpy(np.int64)
    if k < 2:
        return zero
    # doubled midranks per day: r2 = 2·(# strictly smaller) + ties + 1
    less = (grid[:, None, :] < grid[:, :, None]).sum(axis=2)
    ties = (grid[:, None, :] == grid[:, :, None]).sum(axis=2)
    r2 = 2 * less + ties + 1
    w = np.arange(1, k + 1, dtype=np.int64)
    l2 = int((r2 * w[None, :]).sum())
    e2 = n * k * (k + 1) * (k + 1) // 2
    var4 = n * k * k * (k + 1) * (k * k - 1)
    z = 0.0 if var4 == 0 else \
        float(l2 - e2) / math.sqrt(float(var4) / 36.0)
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype=np.int64),
        "k_types": pd.Series([k], dtype=np.int64),
        "l2": pd.Series([l2], dtype=np.int64),
        "z": pd.Series([z], dtype=np.float64)})


PAGE_TREND_SQL = """
WITH b AS (SELECT CAST(epoch_us(min(ts)) // 86400000000 AS BIGINT) AS lo,
                  CAST(epoch_us(max(ts)) // 86400000000 AS BIGINT) AS hi
           FROM events),
cc AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
              event_type AS ty, CAST(count(*) AS BIGINT) AS c
       FROM events GROUP BY 1, 2),
ty AS (SELECT DISTINCT event_type AS ty FROM events),
wt AS (SELECT ty, CAST(row_number() OVER (ORDER BY ty) AS BIGINT) AS w
       FROM ty),
grid AS (SELECT cal.d, wt.ty, wt.w, COALESCE(cc.c, 0) AS c
         FROM (SELECT unnest(generate_series(b.lo, b.hi)) AS d FROM b) cal
         CROSS JOIN wt
         LEFT JOIN cc ON cc.d = cal.d AND cc.ty = wt.ty),
rk AS (SELECT d, ty, w, c,
              CAST(2 * rank() OVER (PARTITION BY d ORDER BY c)
                   + count(*) OVER (PARTITION BY d, c) - 1 AS BIGINT)
                AS r2
       FROM grid),
agg AS (SELECT CAST(count(DISTINCT d) AS HUGEINT) AS n,
               (SELECT CAST(count(*) AS HUGEINT) FROM ty) AS k,
               CAST(sum(w * r2) AS HUGEINT) AS l2
        FROM rk)
SELECT CAST(n AS BIGINT) AS n_days, CAST(k AS BIGINT) AS k_types,
       CAST(l2 AS BIGINT) AS l2,
       CASE WHEN k < 2 OR n * k * k * (k + 1) * (k * k - 1) = 0 THEN 0.0
            ELSE CAST(l2 - n * k * (k + 1) * (k + 1) // 2 AS DOUBLE)
                 / sqrt(CAST(n * k * k * (k + 1) * (k * k - 1) AS DOUBLE)
                        / 36.0)
       END AS z
FROM agg
"""



# ---- Tukey median polish of the weekday × hour activity grid -----------------

def median_polish_weekday_hour(sf_dir: str, sweeps: int = 2,
                               block_gate: int = 512):
    """(dow, hour, c, residual) — Tukey's median polish of the 7×24
    (weekday × hour-of-day) event-count grid: iteratively remove row
    (weekday) and column (hour) median effects, leaving residuals that
    expose cells breaking the separable day-profile × hour-profile model
    (the robust two-way decomposition ANOVA can't give under outliers).
    All-integer: counts are integers; every subtracted median uses the
    quantile_disc convention (sorted element at ceil(n/2)−1, 0-based —
    an ACTUAL element, so residuals stay integers through every sweep);
    ``sweeps`` full (row, column) passes, fixed, so both engines
    terminate in the identical state. dow = epoch-day mod 7,
    hour = epoch-hour mod 24 (engine-neutral spellings).

    Scale shape: the (dow, hour) cells are a 168-cell calendar-bounded
    fold; the polish is O(sweeps·grid) driver work at any corpus
    size."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                     pa.int64())
        day = pc.divide(us, 86_400_000_000)
        dow = pc.subtract(day, pc.multiply(pc.divide(day, 7), 7))
        hr = pc.divide(us, 3_600_000_000)
        hour = pc.subtract(hr, pc.multiply(pc.divide(hr, 24), 24))
        t = pa.table({"dow": dow, "hour": hour})
        g = t.group_by(["dow", "hour"]).aggregate([("dow", "count")])
        return pa.table({"dow": pc.cast(g.column("dow"), pa.int64()),
                         "hour": pc.cast(g.column("hour"), pa.int64()),
                         "c": pc.cast(g.column("dow_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["dow", "hour"], sums=["c"],
                       block_gate=block_gate)
    empty = pd.DataFrame({
        "dow": pd.Series([], dtype=np.int64),
        "hour": pd.Series([], dtype=np.int64),
        "c": pd.Series([], dtype=np.int64),
        "residual": pd.Series([], dtype=np.int64)})
    if not len(cells):
        return empty
    grid = np.zeros((7, 24), dtype=np.int64)
    grid[cells["dow"].to_numpy(np.int64),
         cells["hour"].to_numpy(np.int64)] = cells["c"].to_numpy(np.int64)
    resid = grid.copy()

    def med(v: np.ndarray) -> int:
        # quantile_disc(0.5): sorted element at ceil(n/2)-1 (0-based)
        s = np.sort(v)
        return int(s[-(-len(s) // 2) - 1])

    for _ in range(sweeps):
        for i in range(7):
            resid[i, :] -= med(resid[i, :])
        for j in range(24):
            resid[:, j] -= med(resid[:, j])
    dows, hours = np.meshgrid(np.arange(7), np.arange(24), indexing="ij")
    return pd.DataFrame({
        "dow": pd.Series(dows.ravel(), dtype=np.int64),
        "hour": pd.Series(hours.ravel(), dtype=np.int64),
        "c": pd.Series(grid.ravel(), dtype=np.int64),
        "residual": pd.Series(resid.ravel(), dtype=np.int64)})


_POLISH_ROW = """
r{k} AS (SELECT dow, hour, c, r - m AS r
         FROM (SELECT g.dow, g.hour, g.c, g.r,
                      quantile_disc(g.r, 0.5)
                        OVER (PARTITION BY g.dow) AS m
               FROM {src} g) t),"""

_POLISH_COL = """
c{k} AS (SELECT dow, hour, c, r - m AS r
         FROM (SELECT g.dow, g.hour, g.c, g.r,
                      quantile_disc(g.r, 0.5)
                        OVER (PARTITION BY g.hour) AS m
               FROM r{k} g) t),"""

MEDIAN_POLISH_SQL = ("""
WITH cc AS (SELECT CAST((epoch_us(ts) // 86400000000)
                        - ((epoch_us(ts) // 86400000000) // 7) * 7
                        AS BIGINT) AS dow,
                   CAST((epoch_us(ts) // 3600000000)
                        - ((epoch_us(ts) // 3600000000) // 24) * 24
                        AS BIGINT) AS hour,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2),
g0 AS (SELECT d.dow, h.hour, COALESCE(cc.c, 0) AS c,
              COALESCE(cc.c, 0) AS r
       FROM (SELECT unnest(generate_series(0, 6)) AS dow) d
       CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS hour) h
       LEFT JOIN cc USING (dow, hour)),"""
                     + _POLISH_ROW.format(k=1, src="g0")
                     + _POLISH_COL.format(k=1)
                     + _POLISH_ROW.format(k=2, src="c1")
                     + _POLISH_COL.format(k=2)
                     + """
final AS (SELECT dow, hour, c, r FROM c2)
SELECT dow, hour, c, r AS residual FROM final ORDER BY dow, hour
""")



# ---- log-rank test between user cohorts --------------------------------------

def logrank_first_touch_users(sf_dir: str, horizon_days: int = 7,
                              n_buckets: int = 64):
    """One-row (n_steps, o1, e1, v, z) — the log-rank test comparing the
    survival (lifetime-to-churn) of two user cohorts split by FIRST-touch
    day class (epoch-day mod 7 ≥ 5, an engine-neutral 2-of-7 day-class
    split): does acquisition day-class predict retention? The two-sample
    extension of :func:`kaplan_meier_users`, sharing its lifetime /
    censoring conventions. At each distinct lifetime t with d_t > 0
    events (d1 in cohort 1), n1/n2 at risk and n = n1+n2:

        O1 = Σ d1_t                       (exact integer)
        E1 = Σ n1_t·d_t / n_t             V = Σ n1·n2·d·(n−d) / (n²(n−1))

    E1 and V are the float chains — ordered sums over steps ascending in
    t, one division each per step from exact integers, accumulated in
    the SAME order by the driver loop and the SQL RECURSIVE CTE (the
    kaplan_meier device), so z = (O1 − E1)/√V is bitwise cross-engine
    (0.0 when V = 0; variance terms with n_t ≤ 1 contribute 0).

    Scale shape: per-user (first, last) folds in ONE user-bucket
    exchange; (lifetime, cohort, event) cells are day-bounded; the
    recursion is O(steps) driver work."""
    import math

    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts"])
    mod = np.int64(n_buckets)

    def user_partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("ts"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        df = pd.DataFrame({"user": b.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64),
            "d": d.to_numpy(zero_copy_only=False)})
        agg = df.groupby("user", as_index=False).agg(
            f=("d", "min"), l=("d", "max"))
        agg["__b"] = (agg["user"].to_numpy(np.int64)
                      % mod).astype(np.int32)
        return pa.Table.from_pandas(agg, preserve_index=False) \
            .replace_schema_metadata(None)

    per_user = ev.map_batches(user_partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(
            lambda g: g.drop(columns="__b").groupby(
                "user", as_index=False).agg(f=("f", "min"),
                                            l=("l", "max")),
            batch_format="pandas").materialize()

    zero = pd.DataFrame({
        "n_steps": pd.Series([0], dtype=np.int64),
        "o1": pd.Series([0], dtype=np.int64),
        "e1": pd.Series([0.0], dtype=np.float64),
        "v": pd.Series([0.0], dtype=np.float64),
        "z": pd.Series([0.0], dtype=np.float64)})

    def lmax(b: pa.Table) -> pa.Table:
        m = pc.max(b.column("l")).as_py()
        return pa.table({"l": pa.array(
            [] if m is None else [int(m)], pa.int64())})

    le = per_user.map_batches(lmax, batch_format="pyarrow").to_pandas()
    if not len(le):
        return zero
    end = int(le["l"].max())

    def cell_partial(b: pa.Table) -> pa.Table:
        f = b.column("f").to_numpy(zero_copy_only=False)
        last = b.column("l").to_numpy(zero_copy_only=False)
        g = pd.DataFrame({
            "t": last - f,
            "g1": ((f - (f // 7) * 7) >= 5).astype(np.int64),
            "ev": ((end - last) > horizon_days).astype(np.int64)})
        agg = g.groupby(["t", "g1"], as_index=False).agg(
            d=("ev", "sum"), n=("ev", "size"))
        return pa.Table.from_pandas(agg, preserve_index=False) \
            .replace_schema_metadata(None)

    parts = per_user.map_batches(cell_partial,
                                 batch_format="pyarrow").to_pandas()
    if not len(parts):
        return zero
    cells = parts.groupby(["t", "g1"], as_index=False)[["d", "n"]].sum()
    piv_d = cells.pivot_table(index="t", columns="g1", values="d",
                              aggfunc="sum", fill_value=0).sort_index()
    piv_n = cells.pivot_table(index="t", columns="g1", values="n",
                              aggfunc="sum", fill_value=0).sort_index()
    d1 = (piv_d[1].to_numpy(np.int64) if 1 in piv_d
          else np.zeros(len(piv_d), np.int64))
    d0 = (piv_d[0].to_numpy(np.int64) if 0 in piv_d
          else np.zeros(len(piv_d), np.int64))
    c1 = (piv_n[1].to_numpy(np.int64) if 1 in piv_n
          else np.zeros(len(piv_n), np.int64))
    c0 = (piv_n[0].to_numpy(np.int64) if 0 in piv_n
          else np.zeros(len(piv_n), np.int64))
    n1 = c1[::-1].cumsum()[::-1]      # at-risk in cohort 1 (g1 = 1)
    n2 = c0[::-1].cumsum()[::-1]
    o1 = 0
    e1 = 0.0
    v = 0.0
    n_steps = 0
    for i in range(len(d1)):
        dt = int(d1[i] + d0[i])
        if dt == 0:
            continue
        n_steps += 1
        nt = int(n1[i] + n2[i])
        o1 += int(d1[i])
        e1 = e1 + float(int(n1[i]) * dt) / float(nt)
        if nt > 1:
            v = v + float(int(n1[i]) * int(n2[i]) * dt * (nt - dt)) \
                / float(nt * nt * (nt - 1))
    z = 0.0 if v == 0.0 else (float(o1) - e1) / math.sqrt(v)
    return pd.DataFrame({
        "n_steps": pd.Series([n_steps], dtype=np.int64),
        "o1": pd.Series([o1], dtype=np.int64),
        "e1": pd.Series([e1], dtype=np.float64),
        "v": pd.Series([v], dtype=np.float64),
        "z": pd.Series([z], dtype=np.float64)})


LOGRANK_SQL = """
WITH RECURSIVE
pu AS (SELECT user_id,
              CAST(epoch_us(min(ts)) // 86400000000 AS BIGINT) AS f,
              CAST(epoch_us(max(ts)) // 86400000000 AS BIGINT) AS l
       FROM events GROUP BY 1),
ee AS (SELECT max(l) AS e FROM pu),
du AS (SELECT l - f AS t,
              CASE WHEN f - (f // 7) * 7 >= 5 THEN 1 ELSE 0 END AS g1,
              CASE WHEN (SELECT e FROM ee) - l > 7 THEN 1 ELSE 0 END AS ev
       FROM pu),
cells AS (SELECT t,
                 CAST(COALESCE(sum(ev) FILTER (WHERE g1 = 1), 0)
                      AS BIGINT) AS d1,
                 CAST(COALESCE(sum(ev) FILTER (WHERE g1 = 0), 0)
                      AS BIGINT) AS d0,
                 CAST(count(*) FILTER (WHERE g1 = 1) AS BIGINT) AS c1,
                 CAST(count(*) FILTER (WHERE g1 = 0) AS BIGINT) AS c0
          FROM du GROUP BY 1),
atrisk AS (SELECT t, d1, d0,
                  CAST(sum(c1) OVER (ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS n1,
                  CAST(sum(c0) OVER (ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS n2
           FROM cells),
steps AS (SELECT t, d1, d0, n1, n2, d1 + d0 AS dt, n1 + n2 AS nt,
                 row_number() OVER (ORDER BY t) AS rn
          FROM atrisk WHERE d1 + d0 > 0),
rec AS (
  SELECT rn, d1,
         CAST(n1 * dt AS DOUBLE) / CAST(nt AS DOUBLE) AS e1,
         CASE WHEN nt > 1
              THEN CAST(n1 * n2 * dt * (nt - dt) AS DOUBLE)
                   / CAST(nt * nt * (nt - 1) AS DOUBLE)
              ELSE 0.0 END AS v
  FROM steps WHERE rn = 1
  UNION ALL
  SELECT s.rn, s.d1,
         rec.e1 + CAST(s.n1 * s.dt AS DOUBLE) / CAST(s.nt AS DOUBLE),
         rec.v + CASE WHEN s.nt > 1
                      THEN CAST(s.n1 * s.n2 * s.dt * (s.nt - s.dt)
                                AS DOUBLE)
                           / CAST(s.nt * s.nt * (s.nt - 1) AS DOUBLE)
                      ELSE 0.0 END
  FROM rec JOIN steps s ON s.rn = rec.rn + 1),
fin AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM steps) AS n_steps,
               (SELECT CAST(COALESCE(sum(d1), 0) AS BIGINT) FROM steps)
                 AS o1,
               (SELECT e1 FROM rec ORDER BY rn DESC LIMIT 1) AS e1,
               (SELECT v FROM rec ORDER BY rn DESC LIMIT 1) AS v)
SELECT COALESCE(n_steps, 0) AS n_steps, COALESCE(o1, 0) AS o1,
       COALESCE(e1, 0.0) AS e1, COALESCE(v, 0.0) AS v,
       CASE WHEN COALESCE(v, 0.0) = 0.0 THEN 0.0
            ELSE (CAST(o1 AS DOUBLE) - e1) / sqrt(v) END AS z
FROM fin
"""
