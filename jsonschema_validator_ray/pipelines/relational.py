"""Relational composites round 2 — the TPC-H shapes the suite did not yet
exercise, plus set-op and gaps-and-islands patterns over the events log.

Every query follows the repo's scale rules: facts are pre-aggregated per
batch before any exchange, keys are hash-bucketed (never one Ray group per
key), small derived sets broadcast with documented gates, and every float
that reaches an oracle comparison is integer-scaled (cents / ppm / counts)
so both engines do identical arithmetic.

New shapes covered here (each is a classic relational pattern):
- Q13: aggregate-of-an-aggregate with LEFT-JOIN zeros
  (:func:`order_count_distribution`);
- Q18: HAVING-filtered keys re-joined into the fact scan
  (:func:`big_orders`);
- Q4: EXISTS semi-join feeding a grouped count (:func:`priority_counts`);
- Q22: scalar-subquery broadcast predicate + NOT-EXISTS anti join
  (:func:`rich_quiet_customers`);
- INTERSECT of two distinct key sets (:func:`click_purchase_days`);
- gaps-and-islands longest consecutive-day streak
  (:func:`longest_streak_users`);
- ordered grouped string concatenation (:func:`first_events_path`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sources.parquet import read_dim_table, read_parquet

_US_PER_DAY = 86_400_000_000


def _epoch_us(col: "pa.ChunkedArray") -> "pa.ChunkedArray":
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())


# ---- Q13 shape: distribution of per-customer order counts ------------------


def order_count_distribution(sf_dir: str, block_gate: int = 512):
    """(c_count, n_cust) — how many customers placed exactly c_count orders,
    INCLUDING zero-order customers (the LEFT JOIN subtlety of TPC-H Q13).

    Shape: aggregate of an aggregate. Orders pre-reduce per batch to
    (custkey, n) partial counts; customer contributes marker rows (n = 0).
    ONE hash-bucket exchange co-locates each custkey's partials with its
    marker; each bucket folds counts per customer at pandas C speed and
    emits its LOCAL (c_count, n_cust) histogram, so the second aggregate's
    input is buckets × distinct-counts rows (~KBs at any corpus size) and
    folds driver-side. Order keys referencing no customer drop, matching
    the LEFT JOIN direction.

    Perf shape (round-4 lever): below the 512-block gate the per-batch
    (custkey, n) partials fold DRIVER-side out of one FUSED read+reduce
    orders scan (customer is a driver-side dimension) — the exchange costs
    ~2-3 s of pure scheduling at this block count for KBs of real work.
    Past the gate the exchange path runs unchanged."""
    from ..sources.parquet import FusedParquetScan, read_dim_table

    o_scan = FusedParquetScan(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey"])
    if o_scan.num_blocks() <= block_gate:
        def o_part(b: pa.Table) -> pa.Table:
            vc = b.column("o_custkey").combine_chunks().value_counts()
            return pa.table({
                "custkey": pc.struct_field(vc, "values"),
                "n": pc.cast(pc.struct_field(vc, "counts"), pa.int64())})

        parts = o_scan.map_batches(o_part).to_pandas()
        dim = read_dim_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey"])
        ckeys = dim.column("c_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        per_cust = pd.Series(np.zeros(len(ckeys), np.int64), index=ckeys)
        if len(parts):
            folded = parts.groupby("custkey", sort=False)["n"].sum()
            folded = folded[folded.index.isin(per_cust.index)]
            per_cust = per_cust.add(folded, fill_value=0).astype(np.int64)
        hist = per_cust.groupby(per_cust).size()
        return pd.DataFrame({
            "c_count": hist.index.to_numpy().astype(np.int64),
            "n_cust": hist.to_numpy().astype(np.int64),
        }).sort_values(["n_cust", "c_count"], ascending=[False, False],
                       kind="mergesort").reset_index(drop=True)

    orders = read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    cust = read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def o_partial(b: pa.Table) -> pa.Table:
        vc = b.column("o_custkey").combine_chunks().value_counts()
        keys = pc.struct_field(vc, "values")
        return pa.table({
            "custkey": keys,
            "n": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
            "is_cust": pa.nulls(len(keys), pa.int8()).fill_null(0),
            "__b": pc.cast(pc.bit_wise_and(keys, 31), pa.int32()),
        })

    def c_partial(b: pa.Table) -> pa.Table:
        keys = b.column("c_custkey")
        n = b.num_rows
        return pa.table({
            "custkey": keys,
            "n": pa.nulls(n, pa.int64()).fill_null(0),
            "is_cust": pa.nulls(n, pa.int8()).fill_null(1),
            "__b": pc.cast(pc.bit_wise_and(keys, 31), pa.int32()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("custkey", sort=False).agg(
            c_count=("n", "sum"), has=("is_cust", "max"))
        agg = agg[agg["has"] == 1]
        hist = agg.groupby("c_count", sort=False).size()
        return pd.DataFrame({
            "c_count": hist.index.to_numpy().astype(np.int64),
            "n_cust": hist.to_numpy().astype(np.int64),
        })

    partial_hists = (
        orders.map_batches(o_partial, batch_format="pyarrow")
        .union(cust.map_batches(c_partial, batch_format="pyarrow"))
        .groupby("__b").map_groups(per_bucket, batch_format="pandas"))
    # final fold: buckets × distinct counts (tiny) — driver-side
    df = partial_hists.to_pandas()
    if "c_count" not in df.columns:          # empty input loses block schema
        return pd.DataFrame({"c_count": pd.Series([], dtype=np.int64),
                             "n_cust": pd.Series([], dtype=np.int64)})
    out = df.groupby("c_count", as_index=False)["n_cust"].sum()
    return out.sort_values(["n_cust", "c_count"], ascending=[False, False],
                           kind="mergesort").reset_index(drop=True)


ORDER_COUNT_DIST_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS n_cust FROM (
  SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey)
GROUP BY c_count ORDER BY n_cust DESC, c_count DESC
"""


# ---- Q18 shape: HAVING-filtered keys re-joined into the fact scan ----------


def big_orders(sf_dir: str, min_qty_cents: int = 25_000,
               driver_limit: int = 2_000_000, block_gate: int = 512):
    """Orders whose lineitems total more than 250 units of quantity, with
    the customer name attached (TPC-H Q18's large-volume-customer shape).

    Shape: grouped HAVING filter producing a SMALL hot-key set, re-joined
    into the fact table. Lineitem pre-reduces (l_orderkey, qty_cents) per
    batch, one hash-bucket exchange folds exact per-order totals and keeps
    only totals past the threshold — a ~1 %-selectivity set that is
    gathered once and broadcast into the orders scan (`ray.put`, probed
    with Arrow ``index_in``: semi filter + attach in one kernel pass). The
    customer dimension broadcasts the same way for the name. Past
    ``driver_limit`` surviving orders the gather would not fit a driver
    heap; the documented fallback is stages/joins.bucketed_join of orders
    against the surviving totals (same result, one more exchange).

    Quantities are integer cents before any accumulation, so the HAVING
    boundary is exact in both engines.

    Perf shape (round-4 lever): below the 512-block gate the per-batch
    (orderkey, cents) partials fold DRIVER-side out of one FUSED
    read+reduce scan — Ray's sort-based groupby exchange costs ~2 s of
    pure scheduling at this block count (CLAUDE.md), triple the fold's
    real work. Past the gate (couldn't hold the partials in a driver
    heap) the original hash-bucket exchange runs unchanged."""
    import ray

    from ..sources.parquet import FusedParquetScan
    from ..stages.joins import bucketed_join

    def li_partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "qc": pc.cast(pc.round(pc.multiply(b.column("l_quantity"), 100)),
                          pa.int64()),
        })
        g = t.group_by("l_orderkey").aggregate([("qc", "sum")])
        keys = g.column("l_orderkey")
        return pa.table({
            "l_orderkey": keys,
            "qc_sum": g.column("qc_sum"),
            "__b": pc.cast(pc.bit_wise_and(keys, 31), pa.int32()),
        })

    scan = FusedParquetScan(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_quantity"])
    joined = None
    if scan.num_blocks() <= block_gate:
        parts = scan.map_batches(li_partial).to_pandas()
        if len(parts):
            tot = parts.groupby("l_orderkey", sort=False)["qc_sum"].sum()
            tot = tot[tot > min_qty_cents]
        else:
            tot = pd.Series([], dtype=np.int64)
        hot_t = pa.table({
            "o_orderkey": pa.array(
                np.asarray(tot.index, dtype=np.int64)),
            "sum_qty_cents": pa.array(tot.to_numpy().astype(np.int64)),
        })
        if hot_t.num_rows > driver_limit:
            raise ValueError(
                f"big_orders hot set {hot_t.num_rows} rows exceeds "
                f"driver_limit={driver_limit} on the driver-fold path")
    else:
        li = read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=["l_orderkey", "l_quantity"])

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            tot = g.groupby("l_orderkey", sort=False)["qc_sum"].sum()
            tot = tot[tot > min_qty_cents]
            return pd.DataFrame({
                "o_orderkey": tot.index.to_numpy().astype(np.int64),
                "sum_qty_cents": tot.to_numpy().astype(np.int64),
            })

        hot = (li.map_batches(li_partial, batch_format="pyarrow")
               .groupby("__b").map_groups(per_bucket, batch_format="pandas")
               ).materialize()
        orders_ds = read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"])
        if hot.count() > driver_limit:       # scale fallback: join, no gather
            joined = bucketed_join(orders_ds, hot, "o_orderkey",
                                   num_buckets=32)
            hot_t = None
        else:
            # empty buckets emit null-typed blocks — drop before concat
            tabs = [t for t in ray.get(hot.to_arrow_refs()) if t.num_rows]
            hot_t = (pa.concat_tables(tabs).combine_chunks() if tabs else
                     pa.table({"o_orderkey": pa.array([], pa.int64()),
                               "sum_qty_cents": pa.array([], pa.int64())}))
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey", "o_totalprice"])

    # driver_limit gates the HOT-ORDER set above; the customer NAME map is
    # a genuine dimension and broadcasts under the standard dim gate
    dim = read_dim_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    ref = ray.put((None if hot_t is None else hot_t.column("o_orderkey"),
                   None if hot_t is None else hot_t.column("sum_qty_cents"),
                   dim.column("c_custkey").combine_chunks(),
                   dim.column("c_name").combine_chunks()))

    class Attach:
        def __init__(self, r):
            self.hot_keys, self.hot_qty, self.ckeys, self.cnames = ray.get(r) \
                if isinstance(r, ray.ObjectRef) else r

        def __call__(self, b: pa.Table) -> pa.Table:
            cols = {"o_orderkey": b.column("o_orderkey"),
                    "o_custkey": b.column("o_custkey"),
                    "total_cents": pc.cast(pc.round(pc.multiply(
                        b.column("o_totalprice"), 100)), pa.int64())}
            if self.hot_keys is not None:
                idx = pc.index_in(b.column("o_orderkey"),
                                  value_set=self.hot_keys)
                live = pc.is_valid(idx)
                b2 = pa.table(cols).append_column(
                    "sum_qty_cents", self.hot_qty.take(idx))
                b2 = b2.filter(live)
            else:                             # join path already attached it
                b2 = pa.table({**cols,
                               "sum_qty_cents": b.column("sum_qty_cents")})
            cidx = pc.index_in(b2.column("o_custkey"), value_set=self.ckeys)
            return b2.append_column("c_name", self.cnames.take(cidx))

    if joined is None and hot_t is not None \
            and scan.num_blocks() <= block_gate:
        # fast path: fuse the attach into the orders read as well — the
        # broadcast state pickles once per worker into the fused tasks
        o_scan = FusedParquetScan(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"])
        return o_scan.map_batches(Attach, fn_constructor_args=(ray.get(ref),))
    base = orders if joined is None else joined
    return base.map_batches(Attach, fn_constructor_args=(ref,),
                            concurrency=(1, 2), batch_format="pyarrow")


BIG_ORDERS_SQL = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
           AS sum_qty_cents
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity*100) AS BIGINT)) > 25000)
SELECT o.o_orderkey, o.o_custkey,
       CAST(round(o.o_totalprice*100) AS BIGINT) AS total_cents,
       b.sum_qty_cents, c.c_name
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


# ---- Q4 shape: EXISTS semi-join feeding a grouped count ---------------------


def priority_counts(sf_dir: str, block_gate: int = 512):
    """(o_orderpriority, n_orders) over a two-year order window, counting
    only orders with at least one returned ('R') lineitem — TPC-H Q4's
    EXISTS shape: a predicate-filtered fact scan reduced to DISTINCT keys,
    semi-joined into the probe side, then a tiny grouped count.

    Perf shape (round-4 lever): below the 512-block gate the EXISTS side
    reduces to per-batch DISTINCT returned orderkeys out of one FUSED
    read+reduce scan, folds driver-side (bounded by the distinct returned
    order count), and broadcasts as a sorted array into a second fused
    orders scan that window-filters, membership-tests (searchsorted) and
    pre-counts priorities in the same task — two fused executions, zero
    exchanges. Past the gate the original SHUFFLE semi join runs
    unchanged: both sides exchange keys-only on the hash bucket — the
    100-TB path when the EXISTS side's key set outgrows a worker heap
    (the broadcast semi strategy is exercised by parts_in_lineitem)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.joins import semi_join

    lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1998-01-01"), pa.timestamp("us"))

    def window(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("o_orderdate"), pa.timestamp("us"))
        keep = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        return b.filter(keep)

    def count_partial(b: pa.Table) -> pa.Table:
        vc = b.column("o_orderpriority").combine_chunks().value_counts()
        return pa.table({
            "o_orderpriority": pc.struct_field(vc, "values"),
            "n": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
        })

    li_scan = FusedParquetScan(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_returnflag"])
    o_scan = FusedParquetScan(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    if li_scan.num_blocks() <= block_gate \
            and o_scan.num_blocks() <= block_gate:
        def r_partial(b: pa.Table) -> pa.Table:
            keep = pc.equal(b.column("l_returnflag"), "R")
            return pa.table({"k": pc.unique(
                b.column("l_orderkey").filter(keep))})

        kp = li_scan.map_batches(r_partial).to_pandas()
        keys = np.unique(kp["k"].to_numpy().astype(np.int64)) \
            if len(kp) else np.array([], dtype=np.int64)

        class WindowSemiCount:
            """Window filter + broadcast EXISTS + priority pre-count in
            the fused orders task (keys pickle once per worker)."""

            def __init__(self, ks):
                self.keys = ks

            def __call__(self, b: pa.Table) -> pa.Table:
                b = window(b)
                ok = b.column("o_orderkey").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(self.keys, ok)
                pos[pos == len(self.keys)] = 0
                hit = (len(self.keys) > 0) & (self.keys[pos] == ok)
                return count_partial(b.filter(pa.array(hit)))

        df = o_scan.map_batches(
            WindowSemiCount, fn_constructor_args=(keys,)).to_pandas()
    else:
        orders = read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).map_batches(window, batch_format="pyarrow")
        returned = read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag"]
        ).filter(expr="l_returnflag == 'R'")
        hits = semi_join(orders, returned, "o_orderkey",
                         right_on="l_orderkey",
                         strategy="shuffle", num_buckets=32)
        df = hits.map_batches(count_partial,
                              batch_format="pyarrow").to_pandas()
    if "o_orderpriority" not in df.columns:
        return pd.DataFrame({"o_orderpriority": pd.Series([], dtype=object),
                             "n_orders": pd.Series([], dtype=np.int64)})
    out = df.groupby("o_orderpriority", as_index=False)["n"].sum()
    out = out.rename(columns={"n": "n_orders"})
    return out.sort_values("o_orderpriority").reset_index(drop=True)


PRIORITY_COUNTS_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---- Q22 shape: scalar-subquery broadcast + NOT EXISTS ----------------------


def rich_quiet_customers(sf_dir: str, block_gate: int = 512):
    """(c_nationkey, n_cust, bal_cents) of customers whose balance is above
    the positive-balance average and who never placed an URGENT order —
    TPC-H Q22's shape: a global scalar aggregate broadcast into a filter,
    then a NOT-EXISTS anti join, then a grouped count.

    The above-average predicate is FULLY INTEGER (CLAUDE.md float rule):
    ``bal_cents · n_pos > sum_pos_cents`` is the same comparison as
    ``bal > avg`` with no float ever materialized, so boundary customers
    cannot flip between engines. Pass 1 folds (n_pos, sum_pos) from
    per-batch partials driver-side (two ints); pass 2 filters and
    anti-joins on the shuffle path (urgent custkeys are keys-only).

    Perf shape (round-4 lever): below the 512-block gate the urgent
    custkey set reduces to per-batch DISTINCT keys out of one FUSED
    read+reduce orders scan and folds driver-side (bounded by the
    customer count — customer is already a driver-side dimension here),
    so the NOT EXISTS becomes one vectorized ``isin`` on the rich set and
    the whole query is ONE Ray execution. Past the gate the original
    shuffle anti join runs unchanged (keys-only exchange)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.joins import anti_join

    # customer is a DIMENSION: the scalar (n_pos, sum_pos) fold reads it
    # once driver-side (broadcast-small pattern, loud gate inside
    # read_dim_table) instead of paying a Ray execution's scheduling floor
    dim = read_dim_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey", "c_acctbal"])
    cents_all = pc.cast(pc.round(pc.multiply(
        dim.column("c_acctbal"), 100)), pa.int64())
    pos = pc.filter(cents_all, pc.greater(cents_all, 0))
    n_pos = len(pos)
    sum_pos = int(pc.sum(pos).as_py() or 0)
    # the fully-integer above-average filter applies driver-side too —
    # only the (small) rich set enters the distributed anti join
    rich_t = pa.table({"c_custkey": dim.column("c_custkey"),
                       "c_nationkey": dim.column("c_nationkey"),
                       "bal_cents": cents_all}).filter(
        pc.greater(pc.multiply(cents_all, n_pos), sum_pos))

    def nation_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"c_nationkey": pc.cast(b.column("c_nationkey"),
                                             pa.int32()),
                      "bal_cents": b.column("bal_cents")})
        g = t.group_by("c_nationkey").aggregate(
            [("bal_cents", "sum"), ("bal_cents", "count")])
        return pa.table({"c_nationkey": g.column("c_nationkey"),
                         "bal": g.column("bal_cents_sum"),
                         "n": pc.cast(g.column("bal_cents_count"),
                                      pa.int64())})

    o_scan = FusedParquetScan(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_orderpriority"])
    if o_scan.num_blocks() <= block_gate:
        def u_partial(b: pa.Table) -> pa.Table:
            keep = pc.equal(b.column("o_orderpriority"), "1-URGENT")
            return pa.table({"k": pc.unique(
                b.column("o_custkey").filter(keep))})

        kp = o_scan.map_batches(u_partial).to_pandas()
        urgent_keys = pa.array(np.unique(
            kp["k"].to_numpy().astype(np.int64))) if len(kp) \
            else pa.array([], pa.int64())
        quiet_t = rich_t.filter(pc.is_null(pc.index_in(
            rich_t.column("c_custkey"), value_set=urgent_keys)))
        df = nation_partial(quiet_t).to_pandas()
    else:
        urgent = read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderpriority"]
        ).filter(expr="o_orderpriority == '1-URGENT'")
        quiet = anti_join(ray.data.from_arrow(rich_t),
                          urgent, "c_custkey", right_on="o_custkey",
                          strategy="shuffle", num_buckets=32)
        df = quiet.map_batches(nation_partial,
                               batch_format="pyarrow").to_pandas()
    if "c_nationkey" not in df.columns:
        return pd.DataFrame({"c_nationkey": pd.Series([], dtype=np.int32),
                             "n_cust": pd.Series([], dtype=np.int64),
                             "bal_cents": pd.Series([], dtype=np.int64)})
    out = df.groupby("c_nationkey", as_index=False).agg(
        n_cust=("n", "sum"), bal_cents=("bal", "sum"))
    out["c_nationkey"] = out["c_nationkey"].astype(np.int32)
    return out.sort_values("c_nationkey").reset_index(drop=True)


RICH_QUIET_SQL = """
WITH t AS (SELECT count(*) AS n_pos,
                  sum(CAST(round(c_acctbal*100) AS BIGINT)) AS sum_pos
           FROM customer WHERE CAST(round(c_acctbal*100) AS BIGINT) > 0)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
FROM customer c, t
WHERE CAST(round(c_acctbal*100) AS BIGINT) * t.n_pos > t.sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey ORDER BY c_nationkey
"""


# ---- INTERSECT: days where a user both clicked and purchased ----------------


def click_purchase_days(sf_dir: str):
    """(user_id, day) pairs active on BOTH sides — the set-intersection
    shape (SQL INTERSECT) between two DISTINCT key sets drawn from the same
    log. Each batch pre-reduces to distinct (user, day) rows carrying two
    0/1 side flags (an Arrow group-by max — the partial of the OR-fold);
    ONE hash-bucket exchange on user co-locates each pair's partials and
    the bucket fold keeps pairs whose both flags reached 1. Days are
    integer epoch days (timestamp µs // 86400e6) so the comparison is
    exact."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        et = b.column("event_type")
        keep = pc.or_(pc.equal(et, "click"), pc.equal(et, "purchase"))
        b = b.filter(keep)
        day = pc.divide(_epoch_us(b.column("ts")), _US_PER_DAY)
        is_p = pc.cast(pc.equal(b.column("event_type"), "purchase"),
                       pa.int8())
        t = pa.table({"user_id": b.column("user_id"), "day": day,
                      "p": is_p,
                      "c": pc.subtract(pa.scalar(1, pa.int8()), is_p)})
        g = t.group_by(["user_id", "day"]).aggregate(
            [("p", "max"), ("c", "max")])
        keys = g.column("user_id")
        return pa.table({
            "user_id": keys, "day": g.column("day"),
            "p": g.column("p_max"), "c": g.column("c_max"),
            "__b": pc.cast(pc.bit_wise_and(keys, 31), pa.int32()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["user_id", "day"], sort=False).agg(
            p=("p", "max"), c=("c", "max"))
        agg = agg[(agg["p"] == 1) & (agg["c"] == 1)]
        idx = agg.index.to_frame(index=False)
        return pd.DataFrame({
            "user_id": idx["user_id"].to_numpy().astype(np.int64),
            "day": idx["day"].to_numpy().astype(np.int64),
        })

    return ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas")


CLICK_PURCHASE_DAYS_SQL = """
SELECT user_id, epoch_us(ts) // 86400000000 AS day
FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id, epoch_us(ts) // 86400000000 AS day
FROM events WHERE event_type = 'purchase'
"""


# ---- gaps-and-islands: longest consecutive-day activity streak --------------


def longest_streak_users(sf_dir: str):
    """(user_id, longest_streak, n_active_days) — the gaps-and-islands
    pattern: per user, the longest run of CONSECUTIVE days with at least
    one event. Per-batch distinct (user, epoch-day) partials → one
    hash-bucket exchange on user → each bucket re-dedups, sorts once, and
    labels islands with the classic ``day − rank`` anchor (two pandas
    C-path passes for every user in the bucket — never a task per user).
    All-integer arithmetic, so both engines agree exactly."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.divide(_epoch_us(b.column("ts")), _US_PER_DAY)
        t = pa.table({"user_id": b.column("user_id"), "day": day})
        g = t.group_by(["user_id", "day"]).aggregate([])
        keys = g.column("user_id")
        return g.append_column(
            "__b", pc.cast(pc.bit_wise_and(keys, 31), pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["user_id", "day"]].drop_duplicates()
        d = d.sort_values(["user_id", "day"], kind="mergesort")
        anchor = d["day"].to_numpy() - d.groupby(
            "user_id", sort=False).cumcount().to_numpy()
        runs = d.assign(__a=anchor).groupby(
            ["user_id", "__a"], sort=False).size()
        per_user = runs.groupby(level=0, sort=False).agg(["max", "sum"])
        return pd.DataFrame({
            "user_id": per_user.index.to_numpy().astype(np.int64),
            "longest_streak": per_user["max"].to_numpy().astype(np.int64),
            "n_active_days": per_user["sum"].to_numpy().astype(np.int64),
        })

    return ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas")


LONGEST_STREAK_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
isl AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS anchor
  FROM days),
runs AS (SELECT user_id, anchor, count(*) AS len FROM isl GROUP BY 1, 2)
SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS n_active_days
FROM runs GROUP BY user_id
"""


# ---- ordered grouped string concatenation -----------------------------------


def first_events_path(sf_dir: str, k: int = 5):
    """(user_id, path) — the user's first ``k`` event types joined with
    '>' in time order (ordered string_agg — the path/journey shape of
    product analytics). Each batch pre-truncates to its LOCAL first-k per
    user (the global first-k is a subset of the union of per-batch
    first-k's, so the exchange carries at most k rows per (batch, user));
    the bucket fold re-sorts and joins at C speed via a single
    ``str.cat``-free ``groupby.agg(join)`` over at most k·users rows.
    Timestamps compare as integer microseconds with event_id tiebreak, so
    the order — and therefore the string — is deterministic."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"user_id": b.column("user_id"),
                      "t": _epoch_us(b.column("ts")),
                      "event_id": b.column("event_id"),
                      "event_type": b.column("event_type")})
        df = t.to_pandas()
        df = df.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        df = df[df.groupby("user_id", sort=False).cumcount() < k]
        df["__b"] = (df["user_id"].to_numpy() % 32).astype(np.int32)
        # strip pandas metadata: unhashable schema meta breaks Ray's
        # schema-dedup cache (log spam) downstream of the exchange
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        g = g[g.groupby("user_id", sort=False).cumcount() < k]
        agg = g.groupby("user_id", sort=False)["event_type"].agg(
            ">".join)
        return pd.DataFrame({
            "user_id": agg.index.to_numpy().astype(np.int64),
            "path": agg.to_numpy(),
        })

    return ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas")


FIRST_EVENTS_PATH_SQL = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
FROM r WHERE rn <= 5 GROUP BY user_id
"""


# ---- interval overlap join: sessions × per-type daily activity spans --------


def session_type_overlaps(sf_dir: str):
    """(user_id, s_start_us, s_end_us, event_type, day, w_start_us,
    w_end_us) — every user session overlapping each event type's daily
    activity span (first..last event of that type that day): the interval
    OVERLAP join shape (arbitrary intervals both sides —
    stages/joins.interval_overlap_join; range_join's non-overlapping
    assumption does not hold here).

    Sessions come from the gap-sessionize operator; the span side is
    (types × days) rows — bounded metadata scale, folded driver-side from
    per-batch (type, day, min, max) partials and re-distributed. Cell
    width = 1 day ≈ the span length, so replication is ~2× for sessions
    (most fit one day) and ~1× for spans."""
    import ray.data

    from ..stages.joins import interval_overlap_join
    from ..stages.windows import sessionize

    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_type"])

    sess = sessionize(ev.select_columns(["user_id", "ts"]),
                      "user_id", "ts", gap_s=3600)

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "s_start_us": _epoch_us(b.column("session_start")),
            "s_end_us": _epoch_us(b.column("session_end")),
        })

    left = sess.map_batches(to_us, batch_format="pyarrow")

    def span_partial(b: pa.Table) -> pa.Table:
        us = _epoch_us(b.column("ts"))
        t = pa.table({"event_type": b.column("event_type"),
                      "day": pc.divide(us, _US_PER_DAY), "us": us})
        g = t.group_by(["event_type", "day"]).aggregate(
            [("us", "min"), ("us", "max")])
        return pa.table({"event_type": g.column("event_type"),
                         "day": g.column("day"),
                         "w_start_us": g.column("us_min"),
                         "w_end_us": g.column("us_max")})

    spans_df = ev.map_batches(span_partial, batch_format="pyarrow") \
        .to_pandas()
    if "event_type" not in spans_df.columns or not len(spans_df):
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in
                             ("user_id", "s_start_us", "s_end_us",
                              "event_type", "day", "w_start_us",
                              "w_end_us")})
    spans = spans_df.groupby(["event_type", "day"], as_index=False).agg(
        w_start_us=("w_start_us", "min"), w_end_us=("w_end_us", "max"))
    right = ray.data.from_pandas(spans)

    return interval_overlap_join(
        left, right, l_start="s_start_us", l_end="s_end_us",
        r_start="w_start_us", r_end="w_end_us", cell_us=_US_PER_DAY)


SESSION_TYPE_OVERLAPS_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 3600 SECOND
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), sessions AS (
  SELECT user_id, min(epoch_us(ts)) AS s_start_us,
         max(epoch_us(ts)) AS s_end_us
  FROM sess GROUP BY user_id, sid
), spans AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         min(epoch_us(ts)) AS w_start_us, max(epoch_us(ts)) AS w_end_us
  FROM events GROUP BY 1, 2
)
SELECT s.user_id, s.s_start_us, s.s_end_us,
       p.event_type, p.day, p.w_start_us, p.w_end_us
FROM sessions s JOIN spans p
  ON s.s_start_us <= p.w_end_us AND p.w_start_us <= s.s_end_us
"""


# ---- EXCEPT: sources publishing in one language but not another -------------


def sources_except_zh(sf_dir: str):
    """(source) — sources with English documents but NO Chinese documents:
    the set-difference shape (SQL EXCEPT). Same one-exchange partial-flag
    fold as the INTERSECT (:func:`click_purchase_days`), with the keep
    condition flipped to present-left AND absent-right."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        lang = b.column("lang")
        keep = pc.or_(pc.equal(lang, "en"), pc.equal(lang, "zh"))
        b = b.filter(keep)
        is_zh = pc.cast(pc.equal(b.column("lang"), "zh"), pa.int8())
        t = pa.table({"source": b.column("source"), "zh": is_zh,
                      "en": pc.subtract(pa.scalar(1, pa.int8()), is_zh)})
        g = t.group_by("source").aggregate([("en", "max"), ("zh", "max")])
        src = g.column("source").combine_chunks()
        h = pd.util.hash_pandas_object(src.to_pandas(),
                                       index=False).to_numpy()
        return pa.table({"source": src, "en": g.column("en_max"),
                         "zh": g.column("zh_max"),
                         "__b": pa.array((h % np.uint64(32))
                                         .astype(np.int32))})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        # Arrow return: an often-EMPTY pandas object column trips Ray's
        # block size estimator ("cannot call `vectorize` on size 0
        # inputs") — explicit string typing avoids the spam
        agg = g.groupby("source", sort=False).agg(en=("en", "max"),
                                                  zh=("zh", "max"))
        keep = agg.index[(agg["en"] == 1) & (agg["zh"] == 0)].to_numpy()
        return pa.table({"source": pa.array(keep, type=pa.string())})

    return docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas")


SOURCES_EXCEPT_SQL = """
SELECT source FROM documents WHERE lang = 'en'
EXCEPT
SELECT source FROM documents WHERE lang = 'zh'
"""


# ---- conditional-min aggregate: time to first conversion --------------------


def time_to_first_purchase(sf_dir: str):
    """(user_id, us_to_first_purchase) — microseconds from each user's
    FIRST event to their FIRST purchase (time-to-conversion): the
    conditional-aggregate shape (min FILTER / min CASE). Per-batch
    partials carry (min_all, min_purchase) per user — the purchase min
    uses the int64 max as the absent sentinel so the fold is a plain
    integer min — one bucket exchange, users without a purchase dropped
    at the fold (SQL HAVING)."""
    _ABSENT = np.iinfo(np.int64).max
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        us = _epoch_us(b.column("ts"))
        is_p = pc.equal(b.column("event_type"), "purchase")
        p_us = pc.if_else(is_p, us, pa.scalar(_ABSENT, pa.int64()))
        t = pa.table({"user_id": b.column("user_id"), "a": us, "p": p_us})
        g = t.group_by("user_id").aggregate([("a", "min"), ("p", "min")])
        keys = g.column("user_id")
        return pa.table({"user_id": keys, "a": g.column("a_min"),
                         "p": g.column("p_min"),
                         "__b": pc.cast(pc.bit_wise_and(keys, 31),
                                        pa.int32())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("user_id", sort=False).agg(a=("a", "min"),
                                                   p=("p", "min"))
        agg = agg[agg["p"] < _ABSENT]
        return pd.DataFrame({
            "user_id": agg.index.to_numpy().astype(np.int64),
            "us_to_first_purchase": (agg["p"] - agg["a"]).to_numpy()
            .astype(np.int64),
        })

    return ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas")


TIME_TO_FIRST_PURCHASE_SQL = """
SELECT user_id,
       CAST(min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
            - min(epoch_us(ts)) AS BIGINT) AS us_to_first_purchase
FROM events GROUP BY user_id
HAVING min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
       IS NOT NULL
"""


# ---- BFS levels: iterative frontier expansion over the trade graph ----------


def bfs_levels_custsupp(sf_dir: str, seed: str = "c1", hops: int = 3,
                        frontier_limit: int = 8_000_000):
    """(node, level) — breadth-first hop distance from a seed over the
    symmetric customer–supplier trade graph (same edge construction as
    pagerank_custsupp), levels 0..hops. The iterative-frontier shape:
    each round broadcasts the current frontier into ONE edges scan
    (``pc.is_in`` on src), two-phase-distincts the neighbors, and labels
    the unseen ones with the next level.

    The frontier/label sets are bounded by the NODE count (not the edge
    count); the driver gather is gated at ``frontier_limit`` — past it,
    swap the broadcast probe for stages/joins.semi_join(shuffle) + an
    anti_join against labels, which is the same rounds with one extra
    exchange each (the PageRank stage already demonstrates the fully
    distributed iterative exchange)."""
    from ..stages.joins import bucketed_join

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
        df = pa.table({"src": src, "dst": dst}).to_pandas() \
            .drop_duplicates()
        h = pd.util.hash_pandas_object(
            df["src"] + "\x00" + df["dst"], index=False).to_numpy()
        return pa.Table.from_pandas(
            df.assign(__pb=(h % 32).astype(np.int32)),
            preserve_index=False).replace_schema_metadata(None)

    dedup = j.map_batches(pair_partials, batch_format="pyarrow") \
        .groupby("__pb").map_groups(
            lambda g: g.drop(columns="__pb").drop_duplicates(),
            batch_format="pandas")

    def symmetric(b: pa.Table) -> pa.Table:
        return pa.concat_tables([
            b.select(["src", "dst"]),
            pa.table({"src": b.column("dst"), "dst": b.column("src")})])

    edges = dedup.map_batches(symmetric,
                              batch_format="pyarrow").materialize()

    levels: dict[str, int] = {seed: 0}
    frontier = pa.array([seed])
    for lvl in range(1, hops + 1):
        fr = frontier  # captured per round

        def neigh(b: pa.Table, fr=fr) -> pa.Table:
            hit = b.filter(pc.fill_null(
                pc.is_in(b.column("src"), value_set=fr), False))
            u = pc.unique(hit.column("dst").combine_chunks())
            return pa.table({"node": u})

        cand_ds = edges.map_batches(neigh,
                                    batch_format="pyarrow").materialize()
        # gate BEFORE the driver gather (a post-gather assert would OOM
        # first at scale); per-block-distinct row count is a conservative
        # upper bound on the true frontier — spurious trips only happen
        # within a block-count factor of the limit
        assert cand_ds.count() <= frontier_limit, \
            "frontier outgrew the driver gate; use the semi_join path"
        cand = cand_ds.to_pandas()
        if "node" not in cand.columns or not len(cand):
            break
        new = [n for n in cand["node"].drop_duplicates() if n not in levels]
        if not new:
            break
        for n in new:
            levels[n] = lvl
        frontier = pa.array(new)

    return pd.DataFrame({
        "node": list(levels),
        "level": pd.Series(list(levels.values()), dtype=np.int64),
    }).sort_values(["level", "node"]).reset_index(drop=True)


_BFS_ROUND = """
f{k} AS (SELECT DISTINCT e.dst AS node FROM e
         JOIN l{p} ON e.src = l{p}.node),
l{k} AS (SELECT node FROM f{k}
         WHERE node NOT IN (SELECT node FROM a{p})),
a{k} AS (SELECT node FROM a{p} UNION ALL SELECT node FROM l{k})"""

BFS_LEVELS_SQL = ("""
WITH e0 AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                            's' || CAST(l_suppkey AS VARCHAR) AS dst
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
e AS (SELECT src, dst FROM e0
      UNION ALL SELECT dst AS src, src AS dst FROM e0),
l0 AS (SELECT 'c1' AS node),
a0 AS (SELECT node FROM l0),"""
                  + ",".join(_BFS_ROUND.format(k=k, p=k - 1)
                             for k in (1, 2, 3))
                  + """
SELECT node, CAST(0 AS BIGINT) AS level FROM l0
UNION ALL SELECT node, 1 FROM l1
UNION ALL SELECT node, 2 FROM l2
UNION ALL SELECT node, 3 FROM l3
ORDER BY level, node
""")


# ---- dense time grid with zero fill ------------------------------------------


def dense_hourly_events(sf_dir: str):
    """(hour, n_events) for EVERY hour between the log's first and last
    event — gaps filled with zero (the dense-timeseries shape dashboards
    and anomaly detectors need; a plain groupby silently drops empty
    hours). Per-batch hour-count partials fold driver-side: the grid is
    O(time span), not O(rows) — 720 rows for a 30-day log at ANY corpus
    size — so the driver reindex is bounded by calendar length."""
    ev = read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        hr = pc.divide(_epoch_us(b.column("ts")), 3_600_000_000)
        vc = hr.combine_chunks().value_counts()
        return pa.table({"hour": pc.struct_field(vc, "values"),
                         "n": pc.cast(pc.struct_field(vc, "counts"),
                                      pa.int64())})

    df = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "hour" not in df.columns or not len(df):
        return pd.DataFrame({"hour": pd.Series([], dtype=np.int64),
                             "n_events": pd.Series([], dtype=np.int64)})
    cnt = df.groupby("hour")["n"].sum()
    grid = np.arange(cnt.index.min(), cnt.index.max() + 1)
    dense = cnt.reindex(grid, fill_value=0)
    return pd.DataFrame({"hour": grid.astype(np.int64),
                         "n_events": dense.to_numpy().astype(np.int64)})


DENSE_HOURLY_SQL = """
WITH bounds AS (SELECT min(epoch_us(ts) // 3600000000) AS mn,
                       max(epoch_us(ts) // 3600000000) AS mx FROM events),
grid AS (SELECT unnest(generate_series(mn, mx)) AS hour FROM bounds),
cnt AS (SELECT epoch_us(ts) // 3600000000 AS hour, count(*) AS n
        FROM events GROUP BY 1)
SELECT g.hour, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM grid g LEFT JOIN cnt c USING (hour)
"""


# ---- period-over-period growth -----------------------------------------------


def wow_growth_events(sf_dir: str):
    """(week, n_events, growth_bp) — week-over-week event growth in exact
    basis points: ``(n − prev) · 10000`` divided by ``prev`` with
    TRUNCATION toward zero, matching DuckDB's ``//`` on signed ints
    (Python's ``//`` floors, so negative growth would differ by 1 bp —
    the sign-aware form below truncates). Weekly counts fold driver-side
    (weeks are O(time span)); the lag is over that tiny series."""
    ev = read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    _US_PER_WEEK = 7 * _US_PER_DAY

    def partial(b: pa.Table) -> pa.Table:
        wk = pc.divide(_epoch_us(b.column("ts")), _US_PER_WEEK)
        vc = wk.combine_chunks().value_counts()
        return pa.table({"week": pc.struct_field(vc, "values"),
                         "n": pc.cast(pc.struct_field(vc, "counts"),
                                      pa.int64())})

    df = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "week" not in df.columns or not len(df):
        return pd.DataFrame({"week": pd.Series([], dtype=np.int64),
                             "n_events": pd.Series([], dtype=np.int64),
                             "growth_bp": pd.Series([], dtype=np.int64)})
    cnt = df.groupby("week")["n"].sum().sort_index()
    n = cnt.to_numpy().astype(np.int64)
    prev = n[:-1]
    diff = (n[1:] - prev) * 10000
    growth = np.where(diff >= 0, diff // prev, -((-diff) // prev))
    return pd.DataFrame({"week": cnt.index.to_numpy()[1:].astype(np.int64),
                         "n_events": n[1:],
                         "growth_bp": growth.astype(np.int64)})


WOW_GROWTH_SQL = """
WITH w AS (SELECT epoch_us(ts) // 604800000000 AS week, count(*) AS n
           FROM events GROUP BY 1),
lagged AS (SELECT week, n, lag(n) OVER (ORDER BY week) AS prev FROM w)
SELECT week, CAST(n AS BIGINT) AS n_events,
       CAST(((n - prev) * 10000) // prev AS BIGINT) AS growth_bp
FROM lagged WHERE prev IS NOT NULL
"""


# ---- unpivot / melt: wide measures → long (measure, value) rows --------------


def unpivot_lineitem(sf_dir: str):
    """(l_orderkey, l_linenumber, measure, value_cents) — the four lineitem
    measures melted into long form (the inverse of stages/pivot: feature
    long-tables, metric stores). Pure per-batch reshape — each batch emits
    4 stacked column slices with a dictionary-cheap constant measure
    column; no exchange at all, so it streams at read speed at any
    scale. Cents are exact int64 before any downstream math."""
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_linenumber", "l_quantity",
                               "l_extendedprice", "l_discount", "l_tax"])
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

    def melt(b: pa.Table) -> pa.Table:
        parts = []
        for m in measures:
            parts.append(pa.table({
                "l_orderkey": b.column("l_orderkey"),
                "l_linenumber": b.column("l_linenumber"),
                "measure": pa.array([m] * b.num_rows),
                "value_cents": pc.cast(pc.round(pc.multiply(
                    b.column(m), 100)), pa.int64()),
            }))
        return pa.concat_tables(parts)

    return li.map_batches(melt, batch_format="pyarrow")


UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
       CAST(round(l_quantity*100) AS BIGINT) AS value_cents FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice',
       CAST(round(l_extendedprice*100) AS BIGINT) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount',
       CAST(round(l_discount*100) AS BIGINT) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax',
       CAST(round(l_tax*100) AS BIGINT) FROM lineitem
"""


# ---- window first_value: each row carries its group's first --------------------


def first_event_type_users(sf_dir: str):
    """(event_id, user_id, event_type, first_type) — every event annotated
    with its USER'S first event type (window ``first_value`` full-output:
    acquisition-channel attribution stamped on all activity). One
    user-bucket exchange; each bucket sorts once and broadcasts the
    per-user head value back over its rows with a vectorized gather —
    never a task per user."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_id", "user_id", "ts", "event_type"])

    def add_bucket(b: pa.Table) -> pa.Table:
        keys = b.column("user_id")
        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": keys,
            "t": _epoch_us(b.column("ts")),
            "event_type": b.column("event_type"),
            "__b": pc.cast(pc.bit_wise_and(keys, 31), pa.int32()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        first = g.groupby("user_id", sort=False)["event_type"].transform(
            "first")
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "event_type": g["event_type"].to_numpy(),
            "first_type": first.to_numpy(),
        })

    return ev.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas")


FIRST_EVENT_TYPE_SQL = """
SELECT event_id, user_id, event_type,
       first_value(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS first_type
FROM events
"""


# ---- percent rank in exact ppm -------------------------------------------------


def percent_rank_length_in_lang(sf_dir: str):
    """(doc_id, lang, n_chars, pr_ppm) — percent_rank of document length
    within its language, in EXACT parts-per-million:
    ``(rank − 1) · 1e6 // (n − 1)`` over the deterministic
    (n_chars, doc_id) order — the rank-based normalizer (quantile feature
    scaling robust to outliers). All-integer, single-row groups → 0.
    One lang-hash bucket exchange; ranks and group sizes come from one
    sort + two vectorized transforms per bucket."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"])

    def add_bucket(b: pa.Table) -> pa.Table:
        lang = b.column("lang").combine_chunks()
        h = pd.util.hash_pandas_object(lang.to_pandas(),
                                       index=False).to_numpy()
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang": lang,
            "n_chars": pc.cast(b.column("n_chars"), pa.int64()),
            "__b": pa.array((h % np.uint64(32)).astype(np.int32)),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "n_chars", "doc_id"], kind="mergesort")
        grp = g.groupby("lang", sort=False)
        rank = grp.cumcount().to_numpy()
        n = grp["doc_id"].transform("size").to_numpy()
        pr = np.where(n > 1, rank * 1_000_000 // np.where(n > 1, n - 1, 1),
                      0)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "lang": g["lang"].to_numpy(),
            "n_chars": g["n_chars"].to_numpy(),
            "pr_ppm": pr.astype(np.int64),
        })

    return docs.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas")


PERCENT_RANK_SQL = """
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(CASE WHEN count(*) OVER w1 = 1 THEN 0
            ELSE ((row_number() OVER w - 1) * 1000000)
                 // (count(*) OVER w1 - 1) END AS BIGINT) AS pr_ppm
FROM documents
WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id),
       w1 AS (PARTITION BY lang)
"""


# ---- triangle counting on a thresholded co-occurrence graph ------------------


def _triangles_wedge_join(edges_df, n_buckets: int = 32):
    """Broadcast-free triangle path for graphs past the adjacency gate:
    wedge counting. Adjacency rows hash-exchange on the CENTER node; each
    bucket pair-expands its nodes' neighbor sets into wedges (a<b, center
    w) tagged with the same pair-hash the edge list gets; one pair-hash
    exchange later each bucket inner-joins its wedges against its edges —
    a match IS a triangle, seen exactly once per center, so every
    triangle credits each corner exactly 3× across the whole exchange and
    the caller's ``//3`` fold is unchanged. Cost: Σ deg(w)² wedge rows —
    bounded here because the Poisson-null sparsifier runs first."""
    import ray.data

    adj = pd.DataFrame({
        "w": np.concatenate([edges_df["s_x"].to_numpy(),
                             edges_df["s_y"].to_numpy()]).astype(np.int64),
        "nb": np.concatenate([edges_df["s_y"].to_numpy(),
                              edges_df["s_x"].to_numpy()]).astype(np.int64)})
    adj["__b"] = (adj["w"].to_numpy().astype(np.uint64)
                  % np.uint64(n_buckets)).astype(np.int32)

    def _pair_bucket(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        h = pd.util.hash_pandas_object(
            pd.Series(a * np.int64(1_000_003) + b), index=False).to_numpy()
        return (h % np.uint64(n_buckets)).astype(np.int32)

    def wedges(g: pd.DataFrame) -> pa.Table:
        d = g[["w", "nb"]].drop_duplicates()
        m = d.merge(d, on="w")
        m = m[m["nb_x"] < m["nb_y"]]
        a = m["nb_x"].to_numpy(np.int64)
        b = m["nb_y"].to_numpy(np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "w": pa.array(m["w"].to_numpy(np.int64)),
                         "__pb": pa.array(_pair_bucket(a, b))})

    ea = edges_df["s_x"].to_numpy(np.int64)
    eb = edges_df["s_y"].to_numpy(np.int64)
    # edges ride the same exchange flagged w=-1 (no nulls: a padded union
    # would float-upcast the int64 keys inside the group fn)
    edge_tbl = pa.table({"a": pa.array(ea), "b": pa.array(eb),
                         "w": pa.array(np.full(len(ea), -1, np.int64)),
                         "__pb": pa.array(_pair_bucket(ea, eb))})

    wedge_ds = ray.data.from_pandas(adj).groupby("__b") \
        .map_groups(wedges, batch_format="pandas")

    def per_pb(g: pd.DataFrame) -> pa.Table:
        e = g.loc[g["w"] < 0, ["a", "b"]].drop_duplicates()
        m = g[g["w"] >= 0].merge(e, on=["a", "b"])
        if not len(m):
            return pa.table({"node": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        vc = pd.Series(np.concatenate([
            m["a"].to_numpy(np.int64), m["b"].to_numpy(np.int64),
            m["w"].to_numpy(np.int64)])).value_counts()
        return pa.table({
            "node": pa.array(vc.index.to_numpy(np.int64)),
            "part": pa.array(vc.to_numpy(np.int64))})

    out = wedge_ds.union(ray.data.from_arrow(edge_tbl)) \
        .groupby("__pb").map_groups(per_pb, batch_format="pandas") \
        .to_pandas()
    if "node" not in out.columns:     # all-empty blocks drop the schema
        out = pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                            "part": pd.Series([], dtype=np.int64)})
    return out


def supplier_triangles(sf_dir: str, adjacency_limit: int = 85_000):
    """(node, n_triangles) — per-supplier triangle counts on the
    co-supplier graph, keeping only pairs whose co-occurrence is
    anomalously frequent: support > mean + 2σ under the Poisson null,
    evaluated as the FULLY-INTEGER predicate
    ``sup·P > S AND (sup·P − S)² > 4·S·P`` (P = distinct pairs,
    S = total support; dividing by P would create a float boundary).
    A fixed absolute threshold degenerates across scale factors — this
    corpus's co-supplier graph is COMPLETE at small thresholds — while
    the null-deviation form sparsifies at every SF.

    Plan: per-order supplier sets pair up inside one order-hash exchange
    (an order lives in one bucket, so its pairs are complete there); a
    second pair-hash exchange folds exact supports and applies the
    predicate. Triangles: the surviving edge list streams against a
    BROADCAST ``np.packbits`` adjacency matrix — nodes²/8 bytes (~0.9 GB
    at the 85k-node gate; batches unpack only their own edge rows); each
    edge batch emits per-node partial counts (u and v get the
    common-neighbor count, every common neighbor gets 1), and each
    triangle contributes exactly 3 to its three corners, so the fold
    divides by 3 — an exact integer. PAST the gate the broadcast is
    replaced by the wedge-join exchange (:func:`_triangles_wedge_join`,
    no node² state anywhere) — path-equality pinned at
    ``adjacency_limit=0`` in tests/test_relational_features.py."""
    import ray
    import ray.data

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_suppkey"])

    def so_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"o": b.column("l_orderkey"),
                      "s": pc.cast(b.column("l_suppkey"), pa.int64())})
        g = t.group_by(["o", "s"]).aggregate([])
        keys = g.column("o")
        return g.append_column(
            "__b", pc.cast(pc.bit_wise_and(keys, 31), pa.int32()))

    def pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["o", "s"]].drop_duplicates()
        m = d.merge(d, on="o")
        m = m[m["s_x"] < m["s_y"]]
        cnt = m.groupby(["s_x", "s_y"], sort=False).size() \
            .reset_index(name="n")
        h = pd.util.hash_pandas_object(
            cnt["s_x"] * np.int64(1_000_003) + cnt["s_y"],
            index=False).to_numpy()
        cnt["__pb"] = (h % np.uint64(32)).astype(np.int32)
        return cnt

    sup = li.map_batches(so_partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(pairs_per_bucket,
                                   batch_format="pandas") \
        .groupby("__pb").map_groups(
            lambda g: g.groupby(["s_x", "s_y"], sort=False)["n"].sum()
            .reset_index(), batch_format="pandas").materialize()

    # S and P fold driver-side (two ints over pair-vocabulary rows)
    tot = sup.map_batches(
        lambda b: pa.table({"s": pa.array([int(pc.sum(b.column("n"))
                                               .as_py() or 0)], pa.int64()),
                            "p": pa.array([b.num_rows], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    big_s = int(tot["s"].sum()) if "s" in tot.columns else 0
    big_p = int(tot["p"].sum()) if "p" in tot.columns else 0

    def empty():
        return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                             "n_triangles": pd.Series([], dtype=np.int64)})

    if big_p == 0:
        return empty()

    def keep(b: pa.Table) -> pa.Table:
        d = pc.subtract(pc.multiply(b.column("n"), big_p), big_s)
        ok = pc.and_(pc.greater(d, 0),
                     pc.greater(pc.multiply(d, d), 4 * big_s * big_p))
        return b.filter(ok)

    edges_df = sup.map_batches(keep, batch_format="pyarrow").to_pandas()
    if "s_x" not in edges_df.columns or not len(edges_df):
        return empty()
    nodes = np.unique(np.concatenate([edges_df["s_x"].to_numpy(),
                                      edges_df["s_y"].to_numpy()]))
    if len(nodes) > adjacency_limit:
        parts = _triangles_wedge_join(edges_df)
    else:
        pos = {int(v): i for i, v in enumerate(nodes)}
        a = np.zeros((len(nodes), len(nodes)), dtype=bool)
        iu = edges_df["s_x"].map(pos).to_numpy()
        iv = edges_df["s_y"].map(pos).to_numpy()
        a[iu, iv] = True
        a[iv, iu] = True
        # packbits: nodes²/8 bytes broadcast (85k gate ≈ 0.9 GB)
        ref = ray.put((nodes.astype(np.int64),
                       np.packbits(a, axis=1), len(nodes)))

        class EdgePartial:
            def __init__(self, r):
                self.nodes, self.a, self.n = ray.get(r) \
                    if isinstance(r, ray.ObjectRef) else r

            def __call__(self, b: pa.Table) -> pa.Table:
                n = self.n
                acc = np.zeros(n, dtype=np.int64)
                ui = pc.index_in(b.column("s_x"),
                                 value_set=pa.array(self.nodes)) \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                vi = pc.index_in(b.column("s_y"),
                                 value_set=pa.array(self.nodes)) \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                # unpack only this batch's edge rows: (edges, n) bool temp
                common = np.unpackbits(self.a[ui] & self.a[vi],
                                       axis=1, count=n).astype(bool)
                ccnt = common.sum(axis=1).astype(np.int64)
                np.add.at(acc, ui, ccnt)
                np.add.at(acc, vi, ccnt)
                acc += common.sum(axis=0).astype(np.int64)
                return pa.table({"node": pa.array(self.nodes),
                                 "part": pa.array(acc)})

        edges = ray.data.from_pandas(edges_df[["s_x", "s_y"]])
        # batch_size caps the (edges × nodes) per-batch unpacked temp
        bsz = int(max(256, min(2048, 64_000_000 // max(1, len(nodes)))))
        parts = edges.map_batches(EdgePartial, fn_constructor_args=(ref,),
                                  concurrency=(1, 2), batch_size=bsz,
                                  batch_format="pyarrow").to_pandas()
    tri3 = parts.groupby("node")["part"].sum()
    tri3 = tri3[tri3 > 0]                   # SQL emits triangle members only
    out = pd.DataFrame({"node": tri3.index.to_numpy().astype(np.int64),
                        "n_triangles": (tri3 // 3).to_numpy()
                        .astype(np.int64)})
    return out.sort_values("node").reset_index(drop=True)


SUPPLIER_TRIANGLES_SQL = """
WITH so AS (SELECT DISTINCT l_orderkey, CAST(l_suppkey AS BIGINT) AS s
            FROM lineitem),
pr AS (SELECT a.s AS u, b.s AS v, CAST(count(*) AS BIGINT) AS sup
       FROM so a JOIN so b
         ON a.l_orderkey = b.l_orderkey AND a.s < b.s
       GROUP BY 1, 2),
tot AS (SELECT CAST(sum(sup) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS p FROM pr),
e AS (SELECT u, v FROM pr, tot
      WHERE sup * p > s AND (sup * p - s) * (sup * p - s) > 4 * s * p),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
GROUP BY node ORDER BY node
"""


# ---- k-core of the bipartite trade graph ------------------------------------


def kcore_trade(sf_dir: str, k: int = 30, rounds: int = 4):
    """One summary row of the bipartite customer↔supplier ``k``-core after
    ``rounds`` synchronized peeling rounds (stages/components.
    kcore_bipartite): surviving customers, suppliers, edges, and whether
    the peel reached its fixpoint. With convergence (it does here — the
    flag is part of the oracle-checked output) the result IS the true
    k-core, and the fixed-round SQL oracle computes the identical set.

    Edges are the DISTINCT (custkey, suppkey) pairs, derived with one
    bucketed fact-fact join (lineitem pre-reduced to distinct
    (orderkey, suppkey)); the per-round degree folds are node-bounded.
    """
    import pyarrow as pa

    from ..stages.components import kcore_bipartite
    from ..stages.joins import bucketed_join

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_suppkey"])

    def li_distinct(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "supp": b.column("l_suppkey")}).group_by(
                ["l_orderkey", "supp"]).aggregate([])

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
             .groupby("__b").map_groups(dedup_bucket,
                                        batch_format="pandas"))
    core, converged = kcore_bipartite(pairs, key_a="cust", key_b="supp",
                                      k=k, rounds=rounds)

    # per-block partials: edges of one node can span blocks, so distincts
    # must fold over the gathered key sets, not per-block nunique sums —
    # gather the (bounded) core edge list once for the exact summary
    df = core.to_pandas()
    if "cust" in df.columns and len(df):
        n_c = int(df["cust"].nunique())
        n_s = int(df["supp"].nunique())
        n_e = len(df)
    else:
        n_c = n_s = n_e = 0
    return pd.DataFrame({
        "k": pd.Series([k], dtype=np.int64),
        "n_custs": pd.Series([n_c], dtype=np.int64),
        "n_supps": pd.Series([n_s], dtype=np.int64),
        "n_edges": pd.Series([n_e], dtype=np.int64),
        "converged": [bool(converged)]})


def _kcore_round_sql(prev: str, cur: str, k: int) -> str:
    return (f"{cur} AS (SELECT c, s FROM {prev} WHERE "
            f"c IN (SELECT c FROM {prev} GROUP BY c HAVING count(*) >= {k})"
            f" AND "
            f"s IN (SELECT s FROM {prev} GROUP BY s HAVING count(*) >= {k})"
            ")")


KCORE_TRADE_SQL = ("""
WITH e0 AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
""" + ",\n".join(_kcore_round_sql(f"e{i}", f"e{i+1}", 30) for i in range(4))
    + """
SELECT CAST(30 AS BIGINT) AS k,
       CAST(count(DISTINCT c) AS BIGINT) AS n_custs,
       CAST(count(DISTINCT s) AS BIGINT) AS n_supps,
       CAST(count(*) AS BIGINT) AS n_edges,
       NOT EXISTS (SELECT 1 FROM (SELECT c AS v, count(*) AS d FROM e4
                                  GROUP BY c
                                  UNION ALL
                                  SELECT s AS v, count(*) AS d FROM e4
                                  GROUP BY s) WHERE d < 30) AS converged
FROM e4
""")


def journey_prefixes_events(sf_dir: str, k: int = 3, top_k: int = 10):
    """(prefix, n_users) — the ``top_k`` most common first-``k``-event
    journeys (the funnel-discovery / onboarding-path shape): each user's
    first ``k`` event types in (ts, event_id) order joined with '>';
    users with fewer than ``k`` events are excluded in both engines.
    Counting is over prefix strings whose cardinality is ≤ |types|^k —
    bounded — so per-bucket prefix partials gather for a tiny driver
    fold. Ties break prefix ASC; all counts exact ints.

    Shape: ONE user-hash exchange of per-batch local first-k rows (the
    first_events_path pre-truncation: global first-k ⊆ union of batch
    first-k), per-bucket path assembly on the pandas C-path, per-bucket
    (prefix, n) partials out — never a row per user past the exchange."""
    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"user_id": b.column("user_id"),
                      "t": _epoch_us(b.column("ts")),
                      "event_id": b.column("event_id"),
                      "event_type": b.column("event_type")})
        df = t.to_pandas()
        df = df.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        df = df[df.groupby("user_id", sort=False).cumcount() < k]
        df["__b"] = (df["user_id"].to_numpy() % 32).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        g = g[g.groupby("user_id", sort=False).cumcount() < k]
        sizes = g.groupby("user_id", sort=False)["event_type"].agg(
            ["size", ">".join])
        full = sizes[sizes["size"] >= k]
        agg = full.groupby("join", sort=False).size()
        return pd.DataFrame({"prefix": agg.index.to_numpy(),
                             "n_users": agg.to_numpy().astype(np.int64)})

    parts = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas") \
        .to_pandas()
    if not len(parts):
        return pd.DataFrame({"prefix": pd.Series([], dtype=object),
                             "n_users": pd.Series([], dtype=np.int64)})
    out = parts.groupby("prefix", as_index=False)["n_users"].sum()
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(["n_users", "prefix"],
                           ascending=[False, True],
                           kind="mergesort").head(top_k) \
        .reset_index(drop=True)


JOURNEY_PREFIXES_SQL = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS prefix
      FROM r WHERE rn <= 3 AND n >= 3 GROUP BY user_id)
SELECT prefix, CAST(count(*) AS BIGINT) AS n_users
FROM p GROUP BY prefix ORDER BY n_users DESC, prefix LIMIT 10
"""
