"""Relational composites round 3 — the remaining classic TPC-H query
shapes, adapted to the testdata schema (which has no ``partsupp``: the
part↔supplier relation is taken from ``lineitem`` itself).

Shapes covered (each a named TPC-H pattern over the standard tables):

- Q2  — grouped ARGMIN with deterministic tie-break, re-joined to two
  dimensions (:func:`min_cost_supplier`);
- Q11 — scalar-subquery share predicate: keep groups whose total exceeds a
  fixed fraction of the GLOBAL total, fully integer via cross-multiplication
  (:func:`supplier_value_share`);
- Q16 — distinct-count distribution with a computed exclusion set
  (:func:`brand_supplier_counts`);
- Q17 — correlated per-group average predicate (``qty < 0.2 * avg(qty) OVER
  part``), exact via ``5·qty·cnt < sum`` cross-multiplication
  (:func:`small_qty_revenue`);
- Q21 — "sole supplier of a multi-line order": EXISTS(another line) AND
  NOT EXISTS(line from another supplier), folded into an associative
  per-order ``(count, min_supp, max_supp)`` reduction
  (:func:`sole_supplier_orders`);
- Q7  — volume between nation pairs by year, a fact-to-fact join where the
  order→nation map rides a bucketed join (:func:`nation_pair_volume`);
- Q8  — market share of one supplier nation inside one customer region by
  year: the ratio of two exact integer sums, divided ONCE as doubles
  (:func:`market_share`).

Scale rules are the repo's usual ones: facts pre-reduce inside
``map_batches`` before any exchange; exchanges carry keys + integer
partials, never wide rows; dimension lookups broadcast via ``ray.put``
behind documented size gates with a bucketed-join fallback; every
oracle-compared number is an exact integer (cents) or a single double
division of two exact integers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.parquet import read_dim_table, read_parquet

# Broadcast gates: above these row counts the driver gather would be the
# scale bug the repo bans, so the paths below switch to a bucketed join
# (documented per call site).
_DIM_BROADCAST_LIMIT = 2_000_000


def _cents(col) -> "pa.ChunkedArray":
    return pc.cast(pc.round(pc.multiply(col, 100)), pa.int64())


def _gather_small(ds, limit: int = _DIM_BROADCAST_LIMIT) -> pa.Table:
    """Driver-gather a dimension known small; loud failure past the gate."""
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return None
    t = pa.concat_tables(tabs).combine_chunks()
    if t.num_rows > limit:
        raise ValueError(
            f"dimension has {t.num_rows} rows > broadcast gate {limit}; "
            "use the bucketed-join fallback for this input")
    return t


# ---- Q2 shape: grouped ARGMIN + dimension re-join ---------------------------


def min_cost_supplier(sf_dir: str):
    """Per part, the cheapest lineitem price ever charged and the supplier
    that charged it (ties -> lowest suppkey), with part and supplier names.

    Shape: TPC-H Q2's correlated ``ps_supplycost = min(...)`` subquery,
    using lineitem as the part↔supplier relation. The ARGMIN is an
    ASSOCIATIVE fold — each batch reduces to one ``(part, min_cents,
    best_supp)`` row per part seen, one hash-bucket exchange co-locates the
    partials, and each bucket re-folds with the same sort + first-row rule.
    Part and supplier dimensions broadcast once (``ray.put``); at real
    corpus scale the part dimension would pass the gate only if pruned —
    the fallback is stages/joins.bucketed_join on p_partkey.
    """
    import ray

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "p_partkey": b.column("l_partkey").to_numpy(zero_copy_only=False),
            "cents": _cents(b.column("l_extendedprice")).to_numpy(
                zero_copy_only=False),
            "supp": b.column("l_suppkey").to_numpy(zero_copy_only=False),
        })
        df = (df.sort_values(["p_partkey", "cents", "supp"], kind="mergesort")
              .drop_duplicates("p_partkey"))
        df["__b"] = (df["p_partkey"] % 32).astype(np.int32)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["p_partkey", "cents", "supp"], kind="mergesort")
             .drop_duplicates("p_partkey"))
        return g[["p_partkey", "cents", "supp"]]

    best = (li.map_batches(partial, batch_format="pyarrow")
            .groupby("__b").map_groups(per_bucket, batch_format="pandas"))

    part = read_dim_table(f"{sf_dir}/part.parquet",
                                      columns=["p_partkey", "p_name"], limit=_DIM_BROADCAST_LIMIT)
    supp = read_dim_table(f"{sf_dir}/supplier.parquet",
                                      columns=["s_suppkey", "s_name"], limit=_DIM_BROADCAST_LIMIT)
    ref = ray.put((part.column("p_partkey").combine_chunks(),
                   part.column("p_name").combine_chunks(),
                   supp.column("s_suppkey").combine_chunks(),
                   supp.column("s_name").combine_chunks()))

    class Attach:
        def __init__(self, r):
            self.pk, self.pn, self.sk, self.sn = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r)

        def __call__(self, b: pa.Table) -> pa.Table:
            pidx = pc.index_in(b.column("p_partkey"), value_set=self.pk)
            sidx = pc.index_in(b.column("supp"), value_set=self.sk)
            return pa.table({
                "p_partkey": pc.cast(b.column("p_partkey"), pa.int64()),
                "p_name": self.pn.take(pidx),
                "min_price_cents": pc.cast(b.column("cents"), pa.int64()),
                "s_suppkey": pc.cast(b.column("supp"), pa.int64()),
                "s_name": self.sn.take(sidx),
            })

    return best.map_batches(Attach, fn_constructor_args=(ref,),
                            concurrency=(1, 2), batch_format="pyarrow")


MIN_COST_SUPPLIER_SQL = """
WITH c AS (
  SELECT l_partkey, l_suppkey,
         CAST(round(l_extendedprice*100) AS BIGINT) AS cents
  FROM lineitem),
m AS (SELECT l_partkey, min(cents) AS min_price_cents FROM c GROUP BY 1),
b AS (SELECT c.l_partkey, m.min_price_cents,
             min(c.l_suppkey) AS s_suppkey
      FROM c JOIN m ON c.l_partkey = m.l_partkey
                   AND c.cents = m.min_price_cents
      GROUP BY 1, 2)
SELECT b.l_partkey AS p_partkey, p.p_name, b.min_price_cents,
       b.s_suppkey, s.s_name
FROM b JOIN part p ON p.p_partkey = b.l_partkey
       JOIN supplier s ON s.s_suppkey = b.s_suppkey
"""


# ---- Q11 shape: groups above a fixed fraction of the global total -----------


def supplier_value_share(sf_dir: str, threshold_ppm: int = 10_200):
    """Suppliers whose lineitem revenue exceeds ``threshold_ppm`` parts-per-
    million of GLOBAL revenue (TPC-H Q11's scalar-subquery HAVING).

    The predicate is fully integer: ``1_000_000 · supplier_cents >
    threshold_ppm · global_cents`` — no float exists on the boundary in
    either engine. One batch-level pre-reduction (suppkey → cents sum)
    feeds a single tiny exchange (≤ #suppliers × #blocks rows); the global
    total is the sum of the same partials, so the corpus is scanned ONCE.
    """
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_suppkey", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"s": b.column("l_suppkey"),
                      "c": _cents(b.column("l_extendedprice"))})
        g = t.group_by("s").aggregate([("c", "sum")])
        return pa.table({"s_suppkey": g.column("s"),
                         "cents": g.column("c_sum")})

    parts = _gather_small(li.map_batches(partial, batch_format="pyarrow"),
                          limit=50_000_000)  # #suppliers × #blocks keys only
    df = parts.to_pandas().groupby("s_suppkey", as_index=False)["cents"].sum()
    total = int(df["cents"].sum())
    # Python-object ints: 1e6 × cents can exceed int64 at corpus scale;
    # DuckDB promotes the same product to HUGEINT.
    keep = df[df["cents"].astype(object) * 1_000_000 >
              threshold_ppm * total]
    supp = read_dim_table(f"{sf_dir}/supplier.parquet",
                                      columns=["s_suppkey", "s_name"], limit=_DIM_BROADCAST_LIMIT)
    sdf = supp.to_pandas()
    out = keep.merge(sdf, on="s_suppkey")
    out = out.rename(columns={"cents": "value_cents"})
    out = out.sort_values(["value_cents", "s_suppkey"],
                          ascending=[False, True], kind="mergesort")
    return out[["s_suppkey", "s_name", "value_cents"]].reset_index(drop=True)


SUPPLIER_VALUE_SHARE_SQL = """
WITH v AS (
  SELECT l_suppkey AS s_suppkey,
         sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS value_cents
  FROM lineitem GROUP BY 1)
SELECT v.s_suppkey, s.s_name, CAST(v.value_cents AS BIGINT) AS value_cents
FROM v JOIN supplier s ON s.s_suppkey = v.s_suppkey
WHERE 1000000 * v.value_cents >
      10200 * (SELECT sum(CAST(round(l_extendedprice*100) AS BIGINT))
               FROM lineitem)
ORDER BY value_cents DESC, v.s_suppkey
"""


# ---- Q16 shape: distinct-count distribution with an exclusion set -----------


def brand_supplier_counts(sf_dir: str):
    """Per (p_brand, size bucket): how many DISTINCT suppliers ship that
    slice and how many distinct parts it holds — excluding suppliers whose
    name contains ``'7'`` (TPC-H Q16's NOT-IN complaint-supplier set).

    The exclusion set and the part dimension broadcast once; lineitem
    pre-reduces each batch to DISTINCT ``(brand, bucket, part, supp)``
    quads (bounded by |part|×|supplier|, NOT by corpus rows), one
    hash-bucket exchange co-locates each (brand, bucket) slice, and the
    per-bucket nunique fold emits one row per slice.
    """
    import ray

    part = read_dim_table(f"{sf_dir}/part.parquet",
                                      columns=["p_partkey", "p_brand",
                                               "p_size"], limit=_DIM_BROADCAST_LIMIT)
    supp = read_dim_table(f"{sf_dir}/supplier.parquet",
                                      columns=["s_suppkey", "s_name"], limit=_DIM_BROADCAST_LIMIT)
    bad = supp.filter(pc.match_substring(supp.column("s_name"), "7"))
    ref = ray.put((part.column("p_partkey").combine_chunks(),
                   part.column("p_brand").combine_chunks(),
                   pc.cast(pc.divide(part.column("p_size"), 10),
                           pa.int64()).combine_chunks(),
                   bad.column("s_suppkey").combine_chunks()))

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_partkey", "l_suppkey"])

    class Quads:
        def __init__(self, r):
            self.pk, self.brand, self.bucket, self.bad = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r)

        def __call__(self, b: pa.Table) -> pd.DataFrame:
            keep = pc.invert(pc.is_in(b.column("l_suppkey"),
                                      value_set=self.bad))
            b = b.filter(keep)
            idx = pc.index_in(b.column("l_partkey"), value_set=self.pk)
            df = pd.DataFrame({
                "p_brand": self.brand.take(idx).to_pandas(),
                "size_bucket": self.bucket.take(idx).to_numpy(
                    zero_copy_only=False),
                "part": b.column("l_partkey").to_numpy(zero_copy_only=False),
                "supp": b.column("l_suppkey").to_numpy(zero_copy_only=False),
            }).drop_duplicates()
            df["__b"] = (pd.util.hash_pandas_object(
                df["p_brand"], index=False).to_numpy()
                ^ df["size_bucket"].to_numpy().astype(np.uint64)) % 32
            df["__b"] = df["__b"].astype(np.int32)
            return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["p_brand", "size_bucket", "part", "supp"])
        out = (g.groupby(["p_brand", "size_bucket"], sort=False)
               .agg(supplier_cnt=("supp", "nunique"),
                    part_cnt=("part", "nunique")).reset_index())
        out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
        out["part_cnt"] = out["part_cnt"].astype(np.int64)
        return out

    out = (li.map_batches(Quads, fn_constructor_args=(ref,), concurrency=(1, 4),
                          batch_format="pyarrow")
           .groupby("__b").map_groups(per_bucket, batch_format="pandas")
           ).to_pandas()
    return (out.sort_values(["p_brand", "size_bucket"], kind="mergesort")
            .reset_index(drop=True))


BRAND_SUPPLIER_COUNTS_SQL = """
SELECT p.p_brand, CAST(p.p_size // 10 AS BIGINT) AS size_bucket,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt,
       CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS part_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
GROUP BY 1, 2 ORDER BY p_brand, size_bucket
"""


# ---- Q17 shape: correlated per-group average predicate ----------------------


def small_qty_revenue(sf_dir: str, brand: str = "Brand#23"):
    """Total revenue (cents) from lineitems of one brand whose quantity is
    below 20 % of that part's average quantity (TPC-H Q17's correlated
    AVG subquery).

    Two pruned scans, zero shuffles: pass 1 folds per-part ``(sum_qty_cents,
    cnt)`` for the brand's parts (a few hundred keys — driver fold +
    broadcast); pass 2 re-reads the same pruned columns and keeps rows where
    ``5 · qty_cents · cnt < sum_qty_cents`` — the exact-integer spelling of
    ``qty < 0.2 · avg`` (DuckDB evaluates the same cross-multiplication).
    The qualifying revenue folds per batch to ONE partial row.
    """
    import ray

    part = read_dim_table(f"{sf_dir}/part.parquet",
                                      columns=["p_partkey", "p_brand"], limit=_DIM_BROADCAST_LIMIT)
    pk = part.filter(pc.equal(part.column("p_brand"), brand)) \
             .column("p_partkey").combine_chunks()

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]

    def pass1(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("l_partkey"), value_set=pk)
        b = b.filter(m)
        t = pa.table({"p": b.column("l_partkey"),
                      "q": _cents(b.column("l_quantity"))})
        g = t.group_by("p").aggregate([("q", "sum"), ("q", "count")])
        return pa.table({"p": g.column("p"), "qsum": g.column("q_sum"),
                         "cnt": pc.cast(g.column("q_count"), pa.int64())})

    stats = _gather_small(
        read_parquet(f"{sf_dir}/lineitem.parquet", columns=li_cols[:2])
        .map_batches(pass1, batch_format="pyarrow"), limit=50_000_000)
    if stats is None:
        return pd.DataFrame({"revenue_cents": pd.Series([0], dtype=np.int64)})
    sdf = stats.to_pandas().groupby("p", as_index=False).sum()
    ref = ray.put((pa.array(sdf["p"].to_numpy()),
                   sdf["qsum"].to_numpy().astype(np.int64),
                   sdf["cnt"].to_numpy().astype(np.int64)))

    class Qualify:
        def __init__(self, r):
            self.p, self.qsum, self.cnt = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r)

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(b.column("l_partkey"), value_set=self.p)
            live = pc.is_valid(idx)
            b = b.filter(live)
            ii = pc.filter(idx, live).to_numpy(zero_copy_only=False)
            q = _cents(b.column("l_quantity")).to_numpy(zero_copy_only=False)
            price = _cents(b.column("l_extendedprice")).to_numpy(
                zero_copy_only=False)
            ok = 5 * q * self.cnt[ii] < self.qsum[ii]
            return pa.table({"partial": pa.array(
                [int(price[ok].sum())], pa.int64())})

    partials = (read_parquet(f"{sf_dir}/lineitem.parquet", columns=li_cols)
                .map_batches(Qualify, fn_constructor_args=(ref,),
                             concurrency=(1, 4), batch_format="pyarrow")
                ).to_pandas()
    total = int(partials["partial"].sum()) if "partial" in partials else 0
    return pd.DataFrame({"revenue_cents": pd.Series([total], dtype=np.int64)})


SMALL_QTY_REVENUE_SQL = """
WITH b AS (
  SELECT l.l_partkey, CAST(round(l.l_quantity*100) AS BIGINT) AS qc,
         CAST(round(l.l_extendedprice*100) AS BIGINT) AS ec
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#23'),
s AS (SELECT l_partkey, sum(qc) AS qsum,
             CAST(count(*) AS BIGINT) AS cnt
      FROM b GROUP BY 1)
SELECT CAST(coalesce(sum(b.ec), 0) AS BIGINT) AS revenue_cents
FROM b JOIN s ON s.l_partkey = b.l_partkey
WHERE 5 * b.qc * s.cnt < s.qsum
"""


# ---- Q21 shape: sole supplier of a multi-line order -------------------------


def sole_supplier_orders(sf_dir: str):
    """Suppliers ranked by how many MULTI-line orders they supplied alone
    (every line from them) — TPC-H Q21's EXISTS / NOT-EXISTS pair collapsed
    into an associative per-order fold.

    ``(count, min_supp, max_supp)`` per order is associative across
    partials; an order qualifies iff ``count ≥ 2`` and ``min == max``
    (single distinct supplier). One hash-bucket exchange of per-batch
    partials, per-supplier counts emitted per bucket, driver-folded (≤
    |supplier| rows).
    """
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_suppkey"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"o": b.column("l_orderkey"),
                      "s": b.column("l_suppkey")})
        g = t.group_by("o").aggregate([("s", "count"), ("s", "min"),
                                       ("s", "max")])
        keys = g.column("o")
        return pa.table({
            "o": keys, "n": pc.cast(g.column("s_count"), pa.int64()),
            "mn": g.column("s_min"), "mx": g.column("s_max"),
            "__b": pc.cast(pc.bit_wise_and(keys, 31), pa.int32()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("o", sort=False).agg(
            n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"))
        agg = agg[(agg["n"] >= 2) & (agg["mn"] == agg["mx"])]
        cnt = agg.groupby("mn", sort=False).size()
        return pd.DataFrame({
            "s_suppkey": cnt.index.to_numpy().astype(np.int64),
            "n_orders": cnt.to_numpy().astype(np.int64)})

    df = (li.map_batches(partial, batch_format="pyarrow")
          .groupby("__b").map_groups(per_bucket, batch_format="pandas")
          ).to_pandas()
    if "s_suppkey" not in df.columns:
        df = pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                           "n_orders": pd.Series([], dtype=np.int64)})
    df = df.groupby("s_suppkey", as_index=False)["n_orders"].sum()
    supp = read_dim_table(f"{sf_dir}/supplier.parquet",
                                      columns=["s_suppkey", "s_name"], limit=_DIM_BROADCAST_LIMIT)
    out = df.merge(supp.to_pandas(), on="s_suppkey")
    out = out.sort_values(["n_orders", "s_suppkey"],
                          ascending=[False, True], kind="mergesort")
    return out[["s_suppkey", "s_name", "n_orders"]].reset_index(drop=True)


SOLE_SUPPLIER_SQL = """
WITH per_o AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n,
         min(l_suppkey) AS mn, max(l_suppkey) AS mx
  FROM lineitem GROUP BY 1)
SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS n_orders
FROM per_o JOIN supplier s ON s.s_suppkey = per_o.mn
WHERE per_o.n >= 2 AND per_o.mn = per_o.mx
GROUP BY 1, 2 ORDER BY n_orders DESC, s_suppkey
"""


# ---- Q7 shape: nation-pair volume by year (fact-to-fact join) ---------------


def nation_pair_volume(sf_dir: str):
    """Revenue (cents) between every (customer nation, supplier nation)
    pair by order year — TPC-H Q7's two-sided nation join.

    The supplier→nation map is tiny and broadcasts. The order→(cust nation,
    year) map is FACT-sized at corpus scale, so it rides a bucketed join
    against the lineitem partials: lineitem pre-reduces each batch to
    ``(orderkey, supp_nation) → cents`` (bounded by rows but far narrower),
    then one bucketed hash join on orderkey attaches the order map, and the
    final ``(cust_nation, supp_nation, year)`` fold is a few hundred rows,
    folded driver-side. Customer broadcasts under the documented gate
    (bucketed-join fallback beyond it).
    """
    import ray

    from ..stages.joins import bucketed_join

    nat = read_dim_table(f"{sf_dir}/nation.parquet",
                                     columns=["n_nationkey", "n_name"], limit=_DIM_BROADCAST_LIMIT)
    supp = read_dim_table(f"{sf_dir}/supplier.parquet",
                                      columns=["s_suppkey", "s_nationkey"], limit=_DIM_BROADCAST_LIMIT)
    cust = read_dim_table(f"{sf_dir}/customer.parquet",
                                      columns=["c_custkey", "c_nationkey"], limit=_DIM_BROADCAST_LIMIT)
    nidx_s = pc.index_in(supp.column("s_nationkey"),
                         value_set=nat.column("n_nationkey"))
    supp_nation = nat.column("n_name").take(nidx_s).combine_chunks()
    nidx_c = pc.index_in(cust.column("c_nationkey"),
                         value_set=nat.column("n_nationkey"))
    cust_nation = nat.column("n_name").take(nidx_c).combine_chunks()
    ref = ray.put((supp.column("s_suppkey").combine_chunks(), supp_nation,
                   cust.column("c_custkey").combine_chunks(), cust_nation))

    class LiPartial:
        def __init__(self, r):
            self.sk, self.sn, _, _ = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r)

        def __call__(self, b: pa.Table) -> pa.Table:
            sidx = pc.index_in(b.column("l_suppkey"), value_set=self.sk)
            t = pa.table({"l_orderkey": b.column("l_orderkey"),
                          "supp_nation": self.sn.take(sidx),
                          "c": _cents(b.column("l_extendedprice"))})
            g = t.group_by(["l_orderkey", "supp_nation"]).aggregate(
                [("c", "sum")])
            return pa.table({"l_orderkey": g.column("l_orderkey"),
                             "supp_nation": g.column("supp_nation"),
                             "cents": g.column("c_sum")})

    class OrderMap:
        def __init__(self, r):
            _, _, self.ck, self.cn = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r)

        def __call__(self, b: pa.Table) -> pa.Table:
            cidx = pc.index_in(b.column("o_custkey"), value_set=self.ck)
            return pa.table({
                "o_orderkey": b.column("o_orderkey"),
                "cust_nation": self.cn.take(cidx),
                "o_year": pc.year(b.column("o_orderdate")),
            })

    li = (read_parquet(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_suppkey", "l_extendedprice"])
          .map_batches(LiPartial, fn_constructor_args=(ref,), concurrency=(1, 4),
                       batch_format="pyarrow"))
    omap = (read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_orderdate"])
            .map_batches(OrderMap, fn_constructor_args=(ref,), concurrency=(1, 2),
                         batch_format="pyarrow"))
    joined = bucketed_join(li, omap, "l_orderkey", right_on="o_orderkey",
                           num_buckets=16)

    def fold(b: pa.Table) -> pa.Table:
        g = b.group_by(["cust_nation", "supp_nation", "o_year"]).aggregate(
            [("cents", "sum")])
        return pa.table({"cust_nation": g.column("cust_nation"),
                         "supp_nation": g.column("supp_nation"),
                         "o_year": g.column("o_year"),
                         "revenue_cents": g.column("cents_sum")})

    df = joined.map_batches(fold, batch_format="pyarrow").to_pandas()
    out = (df.groupby(["cust_nation", "supp_nation", "o_year"],
                      as_index=False)["revenue_cents"].sum())
    out["o_year"] = out["o_year"].astype(np.int64)
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    return (out.sort_values(["cust_nation", "supp_nation", "o_year"],
                            kind="mergesort").reset_index(drop=True))


NATION_PAIR_VOLUME_SQL = """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---- Q8 shape: market share (ratio of two exact integer sums) ---------------


def market_share(sf_dir: str, supp_nation: str = "NATION_3",
                 cust_region: str = "ASIA"):
    """Per order year, the revenue share of suppliers from ``supp_nation``
    among orders placed by customers of ``cust_region`` (TPC-H Q8).

    Both the numerator and denominator are exact integer cent sums folded
    from per-batch partials (one corpus scan); the share divides the two
    Python ints ONCE as doubles — the one float op, identical in DuckDB.
    The region's customer-key set broadcasts behind the documented gate
    (the bucketed fallback would route the order map through
    stages/joins.bucketed_join as in :func:`nation_pair_volume`).
    """
    import ray

    from ..stages.joins import bucketed_join

    nat = read_dim_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"], limit=_DIM_BROADCAST_LIMIT)
    reg = read_dim_table(f"{sf_dir}/region.parquet",
                                     columns=["r_regionkey", "r_name"], limit=_DIM_BROADCAST_LIMIT)
    rkey = reg.filter(pc.equal(reg.column("r_name"), cust_region)) \
              .column("r_regionkey")
    region_nations = nat.filter(
        pc.is_in(nat.column("n_regionkey"), value_set=rkey)) \
        .column("n_nationkey")
    cust = read_dim_table(f"{sf_dir}/customer.parquet",
                                      columns=["c_custkey", "c_nationkey"], limit=_DIM_BROADCAST_LIMIT)
    region_custs = cust.filter(
        pc.is_in(cust.column("c_nationkey"), value_set=region_nations)) \
        .column("c_custkey").combine_chunks()
    supp = read_dim_table(f"{sf_dir}/supplier.parquet",
                                      columns=["s_suppkey", "s_nationkey"], limit=_DIM_BROADCAST_LIMIT)
    nkey = nat.filter(pc.equal(nat.column("n_name"), supp_nation)) \
              .column("n_nationkey")
    x_supps = supp.filter(
        pc.is_in(supp.column("s_nationkey"), value_set=nkey)) \
        .column("s_suppkey").combine_chunks()
    ref = ray.put((region_custs, x_supps))

    class LiPartial:
        def __init__(self, r):
            _, self.xs = ray.get(r) if isinstance(r, ray.ObjectRef) else r

        def __call__(self, b: pa.Table) -> pa.Table:
            is_x = pc.cast(pc.is_in(b.column("l_suppkey"),
                                    value_set=self.xs), pa.int64())
            t = pa.table({"l_orderkey": b.column("l_orderkey"),
                          "c": _cents(b.column("l_extendedprice")),
                          "is_x": is_x})
            t = t.append_column(
                "cx", pc.multiply(t.column("c"), t.column("is_x")))
            g = t.group_by("l_orderkey").aggregate([("c", "sum"),
                                                    ("cx", "sum")])
            return pa.table({"l_orderkey": g.column("l_orderkey"),
                             "cents": g.column("c_sum"),
                             "x_cents": g.column("cx_sum")})

    class OrderMap:
        def __init__(self, r):
            self.rc, _ = ray.get(r) if isinstance(r, ray.ObjectRef) else r

        def __call__(self, b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_in(b.column("o_custkey"), value_set=self.rc))
            return pa.table({"o_orderkey": b.column("o_orderkey"),
                             "o_year": pc.year(b.column("o_orderdate"))})

    li = (read_parquet(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_suppkey", "l_extendedprice"])
          .map_batches(LiPartial, fn_constructor_args=(ref,), concurrency=(1, 4),
                       batch_format="pyarrow"))
    omap = (read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_orderdate"])
            .map_batches(OrderMap, fn_constructor_args=(ref,), concurrency=(1, 2),
                         batch_format="pyarrow"))
    joined = bucketed_join(li, omap, "l_orderkey", right_on="o_orderkey",
                           num_buckets=16)

    def fold(b: pa.Table) -> pa.Table:
        g = b.group_by("o_year").aggregate([("cents", "sum"),
                                            ("x_cents", "sum")])
        return pa.table({"o_year": g.column("o_year"),
                         "cents": g.column("cents_sum"),
                         "x_cents": g.column("x_cents_sum")})

    df = joined.map_batches(fold, batch_format="pyarrow").to_pandas()
    agg = df.groupby("o_year", as_index=False)[["cents", "x_cents"]].sum()
    # Mirror DuckDB exactly: cast EACH int to double, then ONE IEEE
    # division (Python int/int is correctly-rounded rational division,
    # which can differ by 1 ulp past 2^53 — cast first, like the SQL).
    agg["mkt_share"] = [float(int(x)) / float(int(c)) if c else 0.0
                        for x, c in zip(agg["x_cents"], agg["cents"])]
    agg["o_year"] = agg["o_year"].astype(np.int64)
    out = agg[["o_year", "mkt_share"]]
    return out.sort_values("o_year", kind="mergesort").reset_index(drop=True)


MARKET_SHARE_SQL = """
WITH base AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l.l_extendedprice*100) AS BIGINT) AS cents,
         CASE WHEN s.s_nationkey =
                   (SELECT n_nationkey FROM nation
                    WHERE n_name = 'NATION_3')
              THEN CAST(round(l.l_extendedprice*100) AS BIGINT)
              ELSE 0 END AS x_cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE c.c_nationkey IN
        (SELECT n_nationkey FROM nation WHERE n_regionkey =
         (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')))
SELECT o_year,
       CAST(sum(x_cents) AS DOUBLE) / CAST(sum(cents) AS DOUBLE)
         AS mkt_share
FROM base GROUP BY 1 ORDER BY 1
"""


# ---- per-part price spread ---------------------------------------------------


def price_spread_parts(sf_dir: str, k: int = 20):
    """Top-``k`` parts by the spread between the highest and lowest
    extended price ever charged (cents), with the distinct-supplier count
    — the price-dispersion screen. Per-batch (part → min,max) partials +
    distinct (part, supp) pairs fold in one part-hash bucket exchange;
    per-bucket heads (spread DESC, part ASC) merge driver-side, ≤ 32·k
    rows."""
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"p": b.column("l_partkey"),
                      "s": b.column("l_suppkey"),
                      "c": _cents(b.column("l_extendedprice"))})
        g = t.group_by(["p", "s"]).aggregate([("c", "min"), ("c", "max")])
        keys = g.column("p")
        return pa.table({
            "p": keys, "s": g.column("s"),
            "mn": g.column("c_min"), "mx": g.column("c_max"),
            "__b": pc.cast(pc.bit_wise_and(keys, 31), pa.int32())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("p", sort=False).agg(
            mn=("mn", "min"), mx=("mx", "max"), n_supp=("s", "nunique"))
        agg = agg.reset_index()
        agg["spread_cents"] = agg["mx"] - agg["mn"]
        agg = agg.sort_values(["spread_cents", "p"],
                              ascending=[False, True],
                              kind="mergesort").head(k)
        out = pd.DataFrame({
            "p_partkey": agg["p"].to_numpy().astype(np.int64),
            "n_suppliers": agg["n_supp"].to_numpy().astype(np.int64),
            "min_cents": agg["mn"].to_numpy().astype(np.int64),
            "max_cents": agg["mx"].to_numpy().astype(np.int64),
            "spread_cents": agg["spread_cents"].to_numpy()
            .astype(np.int64)})
        return out

    df = (li.map_batches(partial, batch_format="pyarrow")
          .groupby("__b").map_groups(per_bucket, batch_format="pandas")
          ).to_pandas()
    return (df.sort_values(["spread_cents", "p_partkey"],
                           ascending=[False, True], kind="mergesort")
            .head(k).reset_index(drop=True))


PRICE_SPREAD_SQL = """
WITH c AS (SELECT l_partkey, l_suppkey,
                  CAST(round(l_extendedprice*100) AS BIGINT) AS cents
           FROM lineitem),
a AS (SELECT l_partkey AS p_partkey,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
             min(cents) AS min_cents, max(cents) AS max_cents,
             max(cents) - min(cents) AS spread_cents
      FROM c GROUP BY 1)
SELECT p_partkey, n_suppliers, CAST(min_cents AS BIGINT) AS min_cents,
       CAST(max_cents AS BIGINT) AS max_cents,
       CAST(spread_cents AS BIGINT) AS spread_cents
FROM a ORDER BY spread_cents DESC, p_partkey LIMIT 20
"""


# ---- fulfillment lag distribution per priority -------------------------------


def ship_lag_priority(sf_dir: str):
    """Per order priority: lineitem count and the exact DISCRETE median of
    the ship lag (days between order date and ship date) — the
    fulfillment-SLA profile. The lag domain is a few hundred distinct
    day values, so (priority, lag) cells fold from one bucketed fact-fact
    join + per-batch partials; the median reads the cell histogram at
    rank ceil(n/2)−1 (quantile_disc 0.5 semantics)."""
    import math

    from ..stages.joins import bucketed_join

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_shipdate"])

    def li_part(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "ship_day": pc.divide(pc.cast(pc.cast(
                b.column("l_shipdate"), pa.timestamp("us")), pa.int64()),
                86_400_000_000)})

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_orderdate",
                                   "o_orderpriority"])

    def o_part(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_orderpriority": b.column("o_orderpriority"),
            "order_day": pc.divide(pc.cast(pc.cast(
                b.column("o_orderdate"), pa.timestamp("us")), pa.int64()),
                86_400_000_000)})

    joined = bucketed_join(li.map_batches(li_part, batch_format="pyarrow"),
                           orders.map_batches(o_part,
                                              batch_format="pyarrow"),
                           "l_orderkey", right_on="o_orderkey",
                           num_buckets=16)

    def cells(b: pa.Table) -> pa.Table:
        t = pa.table({
            "prio": b.column("o_orderpriority"),
            "lag": pc.subtract(b.column("ship_day"),
                               b.column("order_day"))})
        g = t.group_by(["prio", "lag"]).aggregate([("lag", "count")])
        return pa.table({"prio": g.column("prio"), "lag": g.column("lag"),
                         "n": pc.cast(g.column("lag_count"), pa.int64())})

    df = (joined.map_batches(cells, batch_format="pyarrow").to_pandas()
          .groupby(["prio", "lag"], as_index=False)["n"].sum())
    rows = []
    for prio, g in df.groupby("prio", sort=True):
        g = g.sort_values("lag", kind="mergesort")
        n = int(g["n"].sum())
        cum = np.cumsum(g["n"].to_numpy())
        rank = max(math.ceil(0.5 * n) - 1, 0)
        med = int(g["lag"].to_numpy()[np.searchsorted(cum, rank + 1)])
        rows.append((prio, np.int64(n), np.int64(med)))
    return pd.DataFrame(rows, columns=["o_orderpriority", "n_lines",
                                       "median_lag_days"])


SHIP_LAG_SQL = """
WITH j AS (
  SELECT o.o_orderpriority,
         epoch_us(l.l_shipdate) // 86400000000
           - epoch_us(o.o_orderdate) // 86400000000 AS lag
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(quantile_disc(lag, 0.5) AS BIGINT) AS median_lag_days
FROM j GROUP BY 1 ORDER BY 1
"""


# ---- Q6 shape: predicate-band forecast revenue (one scan, zero joins) -------


def forecast_revenue(sf_dir: str):
    """TPC-H Q6: revenue increase from discount-band lineitems — one pruned
    scan, per-batch single-row integer partials, zero exchanges.

    ``revenue = Σ price_cents · disc_pct`` (an exact int64: cents × a 0-100
    int) over rows with shipdate ∈ [1996, 1997), disc_pct ∈ [3, 5] and
    quantity < 24. Both engines evaluate the identical integer predicate
    (``round(x*100)`` → int), so no boundary row can flip."""
    from datetime import datetime

    lo, hi = datetime(1996, 1, 1), datetime(1997, 1, 1)

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("l_shipdate"), pa.scalar(lo)),
                    pc.less(b.column("l_shipdate"), pa.scalar(hi)))
        b = b.filter(m)
        disc = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100)),
                       pa.int64())
        qty = _cents(b.column("l_quantity"))
        keep = pc.and_(
            pc.and_(pc.greater_equal(disc, 3), pc.less_equal(disc, 5)),
            pc.less(qty, 2400))
        price = _cents(b.column("l_extendedprice")).filter(keep)
        d = disc.filter(keep)
        rev = int(pc.sum(pc.multiply(price, d)).as_py() or 0)
        return pa.table({"n": pa.array([len(price)], pa.int64()),
                         "rev": pa.array([rev], pa.int64())})

    df = (read_parquet(f"{sf_dir}/lineitem.parquet",
                       columns=["l_shipdate", "l_discount", "l_quantity",
                                "l_extendedprice"])
          .map_batches(partial, batch_format="pyarrow").to_pandas())
    n = int(df["n"].sum()) if len(df) else 0
    rev = int(df["rev"].sum()) if len(df) else 0
    return pd.DataFrame({"n_lines": pd.Series([n], dtype=np.int64),
                         "revenue_micents": pd.Series([rev], dtype=np.int64)})


FORECAST_REVENUE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(coalesce(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                         * CAST(round(l_discount*100) AS BIGINT)), 0)
            AS BIGINT) AS revenue_micents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 3 AND 5
  AND CAST(round(l_quantity*100) AS BIGINT) < 2400
"""


# ---- Q14 shape: promo revenue share (broadcast dim, one scan, one division) -


def promo_revenue_share(sf_dir: str):
    """TPC-H Q14: share of one month's discounted revenue coming from PROMO
    parts. The part→type map broadcasts once (gate documented); one pruned
    lineitem scan folds BOTH integer sums (promo / total micents, cents ×
    (100−disc)); the share is the single double division, spelled
    identically in SQL."""
    import ray

    from datetime import datetime

    part = read_dim_table(f"{sf_dir}/part.parquet",
                                      columns=["p_partkey", "p_type"], limit=_DIM_BROADCAST_LIMIT)
    ref = ray.put((part.column("p_partkey").combine_chunks(),
                   pc.equal(part.column("p_type"), "PROMO").combine_chunks()))
    lo, hi = datetime(1996, 3, 1), datetime(1996, 4, 1)

    class Partial:
        def __init__(self, r):
            self.pk, self.promo = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.greater_equal(b.column("l_shipdate"), pa.scalar(lo)),
                pc.less(b.column("l_shipdate"), pa.scalar(hi)))
            b = b.filter(m)
            idx = pc.index_in(b.column("l_partkey"), value_set=self.pk)
            is_promo = self.promo.take(idx).to_numpy(zero_copy_only=False)
            price = _cents(b.column("l_extendedprice")).to_numpy(
                zero_copy_only=False)
            disc = pc.cast(pc.round(pc.multiply(
                b.column("l_discount"), 100)), pa.int64()).to_numpy(
                zero_copy_only=False)
            rev = price * (100 - disc)
            total = int(rev.sum())
            promo = int(rev[is_promo == True].sum())  # noqa: E712
            return pa.table({"promo": pa.array([promo], pa.int64()),
                             "total": pa.array([total], pa.int64())})

    df = (read_parquet(f"{sf_dir}/lineitem.parquet",
                       columns=["l_partkey", "l_shipdate", "l_extendedprice",
                                "l_discount"])
          .map_batches(Partial, fn_constructor_args=(ref,), concurrency=(1, 4),
                       batch_format="pyarrow").to_pandas())
    promo = int(df["promo"].sum()) if len(df) else 0
    total = int(df["total"].sum()) if len(df) else 0
    share = float(promo) / float(total) if total else 0.0
    return pd.DataFrame({
        "promo_micents": pd.Series([promo], dtype=np.int64),
        "total_micents": pd.Series([total], dtype=np.int64),
        "promo_share": [share]})


PROMO_REVENUE_SQL = """
WITH b AS (
  SELECT CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT)) AS rev,
         p.p_type = 'PROMO' AS is_promo
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
    AND l.l_shipdate <  TIMESTAMP '1996-04-01')
SELECT CAST(coalesce(sum(CASE WHEN is_promo THEN rev ELSE 0 END), 0)
            AS BIGINT) AS promo_micents,
       CAST(coalesce(sum(rev), 0) AS BIGINT) AS total_micents,
       CAST(coalesce(sum(CASE WHEN is_promo THEN rev ELSE 0 END), 0)
            AS DOUBLE)
         / CAST(coalesce(sum(rev), 1) AS DOUBLE) AS promo_share
FROM b
"""


# ---- Q15 shape: top supplier(s) by quarterly revenue ------------------------


def top_supplier_revenue(sf_dir: str):
    """TPC-H Q15: the supplier(s) whose revenue over one quarter equals the
    global maximum. Per-supplier integer micent partials fold driver-side
    (bounded by the supplier dimension — gate documented); ties all
    return, ordered by suppkey, exactly like the SQL's ``= max`` subquery."""
    from datetime import datetime

    lo, hi = datetime(1996, 1, 1), datetime(1996, 4, 1)

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("l_shipdate"), pa.scalar(lo)),
                    pc.less(b.column("l_shipdate"), pa.scalar(hi)))
        b = b.filter(m)
        price = _cents(b.column("l_extendedprice")).to_numpy(
            zero_copy_only=False)
        disc = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100)),
                       pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"s": b.column("l_suppkey"),
                      "r": pa.array(price * (100 - disc), pa.int64())})
        g = t.group_by("s").aggregate([("r", "sum")])
        return pa.table({"s": g.column("s"), "rev": g.column("r_sum")})

    df = (read_parquet(f"{sf_dir}/lineitem.parquet",
                       columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                                "l_discount"])
          .map_batches(partial, batch_format="pyarrow").to_pandas())
    if not len(df):
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=object),
                             "revenue_micents": pd.Series([],
                                                          dtype=np.int64)})
    agg = df.groupby("s", as_index=False)["rev"].sum()
    if len(agg) > 50_000_000:
        raise ValueError("top_supplier_revenue driver fold gate: "
                         f"{len(agg)} suppliers; pre-bucket the fold")
    best = int(agg["rev"].max())
    win = agg[agg["rev"] == best].sort_values("s", kind="mergesort")
    supp = read_dim_table(f"{sf_dir}/supplier.parquet",
                                      columns=["s_suppkey", "s_name"], limit=_DIM_BROADCAST_LIMIT)
    idx = pc.index_in(pa.array(win["s"].to_numpy(np.int64)),
                      value_set=supp.column("s_suppkey"))
    return pd.DataFrame({
        "s_suppkey": win["s"].to_numpy(np.int64),
        "s_name": supp.column("s_name").take(idx).to_pandas().to_numpy(),
        "revenue_micents": np.full(len(win), best, dtype=np.int64)})


TOP_SUPPLIER_SQL = """
WITH r AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l_discount*100) AS BIGINT)))
              AS BIGINT) AS revenue_micents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, r.revenue_micents
FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.revenue_micents = (SELECT max(revenue_micents) FROM r)
ORDER BY s.s_suppkey
"""


# ---- Q10 shape: returned-item top customers ---------------------------------


def returned_revenue_customers(sf_dir: str, k: int = 20):
    """TPC-H Q10: top-k customers by revenue lost to returned items in one
    quarter. Lineitem pre-reduces returned rows to ``(orderkey → micents)``
    per batch; the order→custkey map (quarter-filtered) rides ONE bucketed
    hash join; the per-customer fold is bounded by the customer dimension
    (driver fold behind the gate); names/nations attach from broadcast
    dims. Ties break custkey ASC in both engines."""
    import ray

    from datetime import datetime

    from ..stages.joins import bucketed_join

    lo, hi = datetime(1996, 7, 1), datetime(1996, 10, 1)

    def li_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        price = _cents(b.column("l_extendedprice")).to_numpy(
            zero_copy_only=False)
        disc = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100)),
                       pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"l_orderkey": b.column("l_orderkey"),
                      "r": pa.array(price * (100 - disc), pa.int64())})
        g = t.group_by("l_orderkey").aggregate([("r", "sum")])
        return pa.table({"l_orderkey": g.column("l_orderkey"),
                         "rev": g.column("r_sum")})

    def o_map(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), pa.scalar(lo)),
                    pc.less(b.column("o_orderdate"), pa.scalar(hi)))
        b = b.filter(m)
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "o_custkey": b.column("o_custkey")})

    li = (read_parquet(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_returnflag",
                                "l_extendedprice", "l_discount"])
          .map_batches(li_partial, batch_format="pyarrow"))
    om = (read_parquet(f"{sf_dir}/orders.parquet",
                       columns=["o_orderkey", "o_custkey", "o_orderdate"])
          .map_batches(o_map, batch_format="pyarrow"))
    joined = bucketed_join(li, om, "l_orderkey", right_on="o_orderkey",
                           num_buckets=16)

    def fold(b: pa.Table) -> pa.Table:
        g = b.group_by("o_custkey").aggregate([("rev", "sum")])
        return pa.table({"c": g.column("o_custkey"),
                         "rev": g.column("rev_sum")})

    df = joined.map_batches(fold, batch_format="pyarrow").to_pandas()
    if not len(df):
        return pd.DataFrame({
            "c_custkey": pd.Series([], dtype=np.int64),
            "c_name": pd.Series([], dtype=object),
            "n_name": pd.Series([], dtype=object),
            "revenue_micents": pd.Series([], dtype=np.int64)})
    agg = df.groupby("c", as_index=False)["rev"].sum()
    if len(agg) > 50_000_000:
        raise ValueError("returned_revenue_customers driver fold gate: "
                         f"{len(agg)} customers; pre-bucket the fold")
    agg = agg.sort_values(["rev", "c"], ascending=[False, True],
                          kind="mergesort").head(k)
    cust = read_dim_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"], limit=_DIM_BROADCAST_LIMIT)
    nat = read_dim_table(f"{sf_dir}/nation.parquet",
                                     columns=["n_nationkey", "n_name"], limit=_DIM_BROADCAST_LIMIT)
    cidx = pc.index_in(pa.array(agg["c"].to_numpy(np.int64)),
                       value_set=cust.column("c_custkey"))
    nkey = cust.column("c_nationkey").take(cidx)
    nidx = pc.index_in(nkey, value_set=nat.column("n_nationkey"))
    return pd.DataFrame({
        "c_custkey": agg["c"].to_numpy(np.int64),
        "c_name": cust.column("c_name").take(cidx).to_pandas().to_numpy(),
        "n_name": nat.column("n_name").take(nidx).to_pandas().to_numpy(),
        "revenue_micents": agg["rev"].to_numpy(np.int64)})


RETURNED_REVENUE_SQL = """
WITH r AS (
  SELECT o.o_custkey,
         CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
              AS BIGINT) AS revenue_micents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-07-01'
    AND o.o_orderdate <  TIMESTAMP '1996-10-01'
  GROUP BY 1)
SELECT c.c_custkey, c.c_name, n.n_name, r.revenue_micents
FROM r
JOIN customer c ON c.c_custkey = r.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY r.revenue_micents DESC, c.c_custkey
LIMIT 20
"""


# ---- Q12 shape: conditional priority counts over a fact-fact join -----------


def priority_class_by_flag(sf_dir: str):
    """TPC-H Q12 adapted (no shipmode column): per returnflag, how many
    1996-shipped lineitems belong to HIGH-priority orders (1-URGENT/2-HIGH)
    vs lower. Lineitem pre-reduces to ``(orderkey, flag) → n`` per batch;
    the order→priority map rides ONE bucketed join; the 3-row conditional
    fold happens driver-side."""
    from datetime import datetime

    from ..stages.joins import bucketed_join

    lo, hi = datetime(1996, 1, 1), datetime(1997, 1, 1)

    def li_partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("l_shipdate"), pa.scalar(lo)),
                    pc.less(b.column("l_shipdate"), pa.scalar(hi)))
        b = b.filter(m)
        t = pa.table({"l_orderkey": b.column("l_orderkey"),
                      "flag": b.column("l_returnflag"),
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["l_orderkey", "flag"]).aggregate([("one", "sum")])
        return pa.table({"l_orderkey": g.column("l_orderkey"),
                         "flag": g.column("flag"),
                         "n": g.column("one_sum")})

    def o_map(b: pa.Table) -> pa.Table:
        pr = b.column("o_orderpriority")
        high = pc.or_(pc.equal(pr, "1-URGENT"), pc.equal(pr, "2-HIGH"))
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "high": pc.cast(high, pa.int64())})

    li = (read_parquet(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_returnflag", "l_shipdate"])
          .map_batches(li_partial, batch_format="pyarrow"))
    om = (read_parquet(f"{sf_dir}/orders.parquet",
                       columns=["o_orderkey", "o_orderpriority"])
          .map_batches(o_map, batch_format="pyarrow"))
    joined = bucketed_join(li, om, "l_orderkey", right_on="o_orderkey",
                           num_buckets=16)

    def fold(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False)
        high = b.column("high").to_numpy(zero_copy_only=False)
        t = pa.table({"flag": b.column("flag"),
                      "h": pa.array(n * high, pa.int64()),
                      "l": pa.array(n * (1 - high), pa.int64())})
        g = t.group_by("flag").aggregate([("h", "sum"), ("l", "sum")])
        return pa.table({"l_returnflag": g.column("flag"),
                         "high_lines": g.column("h_sum"),
                         "low_lines": g.column("l_sum")})

    df = (joined.map_batches(fold, batch_format="pyarrow").to_pandas()
          .groupby("l_returnflag", as_index=False)[["high_lines",
                                                    "low_lines"]].sum())
    df["high_lines"] = df["high_lines"].astype(np.int64)
    df["low_lines"] = df["low_lines"].astype(np.int64)
    return df.sort_values("l_returnflag",
                          kind="mergesort").reset_index(drop=True)


PRIORITY_CLASS_SQL = """
SELECT l.l_returnflag,
       CAST(coalesce(sum(CASE WHEN o.o_orderpriority IN
                                   ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS high_lines,
       CAST(coalesce(sum(CASE WHEN o.o_orderpriority NOT IN
                                   ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS low_lines
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1 ORDER BY 1
"""


# ---- Q19 shape: OR-of-bands discounted revenue ------------------------------


def band_revenue(sf_dir: str):
    """TPC-H Q19: revenue from lineitems matching ANY of three
    (brand, size-band, quantity-band) clauses. Part attrs broadcast once;
    one pruned lineitem scan evaluates the OR of three all-integer band
    predicates (no container column in this schema — size stands in) and
    folds ``(n, Σ cents·(100−disc))`` per batch."""
    import ray

    part = read_dim_table(f"{sf_dir}/part.parquet",
                                      columns=["p_partkey", "p_brand",
                                               "p_size"], limit=_DIM_BROADCAST_LIMIT)
    ref = ray.put((part.column("p_partkey").combine_chunks(),
                   part.column("p_brand").combine_chunks(),
                   pc.cast(part.column("p_size"),
                           pa.int64()).combine_chunks()))
    clauses = (("Brand#11", 1, 15, 100, 1100),
               ("Brand#22", 16, 30, 1000, 2000),
               ("Brand#33", 21, 50, 2000, 3000))

    class Partial:
        def __init__(self, r):
            pk, brand, size = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r)
            self.pk = pk
            self.brand = brand.to_numpy(zero_copy_only=False)
            self.size = size.to_numpy(zero_copy_only=False)

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(b.column("l_partkey"),
                              value_set=self.pk).to_numpy(
                zero_copy_only=False)
            brand = self.brand[idx]
            size = self.size[idx]
            qty = _cents(b.column("l_quantity")).to_numpy(
                zero_copy_only=False)
            keep = np.zeros(len(qty), dtype=bool)
            for br, s_lo, s_hi, q_lo, q_hi in clauses:
                keep |= ((brand == br) & (size >= s_lo) & (size <= s_hi)
                         & (qty >= q_lo) & (qty <= q_hi))
            price = _cents(b.column("l_extendedprice")).to_numpy(
                zero_copy_only=False)
            disc = pc.cast(pc.round(pc.multiply(
                b.column("l_discount"), 100)), pa.int64()).to_numpy(
                zero_copy_only=False)
            rev = int((price[keep] * (100 - disc[keep])).sum())
            return pa.table({"n": pa.array([int(keep.sum())], pa.int64()),
                             "rev": pa.array([rev], pa.int64())})

    df = (read_parquet(f"{sf_dir}/lineitem.parquet",
                       columns=["l_partkey", "l_quantity", "l_extendedprice",
                                "l_discount"])
          .map_batches(Partial, fn_constructor_args=(ref,), concurrency=(1, 4),
                       batch_format="pyarrow").to_pandas())
    n = int(df["n"].sum()) if len(df) else 0
    rev = int(df["rev"].sum()) if len(df) else 0
    return pd.DataFrame({"n_lines": pd.Series([n], dtype=np.int64),
                         "revenue_micents": pd.Series([rev],
                                                      dtype=np.int64)})


BAND_REVENUE_SQL = """
WITH b AS (
  SELECT CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT)) AS rev
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
         AND CAST(round(l.l_quantity*100) AS BIGINT) BETWEEN 100 AND 1100)
     OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 16 AND 30
         AND CAST(round(l.l_quantity*100) AS BIGINT) BETWEEN 1000 AND 2000)
     OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 21 AND 50
         AND CAST(round(l.l_quantity*100) AS BIGINT) BETWEEN 2000 AND 3000))
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(coalesce(sum(rev), 0) AS BIGINT) AS revenue_micents
FROM b
"""


# ---- Q20 shape: half-of-shipments correlated predicate ----------------------


def halfstock_suppliers(sf_dir: str):
    """TPC-H Q20 adapted (no partsupp.availqty): suppliers with parts whose
    1997 shipments exceed HALF their all-time shipments — the correlated
    half-sum predicate spelled as the exact cross-multiplication
    ``2·q97 > q_all`` over integer quantity cents. Per-batch partials group
    the narrow (suppkey, partkey) pair — bounded by |supplier|×|part| —
    and fold driver-side behind the gate."""
    from datetime import datetime

    lo, hi = datetime(1997, 1, 1), datetime(1998, 1, 1)

    def partial(b: pa.Table) -> pa.Table:
        q = _cents(b.column("l_quantity")).to_numpy(zero_copy_only=False)
        sd = b.column("l_shipdate")
        in97 = pc.and_(pc.greater_equal(sd, pa.scalar(lo)),
                       pc.less(sd, pa.scalar(hi))).to_numpy(
            zero_copy_only=False)
        t = pa.table({"s": b.column("l_suppkey"), "p": b.column("l_partkey"),
                      "q97": pa.array(q * in97, pa.int64()),
                      "qall": pa.array(q, pa.int64())})
        g = t.group_by(["s", "p"]).aggregate([("q97", "sum"),
                                              ("qall", "sum")])
        return pa.table({"s": g.column("s"), "p": g.column("p"),
                         "q97": g.column("q97_sum"),
                         "qall": g.column("qall_sum")})

    df = (read_parquet(f"{sf_dir}/lineitem.parquet",
                       columns=["l_suppkey", "l_partkey", "l_quantity",
                                "l_shipdate"])
          .map_batches(partial, batch_format="pyarrow").to_pandas())
    if not len(df):
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=object),
                             "n_half_parts": pd.Series([], dtype=np.int64)})
    agg = df.groupby(["s", "p"], as_index=False)[["q97", "qall"]].sum()
    if len(agg) > 50_000_000:
        raise ValueError("halfstock_suppliers driver fold gate: "
                         f"{len(agg)} supplier-part pairs; bucket the fold")
    agg = agg[2 * agg["q97"] > agg["qall"]]
    out = (agg.groupby("s", as_index=False)
           .agg(n_half_parts=("p", "size")))
    supp = read_dim_table(f"{sf_dir}/supplier.parquet",
                                      columns=["s_suppkey", "s_name"], limit=_DIM_BROADCAST_LIMIT)
    idx = pc.index_in(pa.array(out["s"].to_numpy(np.int64)),
                      value_set=supp.column("s_suppkey"))
    res = pd.DataFrame({
        "s_suppkey": out["s"].to_numpy(np.int64),
        "s_name": supp.column("s_name").take(idx).to_pandas().to_numpy(),
        "n_half_parts": out["n_half_parts"].to_numpy(np.int64)})
    return res.sort_values("s_suppkey", kind="mergesort").reset_index(
        drop=True)


HALFSTOCK_SQL = """
WITH sp AS (
  SELECT l_suppkey, l_partkey,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate <  TIMESTAMP '1998-01-01'
                  THEN CAST(round(l_quantity*100) AS BIGINT)
                  ELSE 0 END) AS q97,
         sum(CAST(round(l_quantity*100) AS BIGINT)) AS qall
  FROM lineitem GROUP BY 1, 2)
SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS n_half_parts
FROM sp JOIN supplier s ON s.s_suppkey = sp.l_suppkey
WHERE 2 * sp.q97 > sp.qall
GROUP BY 1, 2 ORDER BY 1
"""


# ---- Q9 shape: product-line profit by supplier nation and year --------------


def profit_by_nation_year(sf_dir: str, p_type: str = "PROMO"):
    """TPC-H Q9 adapted (no supplycost): discounted revenue from one product
    line, grouped by supplier nation × order year. The product-line part-key
    set and supplier→nation map broadcast once; lineitem pre-reduces each
    batch to ``(orderkey, nation) → micents``; the order→year map rides ONE
    bucketed join; the final (nation, year) fold is a few dozen rows."""
    import ray

    from ..stages.joins import bucketed_join

    nat = read_dim_table(f"{sf_dir}/nation.parquet",
                                     columns=["n_nationkey", "n_name"], limit=_DIM_BROADCAST_LIMIT)
    supp = read_dim_table(f"{sf_dir}/supplier.parquet",
                                      columns=["s_suppkey", "s_nationkey"], limit=_DIM_BROADCAST_LIMIT)
    part = read_dim_table(f"{sf_dir}/part.parquet",
                                      columns=["p_partkey", "p_type"], limit=_DIM_BROADCAST_LIMIT)
    nidx = pc.index_in(supp.column("s_nationkey"),
                       value_set=nat.column("n_nationkey"))
    supp_nation = nat.column("n_name").take(nidx).combine_chunks()
    pk = part.filter(pc.equal(part.column("p_type"), p_type)) \
             .column("p_partkey").combine_chunks()
    ref = ray.put((supp.column("s_suppkey").combine_chunks(), supp_nation,
                   pk))

    class LiPartial:
        def __init__(self, r):
            self.sk, self.sn, self.pk = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r)

        def __call__(self, b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_in(b.column("l_partkey"), value_set=self.pk))
            sidx = pc.index_in(b.column("l_suppkey"), value_set=self.sk)
            price = _cents(b.column("l_extendedprice")).to_numpy(
                zero_copy_only=False)
            disc = pc.cast(pc.round(pc.multiply(
                b.column("l_discount"), 100)), pa.int64()).to_numpy(
                zero_copy_only=False)
            t = pa.table({"l_orderkey": b.column("l_orderkey"),
                          "nation": self.sn.take(sidx),
                          "r": pa.array(price * (100 - disc), pa.int64())})
            g = t.group_by(["l_orderkey", "nation"]).aggregate([("r", "sum")])
            return pa.table({"l_orderkey": g.column("l_orderkey"),
                             "nation": g.column("nation"),
                             "rev": g.column("r_sum")})

    def o_map(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "o_year": pc.cast(pc.year(b.column("o_orderdate")),
                                           pa.int64())})

    li = (read_parquet(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey", "l_suppkey",
                                "l_extendedprice", "l_discount"])
          .map_batches(LiPartial, fn_constructor_args=(ref,), concurrency=(1, 4),
                       batch_format="pyarrow"))
    om = (read_parquet(f"{sf_dir}/orders.parquet",
                       columns=["o_orderkey", "o_orderdate"])
          .map_batches(o_map, batch_format="pyarrow"))
    joined = bucketed_join(li, om, "l_orderkey", right_on="o_orderkey",
                           num_buckets=16)

    def fold(b: pa.Table) -> pa.Table:
        g = b.group_by(["nation", "o_year"]).aggregate([("rev", "sum")])
        return pa.table({"nation": g.column("nation"),
                         "o_year": g.column("o_year"),
                         "profit_micents": g.column("rev_sum")})

    df = (joined.map_batches(fold, batch_format="pyarrow").to_pandas()
          .groupby(["nation", "o_year"], as_index=False)["profit_micents"]
          .sum())
    df["o_year"] = df["o_year"].astype(np.int64)
    df["profit_micents"] = df["profit_micents"].astype(np.int64)
    return (df.sort_values(["nation", "o_year"],
                           ascending=[True, False], kind="mergesort")
            .reset_index(drop=True))


PROFIT_BY_NATION_SQL = """
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
            AS BIGINT) AS profit_micents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_type = 'PROMO'
GROUP BY 1, 2 ORDER BY 1, 2 DESC
"""


# ---- return rate by brand ----------------------------------------------------


def return_rate_brand(sf_dir: str):
    """Per part brand: lineitem count, returned count (flag 'R') and the
    exact floor-ppm return rate. The part→brand map broadcasts once; one
    lineitem scan emits per-brand integer partials (≤ |brands| rows per
    batch); the 25-row fold happens driver-side."""
    import ray

    part = read_dim_table(f"{sf_dir}/part.parquet",
                                      columns=["p_partkey", "p_brand"], limit=_DIM_BROADCAST_LIMIT)
    ref = ray.put((part.column("p_partkey").combine_chunks(),
                   part.column("p_brand").combine_chunks()))

    class Partial:
        def __init__(self, r):
            self.pk, self.brand = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r)

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(b.column("l_partkey"), value_set=self.pk)
            ret = pc.cast(pc.equal(b.column("l_returnflag"), "R"),
                          pa.int64())
            t = pa.table({"brand": self.brand.take(idx),
                          "r": ret,
                          "one": pa.array(np.ones(b.num_rows, np.int64))})
            g = t.group_by("brand").aggregate([("one", "sum"),
                                               ("r", "sum")])
            return pa.table({"p_brand": g.column("brand"),
                             "n_lines": g.column("one_sum"),
                             "n_returned": g.column("r_sum")})

    df = (read_parquet(f"{sf_dir}/lineitem.parquet",
                       columns=["l_partkey", "l_returnflag"])
          .map_batches(Partial, fn_constructor_args=(ref,), concurrency=(1, 4),
                       batch_format="pyarrow").to_pandas()
          .groupby("p_brand", as_index=False)[["n_lines", "n_returned"]]
          .sum())
    df["n_lines"] = df["n_lines"].astype(np.int64)
    df["n_returned"] = df["n_returned"].astype(np.int64)
    df["return_ppm"] = (df["n_returned"] * 1_000_000) // df["n_lines"]
    return df.sort_values("p_brand", kind="mergesort").reset_index(
        drop=True)


RETURN_RATE_BRAND_SQL = """
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returned,
       CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS return_ppm
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1 ORDER BY 1
"""


# ---- pricing-consistency screen: per-part price variance -----------------------


def price_variance_parts(sf_dir: str, k: int = 20):
    """(p_partkey, n, var_x100) — the k parts whose charged price varies
    most across lineitems (pricing-consistency screen; the spread sibling
    is price_spread_parts). Per-batch (part, n, Σc, Σc²) integer partials
    ride one part-hash bucket exchange; population variance per part is
    the single float expression ``(n·S2 − S1²) / n²`` of exact ints
    (S2 ≤ n·(price_cents)² — int64-safe to ~10^5 rows per part at max
    price, Python-int driver fold past the per-bucket stage), spelled
    identically in SQL. Ties break partkey ASC."""
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_partkey", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        c = _cents(b.column("l_extendedprice")).to_numpy(
            zero_copy_only=False)
        t = pa.table({"p": b.column("l_partkey"),
                      "n": pa.array(np.ones(len(c), np.int64)),
                      "s1": pa.array(c),
                      "s2": pa.array(c * c)})
        g = t.group_by("p").aggregate([("n", "sum"), ("s1", "sum"),
                                       ("s2", "sum")])
        out = pa.table({"p": g.column("p"), "n": g.column("n_sum"),
                        "s1": g.column("s1_sum"), "s2": g.column("s2_sum")})
        return out.append_column(
            "__b", pc.cast(pc.bit_wise_and(out.column("p"), 31),
                           pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("p", sort=False)[["n", "s1", "s2"]].sum()
        n = agg["n"].to_numpy(np.int64)
        s1 = agg["s1"].to_numpy(np.int64)
        s2 = agg["s2"].to_numpy(np.int64)
        var = (n.astype(np.float64) * s2 - (s1.astype(np.float64)) * s1) \
            / (n.astype(np.float64) * n)
        out = pd.DataFrame({"p_partkey": agg.index.to_numpy(np.int64),
                            "n": n, "var_cents2": var})
        return out.sort_values(["var_cents2", "p_partkey"],
                               ascending=[False, True],
                               kind="mergesort").head(k)

    heads = (li.map_batches(partial, batch_format="pyarrow")
             .groupby("__b").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    out = heads.sort_values(["var_cents2", "p_partkey"],
                            ascending=[False, True],
                            kind="mergesort").head(k)
    out["p_partkey"] = out["p_partkey"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)


PRICE_VARIANCE_SQL = """
WITH s AS (
  SELECT l_partkey AS p_partkey, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS s1,
         sum(CAST(round(l_extendedprice*100) AS BIGINT)
             * CAST(round(l_extendedprice*100) AS BIGINT)) AS s2
  FROM lineitem GROUP BY 1)
SELECT p_partkey, n,
       (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_cents2
FROM s ORDER BY var_cents2 DESC, p_partkey LIMIT 20
"""


def blamed_suppliers(sf_dir: str):
    """Per supplier: in how many MULTI-supplier orders was it the UNIQUE
    owner of the latest ship date (the "supplier who held the order up" —
    TPC-H Q21's blame shape re-expressed over this corpus's columns,
    ship date standing in for the missing commit/receipt pair). The
    per-order state ``(mn_supp, mx_supp, max_ship, at_max_min_supp,
    at_max_max_supp)`` is ASSOCIATIVE: merging two partials keeps the
    later ship's at-max pair outright and min/max-merges the pair on a
    ship-date tie — so per-batch partials need only ONE order-hash
    exchange, and each bucket emits per-supplier counts (≤ |supplier|
    rows gather). An order qualifies iff mn ≠ mx (≥ 2 distinct
    suppliers) and the at-max pair is degenerate (a unique latest
    supplier — ties spread the blame and drop the order, in both
    engines by the same min=max test)."""
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table({
            "o": b.column("l_orderkey"), "s": b.column("l_suppkey"),
            "ship": pc.cast(pc.cast(b.column("l_shipdate"),
                                    pa.timestamp("us")), pa.int64()),
        }).to_pandas()
        g1 = df.groupby("o", sort=False).agg(
            mn=("s", "min"), mx=("s", "max"), ms=("ship", "max"))
        j = df.merge(g1["ms"], left_on="o", right_index=True)
        at = j[j["ship"] == j["ms"]].groupby("o", sort=False)["s"].agg(
            am_mn="min", am_mx="max")
        out = g1.join(at).reset_index()
        out["__b"] = (out["o"].to_numpy(np.int64) & 31).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g2 = g.groupby("o", sort=False).agg(
            mn=("mn", "min"), mx=("mx", "max"), ms=("ms", "max"))
        j = g.merge(g2["ms"].rename("gms"), left_on="o", right_index=True)
        at = j[j["ms"] == j["gms"]].groupby("o", sort=False).agg(
            am_mn=("am_mn", "min"), am_mx=("am_mx", "max"))
        q = g2.join(at)
        q = q[(q["mn"] != q["mx"]) & (q["am_mn"] == q["am_mx"])]
        cnt = q.groupby("am_mn", sort=False).size()
        return pd.DataFrame({
            "s_suppkey": cnt.index.to_numpy().astype(np.int64),
            "n_orders": cnt.to_numpy().astype(np.int64)})

    df = (li.map_batches(partial, batch_format="pyarrow")
          .groupby("__b").map_groups(per_bucket, batch_format="pandas")
          ).to_pandas()
    if "s_suppkey" not in df.columns:
        df = pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                           "n_orders": pd.Series([], dtype=np.int64)})
    df = df.groupby("s_suppkey", as_index=False)["n_orders"].sum()
    supp = read_dim_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"],
                          limit=_DIM_BROADCAST_LIMIT)
    out = df.merge(supp.to_pandas(), on="s_suppkey")
    out = out.sort_values(["n_orders", "s_suppkey"],
                          ascending=[False, True], kind="mergesort")
    return out[["s_suppkey", "s_name", "n_orders"]].reset_index(drop=True)


BLAMED_SUPPLIER_SQL = """
WITH per_o AS (
  SELECT l_orderkey, min(l_suppkey) AS mn, max(l_suppkey) AS mx,
         max(l_shipdate) AS ms
  FROM lineitem GROUP BY 1),
at_max AS (
  SELECT l.l_orderkey, min(l.l_suppkey) AS am_mn, max(l.l_suppkey) AS am_mx
  FROM lineitem l JOIN per_o p ON p.l_orderkey = l.l_orderkey
                              AND l.l_shipdate = p.ms
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS n_orders
FROM per_o JOIN at_max USING (l_orderkey)
JOIN supplier s ON s.s_suppkey = at_max.am_mn
WHERE per_o.mn <> per_o.mx AND at_max.am_mn = at_max.am_mx
GROUP BY 1, 2 ORDER BY n_orders DESC, s_suppkey
"""


def _skyline_sweep(df: pd.DataFrame) -> pd.DataFrame:
    """Non-dominated rows of (c=price_cents asc better, sz=size desc
    better): sort by (c asc, sz desc, key asc) and sweep a running max
    size. A row survives iff its size strictly exceeds every cheaper
    row's size, or exactly ties the running max at the SAME price (equal
    (c, sz) pairs are mutually non-dominating; equal sz at higher price
    is dominated via the strict-price clause)."""
    df = df.sort_values(["c", "sz", "p_partkey"],
                        ascending=[True, False, True], kind="mergesort")
    c = df["c"].to_numpy(np.int64)
    sz = df["sz"].to_numpy(np.int64)
    keep = np.zeros(len(df), dtype=bool)
    run_sz = -(1 << 62)
    run_c = -(1 << 62)
    for i in range(len(df)):
        if sz[i] > run_sz:
            keep[i] = True
            run_sz = sz[i]
            run_c = c[i]
        elif sz[i] == run_sz and c[i] == run_c:
            keep[i] = True
    return df[keep]


def skyline_parts(sf_dir: str):
    """The Pareto frontier (skyline) of parts on (retail price ↓ better,
    size ↑ better): every part for which no other part is at most as
    expensive AND at least as large with one strict — the classic
    multi-criteria shortlist query. Exact: prices in floor-round cents,
    sizes integral, dominance is pure integer comparison; equal
    (price, size) twins are mutually non-dominating and both survive, in
    both engines by the same strictness clause.

    Scale shape: the distributed-skyline algorithm — each batch emits its
    LOCAL skyline (skyline-of-skylines = skyline, an associative
    reduction; a local skyline is bounded by the batch's distinct size
    count), and the driver merges candidate sets orders of magnitude
    smaller than the input. The O(n²) NOT-EXISTS shape exists only in
    the oracle."""
    pt = read_parquet(f"{sf_dir}/part.parquet",
                      columns=["p_partkey", "p_retailprice", "p_size"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "p_partkey": b.column("p_partkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "c": pc.cast(pc.round(pc.multiply(
                b.column("p_retailprice"), 100)), pa.int64()).to_numpy(
                zero_copy_only=False),
            "sz": b.column("p_size").to_numpy(
                zero_copy_only=False).astype(np.int64)})
        return pa.Table.from_pandas(_skyline_sweep(df),
                                    preserve_index=False) \
            .replace_schema_metadata(None)

    cand = pt.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(cand):
        return pd.DataFrame({
            "p_partkey": pd.Series([], dtype=np.int64),
            "price_cents": pd.Series([], dtype=np.int64),
            "size": pd.Series([], dtype=np.int64)})
    out = _skyline_sweep(cand).rename(
        columns={"c": "price_cents", "sz": "size"})
    out = out.sort_values(["price_cents", "size", "p_partkey"],
                          ascending=[True, False, True], kind="mergesort")
    return out[["p_partkey", "price_cents", "size"]].astype(np.int64) \
        .reset_index(drop=True)


SKYLINE_SQL = """
WITH p AS (SELECT p_partkey,
                  CAST(round(p_retailprice * 100) AS BIGINT) AS c,
                  CAST(p_size AS BIGINT) AS sz
           FROM part)
SELECT a.p_partkey, a.c AS price_cents, a.sz AS size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.c <= a.c AND b.sz >= a.sz AND (b.c < a.c OR b.sz > a.sz))
ORDER BY price_cents, size DESC, a.p_partkey
"""
