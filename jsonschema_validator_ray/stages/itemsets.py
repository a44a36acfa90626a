"""Frequent-itemset pair mining — market-basket co-occurrence counting.

``cooccur_pairs`` counts, for every unordered pair of DISTINCT items that
ever share a basket, the number of baskets containing both (the pair's
*support*) — the A-priori counting primitive behind "parts bought
together" / "tokens co-occurring in a document" analyses.

Scale shape (the 100-TB contract):
- exchange 1 hash-buckets BASKETS, so each bucket task holds complete
  baskets; it dedups ``(basket, item)``, self-merges per basket into
  ordered pairs (``item_a < item_b``) and PRE-AGGREGATES pair counts
  within the bucket — the combiner, so the second exchange carries one
  row per distinct pair per bucket, never one row per co-occurrence;
- exchange 2 hash-buckets PAIRS and folds the partials to global
  supports, filtering ``min_support`` inside the fold.
Only key/item integers ride the exchanges; payload columns are pruned at
the read by the caller. Pair fan-out is quadratic in basket SIZE, so the
operator takes ``max_basket`` (drop pathological baskets, counted
honestly — the standard guard in co-occurrence mining over web data
where one bad crawl page can contain a million items).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _basket_bucket(s: pd.Series, num_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(s, index=False).to_numpy()
    return (h.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)


def cooccur_pairs(ds, basket: str, item: str, *, min_support: int = 2,
                  max_basket: int | None = None, num_buckets: int = 32,
                  batch_size: int = 65536):
    """→ Dataset ``(item_a, item_b, support)`` with ``item_a < item_b``
    and ``support >= min_support``: the number of distinct baskets in
    ``ds`` containing both items. Baskets larger than ``max_basket``
    distinct items (when set) are skipped whole."""
    import pyarrow as pa

    def add_bucket(b: "pa.Table") -> "pa.Table":
        kb = _basket_bucket(b.select([basket]).to_pandas()[basket],
                            num_buckets)
        return b.select([basket, item]).append_column("__kb", pa.array(kb))

    def pairs_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__kb").drop_duplicates([basket, item])
        if max_basket is not None:
            g = g[g.groupby(basket, sort=False, dropna=False)[item]
                   .transform("size") <= max_basket]
        m = g.merge(g, on=basket, suffixes=("_a", "_b"))
        ia, ib = f"{item}_a", f"{item}_b"
        m = m[m[ia] < m[ib]]
        out = (m.groupby([ia, ib], sort=False, dropna=False)
                .size().reset_index(name="__n"))
        return out.rename(columns={ia: "item_a", ib: "item_b"})

    partials = (ds.map_batches(add_bucket, batch_format="pyarrow",
                               batch_size=batch_size)
                  .groupby("__kb")
                  .map_groups(pairs_partial, batch_format="pandas"))

    def add_pair_bucket(b: "pa.Table") -> "pa.Table":
        df = b.select(["item_a", "item_b"]).to_pandas()
        pb = (pd.util.hash_pandas_object(df, index=False).to_numpy()
                .astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        return b.append_column("__pb", pa.array(pb))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby(["item_a", "item_b"], sort=False, dropna=False)
              ["__n"].sum().reset_index(name="support"))
        s = s[s["support"] >= min_support]
        s["support"] = s["support"].astype("int64")
        return s

    return (partials.map_batches(add_pair_bucket, batch_format="pyarrow")
                    .groupby("__pb")
                    .map_groups(lambda g: fold(g.drop(columns="__pb")),
                                batch_format="pandas"))


def assoc_rules(ds, basket: str, item: str, *, min_support: int = 2,
                max_basket: int | None = None, broadcast_limit: int = 5_000_000,
                num_buckets: int = 32, batch_size: int = 65536):
    """→ Dataset ``(item_a, item_b, support, conf_ab, conf_ba, lift)`` —
    association-rule scores over the co-occurrence pairs: for each
    surviving pair, the rule confidences ``support(ab)/support(a)`` (and
    b→a) and the lift ``support(ab)·N / (support(a)·support(b))`` with
    ``N`` = distinct baskets.

    Float parity contract: every score is ONE IEEE-754 division of two
    exactly-representable integers (int64 → float64 is exact below 2^53,
    and the lift products stay far below it for any realistic vocabulary),
    so the values compare bit-exactly against the SQL oracle.

    Item supports come from the two-phase grouped-distinct exchange
    (stages/uniqueness.group_distinct_count — pairs move once, baskets
    never do) and are BROADCAST into the pair stream as a plain dict when
    the item vocabulary is below ``broadcast_limit`` rows; beyond that the
    caller should join (the vocabulary of a 100-TB corpus still fits — it
    is items, not pairs)."""
    import pyarrow as pa

    from .uniqueness import group_distinct_count

    pairs = cooccur_pairs(ds, basket, item, min_support=min_support,
                          max_basket=max_basket, num_buckets=num_buckets,
                          batch_size=batch_size)
    sup = group_distinct_count(ds, item, basket,
                               batch_size=batch_size).to_pandas()
    if len(sup) > broadcast_limit:
        raise ValueError(
            f"item vocabulary {len(sup)} exceeds broadcast_limit "
            f"{broadcast_limit}; join item supports instead of broadcasting")
    sup_map = dict(zip(sup[item], sup["n_distinct"].astype(np.int64)))
    n_baskets = np.int64(
        group_distinct_count(
            ds.map_batches(
                lambda b: b.select([basket]).append_column(
                    "__one", pa.array(np.zeros(b.num_rows, np.int8))),
                batch_format="pyarrow", batch_size=batch_size),
            "__one", basket).to_pandas()["n_distinct"].iloc[0])

    def score(b: "pa.Table") -> "pa.Table":
        df = b.to_pandas()
        sa = df["item_a"].map(sup_map).to_numpy(np.int64)
        sb = df["item_b"].map(sup_map).to_numpy(np.int64)
        sab = df["support"].to_numpy(np.int64)
        return pa.table({
            "item_a": b.column("item_a"), "item_b": b.column("item_b"),
            "support": b.column("support"),
            "conf_ab": sab.astype(np.float64) / sa.astype(np.float64),
            "conf_ba": sab.astype(np.float64) / sb.astype(np.float64),
            "lift": (sab * n_baskets).astype(np.float64)
                    / (sa * sb).astype(np.float64)})

    return pairs.map_batches(score, batch_format="pyarrow")


def cooccur_triples(ds, basket: str, item: str, *, min_support: int = 2,
                    max_basket: int | None = None, num_buckets: int = 32,
                    batch_size: int = 65536):
    """→ Dataset ``(item_a, item_b, item_c, support)`` with
    ``item_a < item_b < item_c`` and ``support >= min_support`` — the
    3-itemset extension of :func:`cooccur_pairs`, same two-exchange shape:
    baskets co-locate by basket-hash bucket, each bucket enumerates its
    triples with two ordered C-path self-merges (never a Python loop over
    baskets), and the distinct-triple partials fold in a second exchange.
    ``max_basket`` guards the cubic blowup of pathological baskets —
    skipped whole, like the pair miner."""
    import pyarrow as pa

    def add_bucket(b: "pa.Table") -> "pa.Table":
        kb = _basket_bucket(b.select([basket]).to_pandas()[basket],
                            num_buckets)
        return b.select([basket, item]).append_column("__kb", pa.array(kb))

    def triples_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__kb").drop_duplicates([basket, item])
        if max_basket is not None:
            g = g[g.groupby(basket, sort=False, dropna=False)[item]
                   .transform("size") <= max_basket]
        m = g.merge(g, on=basket, suffixes=("_a", "_b"))
        ia, ib = f"{item}_a", f"{item}_b"
        m = m[m[ia] < m[ib]]
        m = m.merge(g.rename(columns={item: "item_c"}), on=basket)
        m = m[m[ib] < m["item_c"]]
        out = (m.groupby([ia, ib, "item_c"], sort=False, dropna=False)
                .size().reset_index(name="__n"))
        return out.rename(columns={ia: "item_a", ib: "item_b"})

    partials = (ds.map_batches(add_bucket, batch_format="pyarrow",
                               batch_size=batch_size)
                  .groupby("__kb")
                  .map_groups(triples_partial, batch_format="pandas"))

    def add_triple_bucket(b: "pa.Table") -> "pa.Table":
        df = b.select(["item_a", "item_b", "item_c"]).to_pandas()
        pb = (pd.util.hash_pandas_object(df, index=False).to_numpy()
                .astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        return b.append_column("__pb", pa.array(pb))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby(["item_a", "item_b", "item_c"], sort=False,
                       dropna=False)["__n"].sum().reset_index(name="support"))
        s = s[s["support"] >= min_support]
        s["support"] = s["support"].astype("int64")
        return s

    return (partials.map_batches(add_triple_bucket, batch_format="pyarrow")
                    .groupby("__pb")
                    .map_groups(fold, batch_format="pandas"))
