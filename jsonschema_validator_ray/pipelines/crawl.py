"""Crawl-curation operators over the synthesized URL table: URL
canonicalization, robots-style path filtering, and exact water-filling
per-host crawl budgets.

URLs come from the deterministic synthesis in :mod:`.weburls` (the same
expression spelled in every oracle), made deliberately MESSY here — mixed
host case, explicit default ports, fragments — so canonicalization has
real work to do. All three operators are single-scan with bounded
exchanges: canonicalization is pure per-batch string kernels; the robots
filter broadcasts its (domain, prefix) rule set; the budget solver folds
per-host counts (host-bounded) and runs the exact integer water-fill on
the driver, mirrored step-for-step by the SQL oracle's window algebra.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.urls import parse_url_parts
from ..sources.parquet import read_parquet


def _messy_urls(b: pa.Table) -> "pa.Array":
    """Deterministically messy URL per document::

        https://{SOURCE-case}.example.{lang}[:443]/{lang}/doc-{id}[#frag]

    - host is UPPERCASED when doc_id % 2 == 0;
    - an explicit default port ``:443`` appears when doc_id % 7 == 0;
    - a ``#sec-N`` fragment (N = doc_id % 4) appears when doc_id % 3 == 0.
    """
    did = b.column("doc_id")
    dstr = pc.cast(did, pa.string())
    empty = pa.nulls(b.num_rows, pa.string()).fill_null("")

    def mod_is(m: int):
        return pc.equal(pc.subtract(did, pc.multiply(
            pc.divide(did, m), m)), 0)

    host = pc.binary_join_element_wise(
        b.column("source"), ".example.", b.column("lang"), "")
    host = pc.if_else(mod_is(2), pc.utf8_upper(host), host)
    port = pc.if_else(mod_is(7), pa.nulls(b.num_rows, pa.string())
                      .fill_null(":443"), empty)
    fragn = pc.cast(pc.subtract(did, pc.multiply(pc.divide(did, 4), 4)),
                    pa.string())
    frag = pc.if_else(mod_is(3),
                      pc.binary_join_element_wise("#sec-", fragn, ""),
                      empty)
    return pc.binary_join_element_wise(
        "https://", host, port, "/", b.column("lang"), "/doc-", dstr,
        frag, "")


def canonical_url_documents(sf_dir: str):
    """Per document: the messy URL and its canonical form — lowercase
    host, default ports (:443 for https, :80 for http) stripped, fragment
    dropped — the normalization every crawl dedup keys on. Pure per-batch
    Arrow string kernels; the oracle reproduces each rule with SQL string
    functions on the same messy input."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "source", "lang"])

    def canon(b: pa.Table) -> pa.Table:
        url = _messy_urls(b)
        nofrag = pc.replace_substring_regex(url, r"#.*$", "")
        # lower ONLY the scheme+authority prefix: split at the first '/'
        # after '://' via one extract, lower it, and rejoin the tail
        st = pc.extract_regex(nofrag,
                              r"^(?P<head>[A-Za-z][A-Za-z0-9+.-]*://"
                              r"[^/]*)(?P<tail>/.*)?$")
        head = pc.utf8_lower(pc.struct_field(st, "head"))
        head = pc.replace_substring_regex(head, r":443$", "")
        head = pc.replace_substring_regex(head, r":80$", "")
        tail = pc.struct_field(st, "tail").fill_null("")
        canonical = pc.binary_join_element_wise(head, tail, "")
        return pa.table({"doc_id": b.column("doc_id"), "url": url,
                         "canonical_url": canonical})

    return docs.map_batches(canon, batch_format="pyarrow")


CANONICAL_URL_SQL = """
WITH m AS (
  SELECT doc_id,
         'https://'
         || (CASE WHEN doc_id % 2 = 0
                  THEN upper(source || '.example.' || lang)
                  ELSE source || '.example.' || lang END)
         || (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END)
         || '/' || lang || '/doc-' || CAST(doc_id AS VARCHAR)
         || (CASE WHEN doc_id % 3 = 0
                  THEN '#sec-' || CAST(doc_id % 4 AS VARCHAR)
                  ELSE '' END) AS url,
         'https://'
         || lower(source || '.example.' || lang)
         || '/' || lang || '/doc-' || CAST(doc_id AS VARCHAR)
           AS canonical_url
  FROM documents)
SELECT doc_id, url, canonical_url FROM m
"""


def robots_filter_documents(sf_dir: str):
    """Per domain: how many documents survive a robots-style disallow
    rule set (path-prefix blocks per domain) and how many are blocked.
    The rule set broadcasts once (``ray.put``); the prefix test is a
    vectorized ``starts_with`` OR-fold per batch — the shape of a real
    robots gate over a crawl (rules per registrable domain, millions of
    pages streamed through).

    Rules here (deterministic, mirrored in SQL): on every domain, paths
    under ``/de/`` and ``/fr/`` are disallowed."""
    import ray

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "source", "lang"])
    disallow = ("/de/", "/fr/")
    ref = ray.put(disallow)

    class Gate:
        def __init__(self, r):
            self.prefixes = (ray.get(r)
                             if isinstance(r, ray.ObjectRef) else r)

        def __call__(self, b: pa.Table) -> pa.Table:
            from ..pipelines.weburls import _synth_urls

            parts = parse_url_parts(_synth_urls(b))
            path = parts.column("path").fill_null("")
            blocked = pa.nulls(b.num_rows, pa.bool_()).fill_null(False)
            for p in self.prefixes:
                blocked = pc.or_(blocked, pc.starts_with(path, p))
            t = pa.table({"domain": parts.column("domain"),
                          "blk": pc.cast(blocked, pa.int64())})
            g = t.group_by("domain").aggregate([("blk", "sum"),
                                                ("blk", "count")])
            return pa.table({
                "domain": g.column("domain"),
                "n_blocked": g.column("blk_sum"),
                "n": pc.cast(g.column("blk_count"), pa.int64())})

    df = (docs.map_batches(Gate, fn_constructor_args=(ref,), concurrency=(1, 2),
                           batch_format="pyarrow").to_pandas()
          .groupby("domain", as_index=False)[["n_blocked", "n"]].sum())
    df["n_allowed"] = df["n"] - df["n_blocked"]
    for c in ("n_blocked", "n", "n_allowed"):
        df[c] = df[c].astype(np.int64)
    return (df[["domain", "n", "n_allowed", "n_blocked"]]
            .sort_values("domain", kind="mergesort").reset_index(drop=True))


ROBOTS_FILTER_SQL = """
WITH u AS (
  SELECT 'example.' || lang AS domain,
         '/' || lang || '/doc-' || CAST(doc_id AS VARCHAR) AS path
  FROM documents)
SELECT domain, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN path LIKE '/de/%' OR path LIKE '/fr/%'
                THEN 0 ELSE 1 END) AS BIGINT) AS n_allowed,
       CAST(sum(CASE WHEN path LIKE '/de/%' OR path LIKE '/fr/%'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
FROM u GROUP BY 1 ORDER BY domain
"""


def crawl_budget_hosts(sf_dir: str, budget: int = 300):
    """Exact integer water-filling of a crawl budget over hosts: allocate
    ``min(n_docs, c)`` per host with the level ``c`` chosen so the total
    equals ``budget`` exactly — small hosts keep everything, big hosts cap
    at the fair level, and the division remainder goes to the first capped
    hosts in deterministic ``(n_docs, host)`` order.

    Per-host counts fold from per-batch partials (host-bounded); the
    water-fill itself is a driver-side pass over the sorted counts in
    pure Python ints — the SQL oracle computes the identical level and
    remainder with window prefix sums."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        from ..pipelines.weburls import _synth_urls

        parts = parse_url_parts(_synth_urls(b))
        vc = parts.column("host").combine_chunks().value_counts()
        return pa.table({
            "host": pc.struct_field(vc, "values"),
            "n": pc.cast(pc.struct_field(vc, "counts"), pa.int64())})

    df = (docs.map_batches(partial, batch_format="pyarrow").to_pandas()
          .groupby("host", as_index=False)["n"].sum()
          .sort_values(["n", "host"], kind="mergesort")
          .reset_index(drop=True))
    total = int(df["n"].sum())
    if budget >= total:
        df["allocated"] = df["n"]
    else:
        hosts = len(df)
        pref = 0
        lvl = 0                      # rows 0..lvl-1 fully served
        alloc_cap, rem = 0, 0
        for i, n_i in enumerate(df["n"]):
            n_i = int(n_i)
            # capping everyone from row i at their own n_i level:
            if pref + n_i * (hosts - i) > budget:
                m = hosts - i
                alloc_cap = (budget - pref) // m
                rem = (budget - pref) % m
                lvl = i
                break
            pref += n_i
        else:
            lvl, alloc_cap, rem = hosts, 0, 0
        alloc = []
        for i, n_i in enumerate(df["n"]):
            if i < lvl:
                alloc.append(int(n_i))
            else:
                alloc.append(alloc_cap + (1 if (i - lvl) < rem else 0))
        df["allocated"] = alloc
    df["n"] = df["n"].astype(np.int64)
    df["allocated"] = df["allocated"].astype(np.int64)
    return (df[["host", "n", "allocated"]]
            .sort_values("host", kind="mergesort").reset_index(drop=True))


CRAWL_BUDGET_SQL = """
WITH u AS (
  SELECT (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
           || source || '.example.' || lang AS host
  FROM documents),
h AS (SELECT host, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1),
o AS (SELECT host, n,
             row_number() OVER (ORDER BY n, host) AS rn,
             sum(n) OVER (ORDER BY n, host
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pref,
             count(*) OVER () AS hosts
      FROM h),
lvl AS (SELECT min(rn) AS lvl_rn FROM o
        WHERE coalesce(pref, 0) + n * (hosts - rn + 1) > 300),
p AS (SELECT o.*, coalesce(l.lvl_rn, o.hosts + 1) AS lvl_rn,
             (SELECT coalesce(max(coalesce(o2.pref, 0) + o2.n), 0)
              FROM o o2, lvl l2
              WHERE o2.rn < coalesce(l2.lvl_rn, o2.hosts + 1)) AS pref_lvl
      FROM o, lvl l)
SELECT host, n,
       CAST(CASE WHEN rn < lvl_rn THEN n
            ELSE (300 - pref_lvl) // (hosts - lvl_rn + 1)
                 + (CASE WHEN rn - lvl_rn <
                         (300 - pref_lvl) % (hosts - lvl_rn + 1)
                    THEN 1 ELSE 0 END)
            END AS BIGINT) AS allocated
FROM p ORDER BY host
"""
