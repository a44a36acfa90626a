"""URL / domain analytics over the documents table — the web-corpus side
of the engine (BASELINE.json keys the north-star corpus by ``url``).

The testdata documents table carries no URL column, so these queries first
SYNTHESIZE one deterministically from ``(source, lang, doc_id)`` — the same
expression is spelled in the oracle SQL — then exercise the vectorized
URL-decomposition kernel (:mod:`..functions.urls`) and domain-level
aggregation on top of it. The oracle derives every expected field
INDEPENDENTLY from the construction arithmetic (not by re-parsing), so the
comparison checks the parser against ground truth.

Synthesized shape (all branches integer-deterministic)::

    https://[www.]{source}.example.{lang}[:8443]/{lang}/doc-{doc_id}[?ref=N]

    www.   present iff doc_id % 5 == 0
    :8443  present iff doc_id % 7 == 0
    ?ref=N present iff doc_id % 3 == 0, N = doc_id % 11
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.urls import parse_url_parts
from ..sources.parquet import read_parquet

_DOC_COLS = ["doc_id", "source", "lang", "n_chars"]


def _synth_urls(b: pa.Table) -> "pa.Array":
    """The deterministic URL expression, fully vectorized."""
    did = b.column("doc_id")
    dstr = pc.cast(did, pa.string())
    empty = pa.nulls(b.num_rows, pa.string()).fill_null("")

    def mod_is(m: int, r: int = 0):
        # doc_id % m for nonnegative ids (Arrow int divide truncates)
        return pc.equal(pc.subtract(did, pc.multiply(
            pc.divide(did, m), m)), r)

    www = pc.if_else(mod_is(5), pa.nulls(b.num_rows, pa.string())
                     .fill_null("www."), empty)
    port = pc.if_else(mod_is(7), pa.nulls(b.num_rows, pa.string())
                      .fill_null(":8443"), empty)
    refn = pc.cast(pc.subtract(did, pc.multiply(pc.divide(did, 11), 11)),
                   pa.string())
    query = pc.if_else(mod_is(3),
                       pc.binary_join_element_wise("?ref=", refn, ""),
                       empty)
    return pc.binary_join_element_wise(
        "https://", www, b.column("source"), ".example.", b.column("lang"),
        port, "/", b.column("lang"), "/doc-", dstr, query, "")


def url_parts_documents(sf_dir: str):
    """Per document: the synthesized URL decomposed by the vectorized
    kernel — scheme, host, port, domain, tld, path, query, path_depth.
    One fused scan, no exchange; the oracle reconstructs each field from
    the construction arithmetic."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "source", "lang"])

    def parse(b: pa.Table) -> pa.Table:
        parts = parse_url_parts(_synth_urls(b))
        return pa.table({"doc_id": b.column("doc_id"),
                         **{n: parts.column(n) for n in
                            ("scheme", "host", "port", "path", "query",
                             "domain", "tld", "path_depth")}})

    return docs.map_batches(parse, batch_format="pyarrow")


URL_PARTS_SQL = """
SELECT doc_id,
       'https' AS scheme,
       (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
         || source || '.example.' || lang AS host,
       CAST(CASE WHEN doc_id % 7 = 0 THEN 8443 ELSE -1 END AS BIGINT)
         AS port,
       '/' || lang || '/doc-' || CAST(doc_id AS VARCHAR) AS path,
       CASE WHEN doc_id % 3 = 0
            THEN 'ref=' || CAST(doc_id % 11 AS VARCHAR) ELSE '' END
         AS query,
       'example.' || lang AS domain,
       lang AS tld,
       CAST(2 AS BIGINT) AS path_depth
FROM documents
"""


def domain_stats_documents(sf_dir: str):
    """Per (domain, tld): document count, total chars, distinct hosts and
    sources — the domain-budget aggregate a crawl-curation pipeline runs
    before sampling. Each batch pre-reduces to distinct
    ``(domain, tld, host, source)`` cells with count/char partials (bounded
    by |sources|×|langs|×2, NOT corpus rows), and the driver folds the tiny
    partial set."""
    docs = read_parquet(f"{sf_dir}/documents.parquet", columns=_DOC_COLS)

    def partial(b: pa.Table) -> pa.Table:
        parts = parse_url_parts(_synth_urls(b))
        t = pa.table({"domain": parts.column("domain"),
                      "tld": parts.column("tld"),
                      "host": parts.column("host"),
                      "source": b.column("source"),
                      "chars": b.column("n_chars")})
        g = t.group_by(["domain", "tld", "host", "source"]).aggregate(
            [("chars", "sum"), ("chars", "count")])
        return pa.table({"domain": g.column("domain"),
                         "tld": g.column("tld"),
                         "host": g.column("host"),
                         "source": g.column("source"),
                         "chars": g.column("chars_sum"),
                         "n": pc.cast(g.column("chars_count"), pa.int64())})

    df = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    cells = df.groupby(["domain", "tld", "host", "source"],
                       as_index=False)[["chars", "n"]].sum()
    out = (cells.groupby(["domain", "tld"], as_index=False)
           .agg(n_docs=("n", "sum"), total_chars=("chars", "sum"),
                n_hosts=("host", "nunique"), n_sources=("source", "nunique")))
    for c in ("n_docs", "total_chars", "n_hosts", "n_sources"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["domain", "tld"], kind="mergesort")
            .reset_index(drop=True))


DOMAIN_STATS_SQL = """
WITH u AS (
  SELECT doc_id, n_chars, source,
         (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
           || source || '.example.' || lang AS host,
         'example.' || lang AS domain,
         lang AS tld
  FROM documents)
SELECT domain, tld,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM u GROUP BY 1, 2 ORDER BY domain, tld
"""


def deep_path_hosts(sf_dir: str, min_extra: int = 1):
    """Hosts serving 'deep' URLs — here: ported or query-carrying ones —
    ranked by how many such URLs they serve and the share (ppm, floor) of
    their documents that are deep. Exercises port/query decomposition as a
    grouping predicate; integers only (ppm via floor division)."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        parts = parse_url_parts(_synth_urls(b))
        deep = pc.cast(pc.or_(pc.greater(parts.column("port"), 0),
                              pc.greater(pc.binary_length(
                                  parts.column("query")), 0)), pa.int64())
        t = pa.table({"host": parts.column("host"), "deep": deep})
        g = t.group_by("host").aggregate([("deep", "sum"),
                                          ("deep", "count")])
        return pa.table({"host": g.column("host"),
                         "n_deep": g.column("deep_sum"),
                         "n": pc.cast(g.column("deep_count"), pa.int64())})

    df = (docs.map_batches(partial, batch_format="pyarrow").to_pandas()
          .groupby("host", as_index=False)[["n_deep", "n"]].sum())
    df = df[df["n_deep"] >= min_extra]
    # exact ppm: floor division of two nonnegative ints (DuckDB // same)
    df["deep_ppm"] = (df["n_deep"] * 1_000_000) // df["n"]
    for c in ("n_deep", "n", "deep_ppm"):
        df[c] = df[c].astype(np.int64)
    df = df.rename(columns={"n": "n_docs"})
    return (df[["host", "n_deep", "n_docs", "deep_ppm"]]
            .sort_values(["n_deep", "host"], ascending=[False, True],
                         kind="mergesort").reset_index(drop=True))


DEEP_PATH_HOSTS_SQL = """
WITH u AS (
  SELECT (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
           || source || '.example.' || lang AS host,
         CASE WHEN doc_id % 7 = 0 OR doc_id % 3 = 0 THEN 1 ELSE 0 END
           AS deep
  FROM documents)
SELECT host, CAST(sum(deep) AS BIGINT) AS n_deep,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST((sum(deep) * 1000000) // count(*) AS BIGINT) AS deep_ppm
FROM u GROUP BY host HAVING sum(deep) >= 1
ORDER BY n_deep DESC, host
"""
