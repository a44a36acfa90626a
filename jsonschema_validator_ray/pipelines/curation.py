"""Training-data curation pipeline: the realistic composition of the
engine's pieces — exact dedup → quality gates → language gate — producing a
curated corpus, with a DuckDB oracle for the whole chain.

Order matters and is part of the contract: dedup runs on the RAW corpus
(content identity is independent of quality), then quality and language
filters prune the survivors.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sources.parquet import read_parquet
from ..functions.text import token_count_batch
from ..stages.dedup import dedup_exact

# quality gates (SQL-expressible on purpose: token count via whitespace
# split, BYTE length via strlen, language membership)
MIN_TOKENS, MAX_TOKENS = 30, 90
MIN_BYTES, MAX_BYTES = 150, 500
LANGS = ("en", "de", "fr", "es")


def curated_documents(sf_dir: str):
    """→ Dataset (doc_id) of documents surviving dedup + quality + language
    gates, the canonical curation chain."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang"])
    deduped = dedup_exact(docs, "doc_id", "text")

    def gate(b: pa.Table) -> pa.Table:
        keep = pc.is_valid(b.column("doc_id"))
        toks = token_count_batch(b)
        keep = pc.and_(keep, pc.and_(
            pc.greater_equal(toks, MIN_TOKENS),
            pc.less_equal(toks, MAX_TOKENS)))
        nbytes = pc.binary_length(pc.cast(b.column("text"), pa.large_string()))
        keep = pc.and_(keep, pc.and_(
            pc.greater_equal(nbytes, MIN_BYTES),
            pc.less_equal(nbytes, MAX_BYTES)))
        keep = pc.and_(keep, pc.fill_null(
            pc.is_in(b.column("lang"), value_set=pa.array(list(LANGS))), False))
        return b.filter(keep).select(["doc_id"])

    return deduped.map_batches(gate, batch_format="pyarrow")


CURATED_SQL = rf"""
SELECT doc_id FROM documents
WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
  AND len(regexp_split_to_array(trim(text), '\s+'))
        BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
  AND strlen(text) BETWEEN {MIN_BYTES} AND {MAX_BYTES}
  AND lang IN ('en','de','fr','es')
"""
