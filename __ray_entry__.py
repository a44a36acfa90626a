"""Driver contract for the Ray-Data-native validation engine.

The driver initialises Ray BEFORE importing this module; nothing here (or in
the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``   — flagship pipeline on /root/testdata/sf0.001 (smoke check).
- ``queries()`` — one entry per implemented operator/pipeline (SURVEY.md §2);
  each callable takes ``sf_dir`` and returns a Dataset / DataFrame / Table.
- ``oracle_sql()`` — DuckDB-equivalent SQL per query key (correctness gate).
  Column names match the Ray outputs exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: vectorized constraint validation over the documents table →
    per-row verdicts (doc_id, valid, error_count)."""
    from jsonschema_validator_ray.pipelines import documents as docs

    return docs.documents_verdicts(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from jsonschema_validator_ray.pipelines import (analytics, checks, corpus,
                                                    curation, incremental,
                                                    prep)
    from jsonschema_validator_ray.pipelines import documents as docs

    return {
        "prep_documents": prep.prep_documents,
        "verdict_documents": docs.documents_verdicts,
        "violations_documents": docs.documents_violations,
        "dup_orders_custkey": checks.dup_orders_custkey,
        "referential_lang": checks.referential_lang,
        "referential_lang_iso639": checks.referential_lang_iso639,
        "fk_orders_custkey": checks.fk_orders_custkey,
        "stats_exact_lineitem": checks.stats_exact_lineitem,
        "stats_sketch_documents": checks.stats_sketch_documents,
        "stats_incremental_documents": checks.stats_incremental_documents,
        "quantiles_lineitem": checks.quantiles_lineitem,
        "rowrules_lineitem": checks.rowrules_lineitem,
        "inferred_schema_documents": checks.inferred_schema_documents,
        "ks_quantity_returnflag": checks.ks_quantity_returnflag,
        "psi_lang_documents": checks.psi_lang_documents,
        "distinct_sources_per_lang": checks.distinct_sources_per_lang,
        "chisq_lang_source": checks.chisq_lang_source_documents,
        "distinct_users_per_event": checks.distinct_users_per_event,
        "fk_orders_custkey_bloom": checks.fk_orders_custkey_bloom,
        "reconcile_orders_lineitem": checks.reconcile_orders_lineitem,
        "quartile_bins_lineitem": checks.quartile_bins_lineitem,
        "trim_outliers_documents": checks.trim_outliers_documents,
        "dedup_exact_documents": corpus.dedup_exact_documents,
        "dedup_incremental_documents": corpus.dedup_incremental_documents,
        "ngram_decontam_documents": corpus.ngram_decontam_documents,
        "dup_spans_documents": corpus.dup_spans_documents,
        "despan_documents": corpus.despan_documents,
        "minhash_index_documents": corpus.minhash_index_documents,
        "semdedup_embeddings": corpus.semdedup_embeddings,
        "semdedup_incremental_embeddings":
            corpus.semdedup_incremental_embeddings,
        "vocab_incremental_documents": corpus.vocab_incremental_documents,
        "ingest_documents": incremental.ingest_documents,
        "token_counts_documents": corpus.token_counts_documents,
        "quality_documents": corpus.quality_documents,
        "redact_documents": corpus.redact_documents,
        "gopher_documents": corpus.gopher_documents,
        "topk_embeddings": corpus.topk_embeddings,
        "quantize_embeddings": corpus.quantize_embeddings,
        "topk_embeddings_ivf": corpus.topk_embeddings_ivf,
        "verdict_embeddings": corpus.verdict_embeddings,
        "verdict_embeddings_tuple": corpus.verdict_embeddings_tuple,
        "verdict_documents_pp": corpus.verdict_documents_pp,
        "verdict_documents_combo": corpus.verdict_documents_combo,
        "langid_documents": corpus.langid_documents,
        "fingerprint_documents": corpus.fingerprint_documents,
        "minhash_pairs_documents": corpus.minhash_pairs_documents,
        "jaccard_documents": corpus.jaccard_documents,
        "dedup_jaccard_documents": corpus.dedup_jaccard_documents,
        "decontam_documents": corpus.decontam_documents,
        "sample_documents_by_lang": corpus.sample_documents_by_lang,
        "sample_documents_pct": corpus.sample_documents_pct,
        "split_documents": corpus.split_documents,
        "mix_documents": corpus.mix_documents,
        "pack_documents": corpus.pack_documents,
        "events_in_sessions": corpus.events_in_sessions,
        "events_in_windows": corpus.events_in_windows,
        "events_hourly": corpus.events_hourly,
        "verdict_events_props": corpus.verdict_events_props,
        "events_sessions": corpus.events_sessions,
        "events_sequenced": corpus.events_sequenced,
        "events_rolling": corpus.events_rolling,
        "events_cumulative": corpus.events_cumulative,
        "mode_event_per_user": corpus.mode_event_per_user,
        "grouped_quantiles_lineitem": corpus.grouped_quantiles_lineitem,
        "latest_events": corpus.latest_events,
        "bigram_documents": corpus.bigram_documents,
        "hist_lang_documents": corpus.hist_lang_documents,
        "repetition_documents": corpus.repetition_documents,
        "signals_documents": corpus.signals_documents,
        "dedup_norm_documents": corpus.dedup_norm_documents,
        "hist_length_documents": corpus.hist_length_documents,
        "dup_lines_documents": corpus.dup_lines_documents,
        "clean_lines_documents": corpus.clean_lines_documents,
        "vocab_topk_documents": corpus.vocab_topk_documents,
        "oov_documents": corpus.oov_documents,
        "tfidf_documents": corpus.tfidf_documents,
        "shuffled_head_documents": corpus.shuffled_head_documents,
        "funnel_events": corpus.funnel_events,
        "heavy_users_events": corpus.heavy_users_events,
        "cohort_retention": analytics.cohort_retention,
        "event_gaps_users": analytics.event_gaps_users,
        "value_share_by_type": analytics.value_share_by_type,
        "new_users_daily": analytics.new_users_daily,
        "dup_cluster_sizes": corpus.dup_cluster_sizes_documents,
        "segment_revenue": analytics.segment_revenue,
        "segment_revenue_bucketed": analytics.segment_revenue_bucketed,
        "purchase_last_click": analytics.purchase_last_click,
        "top_orders_per_segment": analytics.top_orders_per_segment,
        "orders_without_customer": analytics.orders_without_customer,
        "orders_customer_left": analytics.orders_customer_left,
        "rollup_revenue_lineitem": analytics.rollup_revenue_lineitem,
        "corr_qty_price_lineitem": analytics.corr_qty_price_lineitem,
        "parts_in_lineitem": analytics.parts_in_lineitem,
        "pivot_priority_status": analytics.pivot_priority_status,
        "curated_documents": curation.curated_documents,
    }


def oracle_sql() -> dict[str, str]:
    from jsonschema_validator_ray.pipelines import analytics, checks, corpus, curation
    from jsonschema_validator_ray.pipelines import documents as docs

    return {
        "verdict_documents": docs.VERDICTS_SQL,
        "violations_documents": docs.VIOLATIONS_SQL,
        "dup_orders_custkey": checks.DUP_ORDERS_SQL,
        "referential_lang": checks.REFERENTIAL_LANG_SQL,
        "referential_lang_iso639": checks.REFERENTIAL_ISO_SQL,
        "fk_orders_custkey": checks.FK_ORDERS_SQL,
        "stats_exact_lineitem": checks.STATS_EXACT_SQL,
        "stats_incremental_documents": checks.STATS_INCR_SQL,
        "dedup_exact_documents": corpus.DEDUP_EXACT_SQL,
        "dedup_incremental_documents": corpus.DEDUP_INCR_SQL,
        "ngram_decontam_documents": corpus.NGRAM_DECONTAM_SQL,
        "jaccard_documents": corpus.JACCARD_SQL,
        "dedup_jaccard_documents": corpus.DEDUP_JACCARD_SQL,
        "dup_spans_documents": corpus.DUP_SPANS_SQL,
        "despan_documents": corpus.DESPAN_SQL,
        "vocab_incremental_documents": corpus.VOCAB_INCR_SQL,
        "token_counts_documents": corpus.TOKEN_COUNTS_SQL,
        "quality_documents": corpus.QUALITY_SQL,
        "redact_documents": corpus.REDACT_SQL,
        "gopher_documents": corpus.GOPHER_SQL,
        "topk_embeddings": corpus.TOPK_SQL,
        "quantize_embeddings": corpus.QUANTIZE_EMB_SQL,
        "topk_embeddings_ivf": corpus.TOPK_IVF_SQL,
        "verdict_embeddings": corpus.VERDICT_EMB_SQL,
        "verdict_embeddings_tuple": corpus.VERDICT_EMB_TUPLE_SQL,
        "verdict_documents_pp": corpus.VERDICT_PP_SQL,
        "verdict_documents_combo": corpus.VERDICT_COMBO_SQL,
        "sample_documents_by_lang": corpus.SAMPLE_BY_LANG_SQL,
        "sample_documents_pct": corpus.SAMPLE_PCT_SQL,
        "split_documents": corpus.SPLIT_SQL,
        "mix_documents": corpus.MIX_SQL,
        "events_in_sessions": corpus.EVENTS_IN_SESSIONS_SQL,
        "events_in_windows": corpus.EVENTS_IN_WINDOWS_SQL,
        "events_hourly": corpus.EVENTS_HOURLY_SQL,
        "verdict_events_props": corpus.VERDICT_PROPS_SQL,
        "events_sessions": corpus.EVENTS_SESSIONS_SQL,
        "events_sequenced": corpus.EVENTS_SEQUENCED_SQL,
        "events_rolling": corpus.EVENTS_ROLLING_SQL,
        "events_cumulative": corpus.EVENTS_CUMULATIVE_SQL,
        "mode_event_per_user": corpus.MODE_EVENT_SQL,
        "grouped_quantiles_lineitem": corpus.GROUPED_QUANTILES_SQL,
        "latest_events": corpus.LATEST_EVENTS_SQL,
        "bigram_documents": corpus.BIGRAM_SQL,
        "hist_lang_documents": corpus.HIST_LANG_SQL,
        "repetition_documents": corpus.REPETITION_SQL,
        "signals_documents": corpus.SIGNALS_SQL,
        "dedup_norm_documents": corpus.DEDUP_NORM_SQL,
        "hist_length_documents": corpus.HIST_LENGTH_SQL,
        "dup_lines_documents": corpus.DUP_LINES_SQL,
        "clean_lines_documents": corpus.CLEAN_LINES_SQL,
        "vocab_topk_documents": corpus.VOCAB_TOPK_SQL,
        "oov_documents": corpus.OOV_SQL,
        "tfidf_documents": corpus.TFIDF_SQL,
        "shuffled_head_documents": corpus.SHUFFLED_HEAD_SQL,
        "funnel_events": corpus.FUNNEL_SQL,
        "cohort_retention": analytics.COHORT_RETENTION_SQL,
        "event_gaps_users": analytics.EVENT_GAPS_SQL,
        "reconcile_orders_lineitem": checks.RECONCILE_ORDERS_SQL,
        "quartile_bins_lineitem": checks.QUARTILE_BINS_SQL,
        "value_share_by_type": analytics.VALUE_SHARE_SQL,
        "new_users_daily": analytics.NEW_USERS_DAILY_SQL,
        "dup_cluster_sizes": corpus.DUP_CLUSTER_SIZES_SQL,
        "quantiles_lineitem": checks.QUANTILES_SQL,
        "rowrules_lineitem": checks.ROWRULES_SQL,
        "inferred_schema_documents": checks.INFERRED_SCHEMA_SQL,
        "ks_quantity_returnflag": checks.KS_QUANTITY_SQL,
        "psi_lang_documents": checks.PSI_LANG_SQL,
        "distinct_sources_per_lang": checks.DISTINCT_SOURCES_SQL,
        "chisq_lang_source": checks.CHISQ_LANG_SOURCE_SQL,
        "distinct_users_per_event": checks.DISTINCT_USERS_SQL,
        "trim_outliers_documents": checks.TRIM_OUTLIERS_SQL,
        "segment_revenue": analytics.SEGMENT_REVENUE_SQL,
        "segment_revenue_bucketed": analytics.SEGMENT_REVENUE_SQL,
        "purchase_last_click": analytics.PURCHASE_LAST_CLICK_SQL,
        "top_orders_per_segment": analytics.TOP_ORDERS_SQL,
        "orders_without_customer": analytics.ORDERS_WITHOUT_CUSTOMER_SQL,
        "orders_customer_left": analytics.ORDERS_CUSTOMER_LEFT_SQL,
        "rollup_revenue_lineitem": analytics.ROLLUP_REVENUE_SQL,
        "corr_qty_price_lineitem": analytics.CORR_QTY_PRICE_SQL,
        "parts_in_lineitem": analytics.PARTS_IN_LINEITEM_SQL,
        "pivot_priority_status": analytics.PIVOT_PRIORITY_STATUS_SQL,
        "curated_documents": curation.CURATED_SQL,
        # rows-only (no SQL-expressible oracle): stats_sketch_documents,
        # langid_documents, fingerprint_documents, minhash_pairs_documents
    }
