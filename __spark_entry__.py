"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship pipeline; queries()/oracle_sql() expose every
implemented operator with its DuckDB oracle (see databus_spark.registry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: change-stream -> subscription filter -> compacted snapshot.

    The minimum end-to-end databus slice (SURVEY.md §7 Phase 1): a
    deterministic change log derived from sf0.001 orders, filtered by a
    mod-partition subscription, compacted to latest-state per key.
    """
    from pyspark.sql import functions as F

    from databus_spark.envelope import ORDERS_PAYLOAD, orders_changelog
    from databus_spark.operators.compaction import snapshot
    from databus_spark.operators.filters import key_mod_filter

    log = orders_changelog(spark, "/root/testdata/sf0.001")
    subscribed = log.where(key_mod_filter(4, 0, 2))
    return snapshot(subscribed, key_cols=("key_str",), payload_cols=ORDERS_PAYLOAD)


# The driver's correctness gate checks the FIRST 50 queries in dict order.
# Rotation rule (stable since r8): (a) NEW queries and queries whose
# engine path changed this round go first; (b) then whatever has never
# been externally checked or is oldest-green, oldest first. The merge
# gate is still a FULL local run over all registered queries at sf0.01,
# so rotation never leaves a query locally unchecked. The first
# _WINDOW_SIZE names are the driver-checked window; a test pins
# len(_WINDOW) == _WINDOW_SIZE and uniqueness of _PRIORITY.
_WINDOW_SIZE = 50

_WINDOW = [
    # round 11: the two NEW queries (bm25_topk lexical retrieval,
    # semdedup_incremental rolling-ingest embedding dedup) first, then
    # the six r6-stale rows — r10 broke its own rotation rule here
    # (lm_quality_score's engine path changed in r10 via the broadcast
    # pin at operators/text.py but the row stayed in _REST; VERDICT r10
    # "What's wrong #2") — then EVERY row whose engine path changed this
    # round per the new mechanical freshness invariant
    # (tools/window_manifest.py closure diff vs the committed r10-tree
    # manifest; tests/test_window_freshness.py enforces it at pytest
    # time so the rule can't be hand-missed again; the staged-artifact
    # fingerprint memo alone touches every staged query, which is why
    # the changed set fills the window).
    "fuzzy_join_docs",
    "record_linkage_clusters",
    "fuzzy_join_incremental",
    "record_linkage_incremental",
    "corpus_drift",
    "k_anonymity_audit",
    "bm25_topk",
    "semdedup_incremental",
    "lm_quality_score",
    "bpe_pair_counts",
    "curation_decisions",
    "filter_keymod_subscribe",
    "media_png_resize",
    "snapshot_customer",
    "ann_ivfpq_rerank_topk",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "avro_ocf_roundtrip",
    "dedup_cluster_star",
    "dedup_cluster_survivors",
    "dedup_incremental_near",
    "dedup_survivor_corpus",
    "jdbc_txlog_pull",
    "media_video_frames",
    "semdedup_survivors",
    "trail_file_seek",
    "ann_ivf_topk",
    "ann_recall_eval",
    "curation_decisions_v3",
    "dedup_decision_log",
    "dsir_incremental",
    "jsonl_ingest_audit",
    "kmeans_assign_summary",
    "kmeans_centroids",
    "media_audio_fp_dedup",
    "media_dhash_dedup",
    "media_dhash_near_pairs",
    "semdedup_multiprobe",
    "semdedup_trained",
    "zorder_box_read",
    "ann_filtered_topk",
    "bpe_encode_corpus",
    "curation_decisions_v2",
    "dedup_span_windows",
    "exactsubstr_dedup",
    "exactsubstr_incremental",
    "exactsubstr_spans",
    "exactsubstr_stats",
    "lm2_quality_score",
    "semdedup_survivors_v2",
]

# below the 50-row window this round (all still verified locally):
_REST = [
    # displaced by the three NEW r11 queries above (fuzzy_join_docs,
    # record_linkage_clusters, corpus_drift): these three rotate out
    # first as the freshest external greens in the old window (r10,
    # re-exercised by the sibling media/dedup rows that stay in)
    "semdedup_recall_eval",
    "media_audio_near_pairs",
    "media_dhash_clusters",
    "media_dhash_incremental",
    "media_decision_log",
    "boilerplate_strip",
    "dedup_cdc_chunks",
    "text_novelty",
    "structure_profile",
    "approx_quantiles_binned",
    "cm_frequency_profile",
    "approx_stats",
    "text_compressibility",
    "pii_redact",
    "source_registry_join",
    "train_split_assign",
    "hll_distinct_users",
    "dedup_embedding_cosine",
    "text_token_stats",
    "chunk_documents",
    "json_props_extract",
    "time_window_tumbling",
    "time_window_sliding",
    "sessionize",
    "revenue_by_nation",
    "urgent_orders_shipped",
    "returned_items_topk",
    "supplier_profit_by_nation",
    "events_as_changelog_state",
    "running_account_balance",
    "opcode_transitions",
    "partition_spread_per_source",
    "null_rate_profile",
    "buffer_info",
    "media_jpeg_probe",
    "event_metadata_extract",
    "avro_binary_decode",
    "sql_txlog_pull",
    "dsir_feature_weights",
    "dsir_doc_scores",
    "dsir_select_topk",
    "mixture_waterfill",
    "mixture_waterfill_sample",
    "dedup_sketch_eval",
    "sql_surface_window_stats",
    "schema_evolution_decode",
    "decontaminate_vs_benchmark",
    "dedup_exact",
    "filter_composite_json",
    "keyset_page",
    "lag_percentiles",
    "per_source_stats",
    "pricing_summary",
    "txn_window_stats",
    "value_histogram",
    "as_of_join_events",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "mixture_temperature_sample",
    "per_group_quota",
    "schema_key_compaction",
    "sequence_packing",
    "skew_salted_agg",
    "snapshot_diff",
    "stratified_sample",
    "stream_fetch_bounded",
    "text_fingerprint",
    "tfidf_top_terms",
    "repetition_filter",
    "retention_cohorts",
    "scalar_functions",
    "snapshot_orders",
    "text_lang_id",
    "text_quality",
    "topk_orders_per_segment",
    "xml_trail_parse",
    "bpe_learn_merges",
    "bpe_learn_merges_batched",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "event_rate_anomaly",
    "max_scn_probe",
    "contamination_fraction",
    "dedup_canonical",
    "length_histogram",
    "media_png_probe",
    "media_wav_probe",
    "oov_rate",
    "quality_topk_per_lang",
    "schema_key_filter",
    "simhash_sketch",
    "sparse_tfidf_pairs",
    "vocab_top_terms",
    "zorder_events_key",
    "bootstrap_snapshot_catchup",
    "checkpoint_mult_fetch",
    "cube_rollup",
    "data_expectations",
    "decontaminate_bloom",
    "dedup_incremental",
    "dtail_json",
    "filter_keymod_longkey",
    "filter_keymod_strkey",
    "filter_keyrange",
    "filter_payload_fields",
    "funnel_conversion",
    "hash_sample",
    "key_skew_profile",
    "media_features",
    "partition_router",
    "pivot_events_daily",
]

_PRIORITY = _WINDOW + _REST


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from databus_spark.registry import QUERIES

    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    from databus_spark.registry import ORACLES

    return _ordered(dict(ORACLES))
