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
    # round 14: the FIVE new queries first (ann_sq8_ivf_serve — top-k
    # served from the staged cell-partitioned IVF+SQ8 index — and
    # release_gate_utility, the per-language suppression-cost report,
    # and ann_sq8_ivf_serve_delta — the staged serve with an unindexed
    # delta merged into every query's candidates — and hybrid_rrf_topk,
    # BM25 + ANN legs fused by exact-bigint Reciprocal Rank Fusion, and
    # hybrid_rrf_serve — the same fusion answered entirely from the two
    # staged indexes, quantized IVF-pruned vector leg),
    # then every row the mechanical freshness check
    # (tools/window_manifest.py, affected_queries vs the r13 manifest)
    # marks engine-path-changed this round: weighted_sample_topk (the
    # u=(h+0.5)/2^60 range fix, both engines), the keymod pair (the
    # staged-hash consistency guard in subscribe_key_mod), the DSIR
    # quartet (_dsir_tokens size-aware rebalance), release_gate and
    # curation_decisions_v3 (shared SQL-builder closure with the new
    # utility query). The remaining 39 slots rotate the oldest
    # external greens: the r10 cohort top-down (36 of its 37 rows fit;
    # zorder_events_key heads next round's rotation from _REST).
    "ann_sq8_ivf_serve",
    "release_gate_utility",
    "ann_sq8_ivf_serve_delta",
    "hybrid_rrf_topk",
    "hybrid_rrf_serve",
    "weighted_sample_topk",
    "filter_keymod_staged_hash",
    "filter_keymod_subscribe",
    "dsir_doc_scores",
    "dsir_feature_weights",
    "dsir_incremental",
    "dsir_select_topk",
    "release_gate",
    "curation_decisions_v3",
    "ann_lsh_topk",
    "bpe_learn_merges",
    "bpe_learn_merges_batched",
    "checkpoint_mult_fetch",
    "contamination_fraction",
    "cube_rollup",
    "data_expectations",
    "decontaminate_bloom",
    "dedup_canonical",
    "dedup_incremental",
    "dtail_json",
    "event_rate_anomaly",
    "filter_keymod_longkey",
    "filter_keymod_strkey",
    "filter_keyrange",
    "filter_payload_fields",
    "funnel_conversion",
    "hash_sample",
    "key_skew_profile",
    "length_histogram",
    "max_scn_probe",
    "media_audio_near_pairs",
    "media_decision_log",
    "media_dhash_clusters",
    "media_dhash_incremental",
    "media_features",
    "media_png_probe",
    "media_wav_probe",
    "oov_rate",
    "partition_router",
    "pivot_events_daily",
    "quality_topk_per_lang",
    "schema_key_filter",
    "simhash_sketch",
    "sparse_tfidf_pairs",
    "vocab_top_terms",
]

# below the 50-row window this round (all still verified locally),
# oldest external green first — next round's rotation reads top-down
# (remaining r11/r12 cohorts in their standing order, then the r13
# greens that rotated out of the r13 window, newest last):
_REST = [
    "zorder_events_key",
    "ann_filtered_topk",
    "ann_ivf_topk",
    "ann_ivfpq_rerank_topk",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "ann_recall_eval",
    "avro_ocf_roundtrip",
    "bpe_encode_corpus",
    "bpe_pair_counts",
    "corpus_drift",
    "curation_decisions",
    "curation_decisions_v2",
    "dedup_cluster_star",
    "dedup_cluster_survivors",
    "dedup_decision_log",
    "dedup_incremental_near",
    "dedup_span_windows",
    "dedup_survivor_corpus",
    "exactsubstr_dedup",
    "exactsubstr_incremental",
    "exactsubstr_spans",
    "exactsubstr_stats",
    "jdbc_txlog_pull",
    "jsonl_ingest_audit",
    "kmeans_assign_summary",
    "kmeans_centroids",
    "lm2_quality_score",
    "lm_quality_score",
    "media_audio_fp_dedup",
    "media_dhash_dedup",
    "media_dhash_near_pairs",
    "media_png_resize",
    "media_video_frames",
    "snapshot_customer",
    "trail_file_seek",
    "zorder_box_read",
    "bm25_incremental",
    "semdedup_survivors_v2",
    "semdedup_incremental",
    "semdedup_survivors",
    "semdedup_trained",
    "semdedup_multiprobe",
    "semdedup_recall_eval",
    "k_anonymity_audit",
    "bm25_topk",
    "approx_quantiles_binned",
    "approx_stats",
    "avro_binary_decode",
    "boilerplate_strip",
    "buffer_info",
    "chunk_documents",
    "cm_frequency_profile",
    "dedup_cdc_chunks",
    "dedup_embedding_cosine",
    "event_metadata_extract",
    "events_as_changelog_state",
    "hll_distinct_users",
    "json_props_extract",
    "media_jpeg_probe",
    "null_rate_profile",
    "opcode_transitions",
    "partition_spread_per_source",
    "pii_redact",
    "returned_items_topk",
    "revenue_by_nation",
    "running_account_balance",
    "sessionize",
    "source_registry_join",
    "sql_txlog_pull",
    "structure_profile",
    "supplier_profit_by_nation",
    "text_compressibility",
    "text_novelty",
    "text_token_stats",
    "time_window_sliding",
    "time_window_tumbling",
    "train_split_assign",
    "urgent_orders_shipped",
    "as_of_join_events",
    "ann_sq8_ivf_topk",
    "ann_sq8_topk",
    "fuzzy_join_docs",
    "fuzzy_join_incremental",
    "record_linkage_clusters",
    "record_linkage_incremental",
    "decontaminate_vs_benchmark",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dedup_sketch_eval",
    "filter_composite_json",
    "keyset_page",
    "lag_percentiles",
    "mixture_temperature_sample",
    "mixture_waterfill",
    "mixture_waterfill_sample",
    "per_group_quota",
    "per_source_stats",
    "pricing_summary",
    "schema_evolution_decode",
    "schema_key_compaction",
    "sequence_packing",
    "skew_salted_agg",
    "snapshot_diff",
    "sql_surface_window_stats",
    "stratified_sample",
    "stream_fetch_bounded",
    "text_fingerprint",
    "tfidf_top_terms",
    "txn_window_stats",
    "value_histogram",
    "repetition_filter",
    "retention_cohorts",
    "scalar_functions",
    "snapshot_orders",
    "text_lang_id",
    "text_quality",
    "topk_orders_per_segment",
    "xml_trail_parse",
    "ann_cosine_topk",
    "bootstrap_snapshot_catchup",
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
