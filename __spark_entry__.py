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
# Round 8 rotation: (a) queries NEW this round, (b) queries whose engine
# path changed this round (the transitive decision-log survivor
# resolution, the schema-registry dim rebuilt as a JVM LocalRelation,
# the version-stamped staging protocol + the zorder staging-lock fix;
# the media-codec geometry guards are error-path-only and their happy
# paths stay externally covered by media_png_probe + the new dHash
# rows),
# (c) ALL 41 queries whose last external green is r4/r5 — the staleness
# backlog the r7 verdict asked to front-load (r4 rows first). The merge
# gate is still a FULL local run over all registered queries at sf0.01,
# so rotation never leaves a query locally unchecked.
# The first _WINDOW_SIZE names are the driver-checked window; a test
# pins len(_WINDOW) == _WINDOW_SIZE.
_WINDOW_SIZE = 50

_WINDOW = [
    # (a) NEW this round — always first
    "exactsubstr_spans",  # sliding-window ExactSubstr dedup (new this session)
    "exactsubstr_dedup",
    "exactsubstr_stats",
    "exactsubstr_incremental",
    "dsir_feature_weights",  # DSIR importance selection (new this session)
    "dsir_doc_scores",
    "dsir_select_topk",
    "mixture_waterfill",  # budget-constrained mixing (new this session)
    "dedup_sketch_eval",  # LSH precision/recall vs exact Jaccard (new this session)
    "ann_recall_eval",  # index-family recall vs brute force (new this session)
    "curation_decisions_v3",  # v2 + dup-mass + DSIR signals (new this session)
    "mixture_waterfill_sample",  # quota -> admitted docs (new this session)
    "dsir_incremental",  # staged-estimator ingest scoring (new this session)
    "kmeans_centroids",  # integer-exact Lloyd trainer (new this session)
    "kmeans_assign_summary",
    "semdedup_trained",  # SemDeDup over trained cells (paper pipeline)
    "semdedup_multiprobe",  # top-2 cell probing: recall 0.34 -> 0.56 measured
    "sql_surface_window_stats",
    "bpe_encode_corpus",  # subsumes the learn machinery: its oracle re-derives the rules and pins the full encoded sequence
    "media_dhash_dedup",
    "media_audio_fp_dedup",
    "media_dhash_near_pairs",
    # (b) engine path changed in round 8
    "dedup_decision_log",
    "schema_evolution_decode",  # registry dim rebuilt as JVM LocalRelation
    "zorder_box_read",
    "jsonl_ingest_audit",
    # (c) staleness backlog — last external green r4
    "ann_ivf_topk",
    "decontaminate_vs_benchmark",
    "dedup_exact",
    "filter_composite_json",
    "keyset_page",
    "lag_percentiles",
    "per_source_stats",
    "pricing_summary",
    "txn_window_stats",
    "value_histogram",
    # (c) staleness backlog — last external green r5
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
]

# below the 50-row window this round (all still verified locally):
_REST = [
    "event_rate_anomaly",  # displaced by the incremental-dsir row: rate-window machinery in-window via txn_window_stats
    "ann_cosine_topk",  # displaced by the v3 row: recomputed verbatim inside in-window ann_recall_eval (truth leg)
    "ann_lsh_topk",  # displaced by the waterfill-sample row: recomputed verbatim inside in-window ann_recall_eval (lsh leg)
    "max_scn_probe",  # displaced by the ann-eval row: scn-probe machinery in-window via checkpoint/stream rows
    "quality_topk_per_lang",  # displaced by the sketch-eval row: two-phase top-k machinery in-window via grouped_topk users
    "media_png_probe",  # displaced by the incremental-exactsubstr row: PNG codec machinery in-window via media_dhash_dedup
    "oov_rate",  # displaced by the waterfill row: token_stats machinery in-window via several text rows
    "sparse_tfidf_pairs",  # displaced by the multiprobe row: tfidf machinery in-window via tfidf_top_terms + text_fingerprint
    "contamination_fraction",  # displaced by the dsir rows: decontaminate machinery in-window via decontaminate_vs_benchmark
    "length_histogram",  # displaced: histogram machinery in-window via value_histogram
    "schema_key_filter",  # displaced: schema-key machinery in-window via schema_key_compaction
    "dedup_span_windows",  # displaced by the exactsubstr rows: same window-hash machinery, sliding variant now in-window
    "vocab_top_terms",  # displaced: top-terms machinery in-window via tfidf_top_terms
    "zorder_events_key",  # displaced: zorder manifest machinery in-window via zorder_box_read
    "simhash_sketch",  # displaced by the kmeans rows: the simhash base is in-window via dedup_simhash_pairs
    "media_wav_probe",  # displaced: probe machinery shared with in-window media_png_probe
    "dedup_canonical",  # displaced: exact-dedup machinery in-window via dedup_exact
    "media_dhash_clusters",  # new, but its star machinery is r7-green
    "media_dhash_incremental",  # new; probe machinery mirrors dedup_incremental_near (r7-green)
    "media_audio_near_pairs",  # new; same bithash machinery the window checks via media_dhash_near_pairs
    "bpe_learn_merges_batched",  # r8-green; its full rule table is re-derived inside bpe_encode_corpus's window row
    "media_decision_log",  # new; composes window-checked stages (dhash classes, pair index, star clusters, shared walk)
    "boilerplate_strip",
    "dedup_cdc_chunks",
    "bpe_learn_merges",
    "text_novelty",
    "structure_profile",
    "approx_quantiles_binned",
    "cm_frequency_profile",
    "approx_stats",
    "text_compressibility",
    "pii_redact",
    "semdedup_survivors",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_rerank_topk",
    "source_registry_join",
    "train_split_assign",
    "hll_distinct_users",
    "dedup_incremental_near",
    "dedup_cluster_survivors",
    "dedup_cluster_star",
    "dedup_survivor_corpus",
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
    "media_features",
    "media_png_resize",
    "media_video_frames",
    "media_jpeg_probe",
    "event_metadata_extract",
    "avro_ocf_roundtrip",
    "avro_binary_decode",
    "jdbc_txlog_pull",
    "sql_txlog_pull",
    "trail_file_seek",
    "data_expectations",
    "lm2_quality_score",
    "funnel_conversion",
    "retention_cohorts",
    "ann_filtered_topk",
    "bpe_pair_counts",
    "dedup_incremental",
    "curation_decisions",
    "curation_decisions_v2",
    "decontaminate_bloom",
    "key_skew_profile",
    "repetition_filter",
    "text_quality",
    "text_lang_id",
    "lm_quality_score",
    "bootstrap_snapshot_catchup",
    "snapshot_orders",
    "snapshot_customer",
    "filter_keyrange",
    "filter_keymod_strkey",
    "filter_keymod_longkey",
    "filter_keymod_subscribe",
    "filter_payload_fields",
    "topk_orders_per_segment",
    "cube_rollup",
    "scalar_functions",
    "dtail_json",
    "checkpoint_mult_fetch",
    "xml_trail_parse",
    "hash_sample",
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
