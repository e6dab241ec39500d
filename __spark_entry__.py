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
# Round 7 rotation: (a) queries NEW this round (first external driver
# row), (b) everything whose engine or oracle path changed this round
# (the HUGEINT-cast novelty oracle, micro-unit structure_profile,
# floor-scaled binned quantiles, verdict-form approx_stats and
# compressibility, the IPv4 redaction class, the staged PQ index, the
# semdedup checkpoint, the LocalRelation source registry, the concat_ws
# portable-hash oracle macro and its consumers, the re-fingerprinted
# staged indexes), (c) the 16 queries deferred from r6's window —
# external rows overdue, (d) oldest-green refresh. The merge gate is
# still a FULL local run over all registered queries at sf0.01, so
# rotation never leaves a query locally unchecked.
# The first _WINDOW_SIZE names are the driver-checked window; the
# split into two lists makes the boundary structural (a test pins
# len(_WINDOW) == _WINDOW_SIZE), not a comment convention.
_WINDOW_SIZE = 50

_WINDOW = [
    # (a) NEW this round — always first
    "media_jpeg_probe",
    "media_video_frames",
    "boilerplate_strip",
    "dedup_cdc_chunks",
    "bpe_learn_merges",
    "dedup_decision_log",
    # (b) engine/oracle path changed in round 7
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
    "jsonl_ingest_audit",
    "zorder_box_read",
    "dedup_cluster_survivors",
    "dedup_cluster_star",
    "dedup_survivor_corpus",
    "dedup_embedding_cosine",
    # (c) deferred from round 6 — external row overdue
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
    # (d) oldest-green refresh (r5 rows now the stalest)
    "schema_evolution_decode",
    "event_metadata_extract",
    "avro_ocf_roundtrip",
    "avro_binary_decode",
    "jdbc_txlog_pull",
    "sql_txlog_pull",
    "trail_file_seek",
]

# below the 50-row window this round (all still verified locally):
_REST = [
    "stream_fetch_bounded",
    "schema_key_compaction",
    "dedup_canonical",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_span_windows",
    "sparse_tfidf_pairs",
    "media_png_resize",
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
    "filter_composite_json",
    "filter_keymod_strkey",
    "filter_keymod_longkey",
    "filter_keymod_subscribe",
    "filter_payload_fields",
    "keyset_page",
    "max_scn_probe",
    "per_source_stats",
    "lag_percentiles",
    "value_histogram",
    "event_rate_anomaly",
    "txn_window_stats",
    "pricing_summary",
    "dedup_exact",
    "decontaminate_vs_benchmark",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "topk_orders_per_segment",
    "cube_rollup",
    "media_features",
    "scalar_functions",
    "dtail_json",
    "checkpoint_mult_fetch",
    "xml_trail_parse",
    "hash_sample",
    "partition_router",
    "pivot_events_daily",
    "snapshot_diff",
    "contamination_fraction",
    "simhash_sketch",
    "oov_rate",
    "length_histogram",
    "quality_topk_per_lang",
    "text_fingerprint",
    "stratified_sample",
    "per_group_quota",
    "mixture_temperature_sample",
    "sequence_packing",
    "zorder_events_key",
    "schema_key_filter",
    "skew_salted_agg",
    "media_wav_probe",
    "media_png_probe",
    "vocab_top_terms",
    "tfidf_top_terms",
    "as_of_join_events",
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
