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
# Round 6 rotation: (a) the 13 queries deferred from r5's window (some
# have never had an external driver row), (b) everything whose engine
# path changed this round (novelty ratio arithmetic, reflect-based Java
# hashCode, canonical-orientation star components, curation scan
# sharing, bloom gram identity, skew-profile tie-break, z-table staging
# lock), (c) the oldest r4-green rows. The merge gate is still a FULL
# local run over all registered queries at sf0.01, so rotation never
# leaves a query locally unchecked.
_PRIORITY = [
    # NEW this round (never had an external driver row) — always first
    "media_png_resize",
    "data_expectations",
    "dedup_incremental_near",
    "lm2_quality_score",
    "structure_profile",
    "approx_quantiles_binned",
    "funnel_conversion",
    "retention_cohorts",
    "cm_frequency_profile",
    "hll_distinct_users",
    "semdedup_survivors",
    "ann_filtered_topk",
    "train_split_assign",
    "bpe_pair_counts",
    # (a) deferred from round 5 — external row overdue
    "dedup_cluster_survivors",
    "topk_orders_per_segment",
    "filter_payload_fields",
    "cube_rollup",
    "media_features",
    "scalar_functions",
    "dtail_json",
    "checkpoint_mult_fetch",
    "approx_stats",
    "xml_trail_parse",
    "hash_sample",
    "partition_router",
    "pivot_events_daily",
    # (b) engine path changed in round 6
    "text_novelty",
    "filter_keymod_strkey",
    "filter_keymod_longkey",
    "filter_keymod_subscribe",
    "dedup_cluster_star",
    "dedup_survivor_corpus",
    "dedup_incremental",
    "curation_decisions",
    "curation_decisions_v2",
    "decontaminate_bloom",
    "key_skew_profile",
    "zorder_box_read",
    "repetition_filter",
    "text_quality",
    "text_lang_id",
    "lm_quality_score",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_rerank_topk",
    # (c) oldest green rows (r4) — refresh before they go stale;
    # bootstrap_snapshot_catchup leads (its scan fused this round)
    "bootstrap_snapshot_catchup",
    "snapshot_orders",
    "snapshot_customer",
    "filter_keyrange",
    "filter_composite_json",
    "keyset_page",
    "max_scn_probe",
    "per_source_stats",
    "lag_percentiles",
    "value_histogram",
    "event_rate_anomaly",
    "txn_window_stats",
    "source_registry_join",
    "pricing_summary",
    "dedup_exact",
    "decontaminate_vs_benchmark",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # deferred to next round's window (still verified locally):
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
    "pii_redact",
    "events_as_changelog_state",
    "running_account_balance",
    "opcode_transitions",
    "partition_spread_per_source",
    "null_rate_profile",
    "buffer_info",
]


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
