"""Physical-plan regression guards: the plan properties SCALE.md claims
(pushdown, broadcast, bounded shuffles, partial aggregation) are
asserted here so perf regressions fail loudly, not silently.
"""

from __future__ import annotations

import pytest


def _plan(spark, name, sf_dir):
    from databus_spark.registry import QUERIES

    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_filters_no_shuffle(spark, sf_dir):
    for name in ["filter_keymod_longkey", "filter_keyrange", "filter_payload_fields"]:
        plan = _plan(spark, name, sf_dir)
        assert "Exchange" not in plan, f"{name} gained a shuffle:\n{plan[:800]}"


def test_compaction_single_shuffle_with_partial_agg(spark, sf_dir):
    plan = _plan(spark, "snapshot_orders", sf_dir)
    assert "partial_max_by" in plan, "map-side combine lost"
    assert plan.count("Exchange") <= 2, f"snapshot grew to {plan.count('Exchange')} exchanges"


def test_dim_joins_broadcast_not_sortmerge(spark, sf_dir):
    for name in ["source_registry_join", "revenue_by_nation", "topk_orders_per_segment"]:
        plan = _plan(spark, name, sf_dir)
        assert "BroadcastHashJoin" in plan, f"{name}: broadcast join lost"
    plan = _plan(spark, "revenue_by_nation", sf_dir)
    assert "SortMergeJoin" not in plan, "star join fell back to sort-merge"


def test_scan_pruning_reaches_parquet(spark, sf_dir):
    plan = _plan(spark, "filter_keymod_longkey", sf_dir)
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan, "column pruning regressed"
    plan = _plan(spark, "bootstrap_snapshot_catchup", sf_dir)
    assert "LessThanOrEqual(o_orderkey" in plan, "scn range predicate no longer pushed"


def test_keyset_page_is_top_k_not_global_sort(spark, sf_dir):
    plan = _plan(spark, "keyset_page", sf_dir)
    assert "TakeOrderedAndProject" in plan, "keyset page became a full sort"
