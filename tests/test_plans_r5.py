"""Physical-plan guards for the round-5 second-wave operators: the
shuffle/broadcast structure SCALE.md claims, asserted on the AQE-final
executed plan so a silent regression (a cartesian product, a lost
broadcast, a runaway exchange count) fails loudly."""

from __future__ import annotations


def _executed(spark, name, sf_dir):
    from databus_spark.registry import QUERIES

    df = QUERIES[name](spark, sf_dir)
    df.count()  # materialize so AQE finalizes the plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_or_sortmerge_in_new_ops(spark, sf_dir):
    for name in [
        "zorder_events_key",
        "decontaminate_bloom",
        "dedup_span_windows",
        "dedup_incremental",
        "ann_ivfpq_topk",
        "contamination_fraction",
        "media_png_probe",
    ]:
        plan = _executed(spark, name, sf_dir)
        assert "CartesianProduct" not in plan, f"{name} grew a cartesian product"
        assert "SortMergeJoin" not in plan, (
            f"{name}: a dimension join fell back to sort-merge at test SF"
        )


def test_zorder_key_no_data_shuffle(spark, sf_dir):
    """The z-keying itself must stay map-side: the only exchanges are
    the scalar min/max agg pair feeding the broadcast; the events table
    is never shuffled."""
    plan = _executed(spark, "zorder_events_key", sf_dir)
    assert plan.count("Exchange") <= 2, plan[:900]
    assert "BroadcastNestedLoopJoin" in plan, "min/max broadcast lost"


def test_png_probe_pure_map(spark, sf_dir):
    """Synthesis + decode is one mapInPandas chain: zero shuffles."""
    plan = _executed(spark, "media_png_probe", sf_dir)
    assert "Exchange" not in plan, plan[:900]
    assert plan.count("MapInPandas") >= 2, "Arrow-batched stages lost"


def test_bloom_corpus_side_broadcast_join(spark, sf_dir):
    """The position-set join must broadcast (the corpus probe stream
    never shuffles to meet the filter) and the KEYED exchanges stay at
    the four agg pairs. widen_scan's round-robin input guards (r14: one
    per _shingles call, no-ops at production split counts) are allowed
    on top — they spread the gram build, they are not data shuffles."""
    plan = _executed(spark, "decontaminate_bloom", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "corpus-side shuffle join crept in"
    assert plan.count("Exchange hashpartitioning") <= 4, plan[:900]


def test_span_dedup_bounded_exchanges(spark, sf_dir):
    plan = _executed(spark, "dedup_span_windows", sf_dir)
    assert plan.count("Exchange") <= 5, plan[:900]


def test_incremental_dedup_single_join_shuffles(spark, sf_dir):
    plan = _executed(spark, "dedup_incremental", sf_dir)
    assert plan.count("Exchange") <= 4, plan[:900]
