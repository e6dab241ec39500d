"""Physical-plan pins for the round-7 operators: the plan SHAPE is the
scale contract — these fail when a rewrite silently turns a broadcast
into a sort-merge join, adds a shuffle to a projection, or drops the
map-side combine."""

from __future__ import annotations


def _plan(spark, name, sf_dir):
    from databus_spark.registry import QUERIES

    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_boilerplate_strip_broadcasts_boiler_set(spark, sf_dir):
    """The boilerplate set is tiny by definition (lines repeated across
    >= min_docs docs) — it must broadcast back to the corpus; a
    sort-merge join would shuffle every line of a 100 TB corpus a
    second time."""
    plan = _plan(spark, "boilerplate_strip", sf_dir)
    assert "BroadcastHashJoin" in plan, "boiler set lost its broadcast"
    assert "SortMergeJoin" not in plan, plan[:800]


def test_cdc_chunks_single_uniform_shuffle_no_python(spark, sf_dir):
    """Boundary discovery is per-row expression work: no Python in the
    plan, no cartesian product; the only joins pair chunk occurrences
    with the chunk-df aggregate (uniform content keys)."""
    plan = _plan(spark, "dedup_cdc_chunks", sf_dir)
    assert "PythonUDF" not in plan and "MapInPandas" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_media_probes_python_stage_budget(spark, sf_dir):
    """Payloads cross to Python a bounded number of times and are never
    shuffled before extraction. media_video_frames reads its STAGED
    binary corpus, so its plan has exactly one Python stage (the
    probe); media_jpeg_probe synthesizes its fixture inline (the encode
    is itself part of the demonstrated codec), so it gets synth +
    probe = two — a third stage or a pre-extraction Exchange is a
    regression in either."""
    expect = {"media_jpeg_probe": 2, "media_video_frames": 1}
    for name, n in expect.items():
        plan = _plan(spark, name, sf_dir)
        assert plan.count("MapInPandas") == n, (name, plan[:500])
        # Spark prints the plan ROOT-first: operators BELOW (before) the
        # Python stage — the pre-extraction path — appear AFTER the last
        # MapInPandas occurrence in the string (r7 review: the [0] side
        # holds post-extraction operators and could never catch this)
        below_python = plan.rsplit("MapInPandas", 1)[1]
        assert "Exchange" not in below_python, (
            name,
            "payloads shuffled before extraction",
        )


def test_pq_family_reads_staged_index(spark, sf_dir):
    """All three PQ queries serve from the staged codes parquet — the
    corpus encode must NOT appear in the serve plan (that is the
    build-once index's whole point)."""
    for name in ("ann_pq_topk", "ann_ivfpq_topk", "ann_ivfpq_rerank_topk"):
        plan = _plan(spark, name, sf_dir)
        assert "partial_min_by" not in plan, (name, "encode leaked into serve plan")
        assert "databus_pqidx" in plan, (name, "staged index not read")


def test_rotation_window_bookkeeping():
    """The driver's correctness gate checks the FIRST 50 queries; the
    '(below the 50-row window)' marker in _PRIORITY must sit at exactly
    position 50, every name must exist in the registry exactly once,
    and every registered query must be listed (r7 review caught 58
    entries above the marker — 8 rows silently outside the gate while
    the rotation plan claimed them in-window)."""
    import __spark_entry__ as E
    from databus_spark.registry import ORACLES, QUERIES

    pr = E._PRIORITY
    assert len(pr) == len(set(pr)), "duplicate names in _PRIORITY"
    assert not [n for n in pr if n not in QUERIES], "unknown names in _PRIORITY"
    assert not [n for n in QUERIES if n not in pr], "registry queries unlisted"
    # the window boundary is STRUCTURAL (two lists), not a comment
    # convention — no source-text scanning needed
    assert len(E._WINDOW) == E._WINDOW_SIZE == 50, len(E._WINDOW)
    assert pr[: E._WINDOW_SIZE] == E._WINDOW
    # and every query has an oracle (the zero-rows-only state)
    assert set(QUERIES) == set(ORACLES)
