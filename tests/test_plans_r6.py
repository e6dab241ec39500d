"""Physical-plan + behavior guards for the round-6 operators."""

from __future__ import annotations

from pyspark.sql import functions as F


def _executed(spark, name, sf_dir):
    from databus_spark.registry import QUERIES

    df = QUERIES[name](spark, sf_dir)
    df.count()  # materialize so AQE finalizes the plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_hll_two_exchanges_only(spark, sf_dir):
    """HLL is register-agg then group-fold: the sketch side costs two
    exchanges (grp,b) then (grp); the exact count_distinct comparison
    column adds its own pair. Never a cartesian, never a sort of the
    input."""
    plan = _executed(spark, "hll_distinct_users", sf_dir)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange") <= 6, plan[:900]


def test_split_assign_zero_shuffle(spark, sf_dir):
    """The content-hash split is a pure projection."""
    plan = _executed(spark, "train_split_assign", sf_dir)
    assert "Exchange" not in plan, plan[:900]


def test_bpe_pair_counts_single_agg_shuffle(spark, sf_dir):
    """One count shuffle + the TakeOrdered top-n; the token stream is
    exploded once, never self-joined. The r14 widen_scan adds one
    deliberate round-robin exchange of the RAW TEXT (pre-explode,
    <1 MB) so the tokenize+explode runs wide instead of on the single
    fixture split — the pin allows exactly that exchange and still
    forbids any second HASH shuffle or join."""
    plan = _executed(spark, "bpe_pair_counts", sf_dir)
    assert plan.count("Exchange") <= 2, plan[:900]
    assert plan.count("Exchange hashpartitioning") <= 1, plan[:900]
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_filtered_ann_filters_candidates_not_queries(spark, sf_dir):
    """ann_filtered_topk: every neighbor satisfies the predicate; the
    query set is unconstrained (odd-label queries still get answers)."""
    from databus_spark.catalog import load_table
    from databus_spark.registry import QUERIES

    out = QUERIES["ann_filtered_topk"](spark, sf_dir)
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    rows = out.collect()
    assert rows, "filtered search returned nothing"
    assert all(labels[r["neighbor_id"]] % 2 == 0 for r in rows)
    assert any(labels[r["query_id"]] % 2 == 1 for r in rows), (
        "query side must not be filtered"
    )


def test_semdedup_partitions_corpus(spark, sf_dir):
    """semdedup emits one row per corpus vector; survivors = cluster
    minima; every cluster member shares the survivor's cell or reached
    it transitively; singletons survive."""
    from databus_spark.catalog import load_table
    from databus_spark.registry import QUERIES

    n = load_table(spark, sf_dir, "embeddings").count()
    rows = QUERIES["semdedup_survivors"](spark, sf_dir).collect()
    assert len(rows) == n
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m["vec_id"] for m in members)
        assert sum(m["is_survivor"] for m in members) == 1


def test_bootstrap_state_reads_changelog_once(spark, sf_dir):
    """The fused phase windows read the changelog ONCE: bootstrap_state's
    plan has exactly as many file scans as the bare changelog (the r5
    union-of-phases form doubled every scan under it)."""
    from databus_spark.envelope import orders_changelog
    from databus_spark.operators.bootstrap import bootstrap_state

    def scans(df):
        df.count()
        return df._jdf.queryExecution().executedPlan().toString().count("Scan parquet")

    log = orders_changelog(spark, sf_dir)
    assert scans(bootstrap_state(log, 3000, 6_000_000_000)) == scans(log)


def test_hll_estimate_error_bounded(spark, sf_dir):
    """The realized HLL error stays inside ~3x the theoretical standard
    error (1.04/sqrt(m)) on every group — a loose but real accuracy
    contract for the m=256 sketch."""
    from databus_spark.registry import QUERIES

    rows = QUERIES["hll_distinct_users"](spark, sf_dir).collect()
    assert rows
    bound = 3 * 1.04 / (256 ** 0.5)
    for r in rows:
        assert r["rel_err"] <= bound, (r["event_type"], r["rel_err"], bound)


def test_hll_registers_merge(spark, sf_dir):
    """The sketch is mergeable: register-wise max over sketches of any
    partition of the data equals the sketch of the whole — the property
    that makes it streamable (max-merge per micro-batch) and unionable
    across corpora. Estimates from merged registers are identical too."""
    from pyspark.sql import functions as F

    from databus_spark.catalog import load_table
    from databus_spark.operators.stats import hll_estimate, hll_registers

    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    whole = hll_registers(e, "user_id", "event_type")
    part_a = hll_registers(e.where(F.col("user_id") % 2 == 0), "user_id", "event_type")
    part_b = hll_registers(e.where(F.col("user_id") % 2 == 1), "user_id", "event_type")
    merged = (
        part_a.unionByName(part_b).groupBy("grp", "b").agg(F.max("r").alias("r"))
    )
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}
    est_m = {tuple(r) for r in hll_estimate(merged).collect()}
    est_w = {tuple(r) for r in hll_estimate(whole).collect()}
    assert est_m == est_w


def test_cm_sketch_one_sided_and_mergeable(spark, sf_dir):
    """Count-Min never undercounts (overcount >= 0 on every key), and
    counters ADD: sketches of disjoint halves summed per (s, pos) equal
    the whole-data sketch."""
    from pyspark.sql import functions as F

    from databus_spark.catalog import load_table
    from databus_spark.operators.stats import cm_sketch
    from databus_spark.registry import QUERIES

    rows = QUERIES["cm_frequency_profile"](spark, sf_dir).collect()
    assert rows
    assert all(r["overcount"] >= 0 for r in rows)

    e = load_table(spark, sf_dir, "events").select("user_id")
    whole = cm_sketch(e, "user_id")
    merged = (
        cm_sketch(e.where(F.col("user_id") % 2 == 0), "user_id")
        .unionByName(cm_sketch(e.where(F.col("user_id") % 2 == 1), "user_id"))
        .groupBy("s", "pos")
        .agg(F.sum("c").alias("c"))
    )
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}


def test_funnel_strictly_ordered_semantics(spark):
    """Funnel stages require strict temporal order: a user whose
    'click' precedes their first 'view' does NOT reach stage 2; equal
    timestamps do not count (strictly after)."""
    from databus_spark.operators.stats import funnel_counts

    rows = [
        # u1: proper view -> click -> purchase
        (1, "view", "2026-01-01 10:00:00"),
        (1, "click", "2026-01-01 10:01:00"),
        (1, "purchase", "2026-01-01 10:02:00"),
        # u2: click BEFORE first view -> stalls at stage 1
        (2, "click", "2026-01-01 09:00:00"),
        (2, "view", "2026-01-01 10:00:00"),
        # u3: click at the SAME instant as view -> not strictly after
        (3, "view", "2026-01-01 10:00:00"),
        (3, "click", "2026-01-01 10:00:00"),
        # u4: view only
        (4, "view", "2026-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id INT, event_type STRING, ts STRING").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    got = {r["step"]: r["n_users"] for r in funnel_counts(df).collect()}
    assert got == {"view": 4, "click": 1, "purchase": 1}


def test_structure_profile_shapes(spark):
    """Bullet lists, walls of text, and paragraphed prose separate on
    the layout features."""
    from databus_spark.operators.text import structure_profile

    docs = spark.createDataFrame(
        [
            (1, "- apples\n- oranges\n- pears"),
            (2, "one long unbroken wall of text with many words in a single line"),
            (3, "First paragraph here.\n\nSecond paragraph there.\n\nThird one."),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r for r in structure_profile(docs).collect()}
    assert got[1]["bullet_ratio"] == 1.0
    assert got[2]["n_lines"] == 1 and got[2]["n_paras"] == 1
    assert got[3]["n_paras"] == 3 and got[3]["bullet_ratio"] == 0.0


def test_expectations_catch_injected_violations(spark):
    """The guardrails must actually fire: planted FK orphans, duplicate
    keys, out-of-range and NULL rows are counted, and pass flips."""
    from databus_spark.operators import validate

    parent = spark.createDataFrame([(1,), (2,)], "k LONG")
    child = spark.createDataFrame([(1,), (2,), (3,), (3,)], "fk LONG")
    fk = validate.fk_integrity(child, parent, "fk", "k", "fk").collect()[0]
    assert (fk["n_rows"], fk["n_violations"], fk["pass"]) == (4, 2, False)

    dup = spark.createDataFrame([(1,), (1,), (2,)], "k LONG")
    u = validate.uniqueness(dup, "k", "u").collect()[0]
    assert (u["n_violations"], u["pass"]) == (1, False)

    vals = spark.createDataFrame([(5.0,), (-1.0,), (None,)], "v DOUBLE")
    p = validate.predicate_check(vals, F.col("v") > 0, "pos").collect()[0]
    assert (p["n_rows"], p["n_violations"], p["pass"]) == (3, 2, False)
