"""Behavior tests for the round-5 second-wave operators: windowed
substring dedup, incremental cross-corpus dedup, Bloom decontamination,
IVFPQ ANN, and the salted two-phase grouped top-k.

(The oracle parity of each is covered by test_registry_oracles; these
pin the SEMANTIC claims — superset/subset properties, equivalence to
the one-window form, mirror-doc behavior — that a hash match alone
doesn't explain.)
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from databus_spark.catalog import load_table
from databus_spark.operators import dedup, shards, similarity


def test_span_dedup_mirrors_fully_duplicated(spark, sf_dir):
    """An exact mirror (doc_id + 1M) re-emits every window of its base
    doc, so every one of its windows is a duplicate occurrence; the base
    doc (lower occ key) keeps dup_fraction 0 unless some OTHER doc
    happens to share a window."""
    docs = dedup.documents_with_dups(spark, sf_dir)
    prof = dedup.span_dedup_profile(docs)
    mirrors = prof.where(
        (F.col("doc_id") >= 1_000_000) & (F.col("doc_id") < 2_000_000)
    )
    n_mirror, n_full = mirrors.agg(
        F.count("*"), F.sum((F.col("dup_fraction") == 1.0).cast("int"))
    ).collect()[0]
    assert n_mirror > 0
    assert n_full == n_mirror, "an exact mirror had a non-duplicated window"


def test_span_dedup_short_docs_excluded(spark):
    """Docs with fewer than SPAN_WIN tokens contribute no windows."""
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    )
    rows = dedup.span_dedup_profile(docs).collect()
    assert {r["doc_id"] for r in rows} == {2}
    assert rows[0]["n_windows"] == 1 and rows[0]["n_dup_windows"] == 0


def test_incremental_dedup_mirrors_matched_edits_new(spark, sf_dir):
    incoming = dedup.documents_with_dups(spark, sf_dir).where(
        F.col("doc_id") >= 1_000_000
    )
    base = load_table(spark, sf_dir, "documents")
    out = dedup.incremental_dedup(incoming, base).collect()
    for r in out:
        if r["doc_id"] < 2_000_000:  # exact mirror
            assert not r["is_new"]
            assert r["base_survivor_doc_id"] == r["doc_id"] - 1_000_000
        else:  # edited copy: first token dropped -> new content
            assert r["is_new"] and r["base_survivor_doc_id"] is None


def test_bloom_decontaminate_superset_of_exact(spark, sf_dir):
    """Bloom membership can only ADD false positives: every doc the
    exact gram-set decontaminator flags must be flagged by the Bloom
    variant with at least as many grams."""
    corpus = dedup.documents_with_dups(spark, sf_dir)
    benchmark = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 17 == 0)
    exact = {
        r["doc_id"]: r["n_bench_grams"]
        for r in dedup.decontaminate(corpus, benchmark).collect()
    }
    bloom = {
        r["doc_id"]: r["n_flagged_grams"]
        for r in dedup.decontaminate_bloom(corpus, benchmark).collect()
    }
    assert set(exact) <= set(bloom)
    for doc, n in exact.items():
        assert bloom[doc] >= n, f"doc {doc}: bloom dropped a true positive"


def test_ivfpq_candidates_respect_ivf_cells(spark, sf_dir):
    """Every IVFPQ result pair must be an IVF candidate pair AT THE
    SAME PROBE WIDTH (the PQ stage only re-scores, never widens, the
    IVF candidate set). IVFPQ's default nprobe is wider than plain
    IVF's (r6), so the invariant is checked with nprobe matched."""
    from databus_spark.operators.similarity import IVF_NPROBE

    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    ivf_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(emb, k=10**6).collect()
    }
    ivfpq_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivfpq_topk(emb, nprobe=IVF_NPROBE).collect()
    }
    assert ivfpq_pairs, "ivfpq returned nothing"
    assert ivfpq_pairs <= ivf_pairs


def test_grouped_topk_equals_single_window(spark, sf_dir):
    """The salted two-phase plan must reproduce the one-window result
    row-for-row, and its phase-1 window must partition on the salt (the
    property that bounds any single sort partition)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    two_phase = shards.grouped_topk(docs, "lang", "n_chars", k=7)
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    one_window = (
        docs.withColumn("topk_rank", F.row_number().over(w))
        .where(F.col("topk_rank") <= 7)
    )
    assert sorted(map(tuple, two_phase.collect())) == sorted(
        map(tuple, one_window.collect())
    )
    plan = two_phase._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan, "phase-1 salt partitioning disappeared from the plan"


def test_contamination_fraction_consistent_with_binary(spark, sf_dir):
    """Graded contamination agrees with the binary decontaminator on the
    flagged doc set and its numerator, and fractions stay in (0, 1]."""
    corpus = dedup.documents_with_dups(spark, sf_dir)
    benchmark = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 17 == 0)
    binary = {
        r["doc_id"]: r["n_bench_grams"]
        for r in dedup.decontaminate(corpus, benchmark).collect()
    }
    graded = {r["doc_id"]: r for r in dedup.contamination_fraction(corpus, benchmark).collect()}
    assert set(binary) == set(graded)
    for doc, n in binary.items():
        g = graded[doc]
        assert g["n_bench_grams"] == n
        assert 0 < g["contamination"] <= 1.0
        # the benchmark slice itself is fully contaminated
        if doc % 17 == 0 and doc < 1_000_000:
            assert g["contamination"] == 1.0


def test_oov_rate_bounds_and_vocab_coverage(spark, sf_dir):
    from databus_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    rates = T.oov_rate(docs)
    lo, hi, n = rates.agg(F.min("oov_rate"), F.max("oov_rate"), F.count("*")).collect()[0]
    assert n == docs.count(), "every doc must get a rate"
    assert 0.0 <= lo and hi <= 1.0
    # the fixture vocabulary is tiny (~60 distinct words), so the top-200
    # vocab covers everything -> all rates must be exactly 0
    n_vocab = (
        docs.select(F.explode(T.tokens_col("text")).alias("t")).distinct().count()
    )
    if n_vocab <= T.OOV_VOCAB_SIZE:
        assert hi == 0.0
