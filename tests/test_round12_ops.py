"""Round-12 operator tests: the BM25 staged-index/incremental leg, the
k-anonymity release gate, and the blocking-key units the fuzzy-join
rework added.

The oracle gate (test_registry_oracles / the driver) pins cross-engine
equality; these pin the SEMANTIC claims:

* bm25_serve from a staged index (+ an unindexed delta) is EXACTLY the
  from-scratch bm25_topk over the unioned corpus — the additivity
  argument, checked end-to-end on a corpus where the delta changes df,
  avgdl, and the top-k membership;
* the k-anonymity gate counts group populations among release
  CANDIDATES only, and a planted rare-QI group flips the release
  decision to suppress;
* _min_gram is a real min over the prefix's 4-gram set, with the
  conditional short-string pad.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from databus_spark.operators import joins, text, validate


def _docs(spark, rows, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(rows)],
        "doc_id long, text string",
    )


def test_bm25_serve_equals_rebuild(spark):
    base = _docs(
        spark,
        [
            "alpha beta gamma delta common",
            "beta gamma epsilon common words here",
            "gamma delta zeta common words",
            "unrelated content entirely different tokens",
            "alpha gamma beta mixture of words",
            "short one",
        ],
    )
    delta = _docs(
        spark,
        [
            "beta gamma delta fresh arrival",  # hits query terms: df moves
            "gamma gamma gamma gamma spam",  # tf-heavy: rank order moves
            "totally novel vocabulary",
        ],
        start=100,
    )
    qtoks = text.bm25_query_terms(base, n_queries=3, q_len=3)
    served = text.bm25_serve(
        text.bm25_postings(base),
        text.bm25_corpus_stats(base),
        qtoks,
        delta_docs=delta,
        topk=4,
    )
    # from-scratch over the union, SAME query workload: rebuild the
    # inline operator's tail by serving an index of the whole union
    rebuilt = text.bm25_serve(
        text.bm25_postings(base.unionByName(delta)),
        text.bm25_corpus_stats(base.unionByName(delta)),
        qtoks,
        topk=4,
    )
    got = sorted(tuple(r) for r in served.collect())
    want = sorted(tuple(r) for r in rebuilt.collect())
    assert got == want and len(got) > 0
    # the delta genuinely participates: a delta doc ranks somewhere
    assert any(r[1] >= 100 for r in got)


def test_bm25_topk_matches_serve_without_delta(spark):
    """The staged index reproduces the inline rebuild bit-for-bit
    (same decimal-rounded weights, same tie-break)."""
    docs = _docs(
        spark,
        [
            "alpha beta gamma delta common",
            "beta gamma epsilon common words here",
            "gamma delta zeta common words",
            "alpha gamma beta mixture of words",
        ],
    )
    inline = text.bm25_topk(docs, n_queries=2, q_len=3, topk=3)
    served = text.bm25_serve(
        text.bm25_postings(docs),
        text.bm25_corpus_stats(docs),
        text.bm25_query_terms(docs, n_queries=2, q_len=3),
        topk=3,
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, served.collect())
    )


def test_k_anonymity_gate_counts_candidates_only(spark):
    df = spark.createDataFrame(
        [
            # group A: 3 rows, but only 2 are release candidates
            (1, "A", True),
            (2, "A", True),
            (3, "A", False),
            # group B: 3 candidate rows
            (4, "B", True),
            (5, "B", True),
            (6, "B", True),
        ],
        "id long, qi string, keep boolean",
    )
    out = {
        r.id: (r.group_n, r.suppress)
        for r in validate.k_anonymity_gate(
            df, ["qi"], k=3, keep_pred=F.col("keep")
        ).collect()
    }
    # A counts 2 candidates (the non-candidate row can't pad anonymity)
    assert out[1] == (2, True) and out[3] == (2, True)
    assert out[4] == (3, False)


def test_release_gate_planted_rare_qi_flips_decision(spark):
    """End-to-end: a QI group that is large pre-curation but rare among
    KEEP decisions must suppress — composing the gate after curation is
    the whole point."""
    df = spark.createDataFrame(
        # 10 keeps in group X; 2 keeps + 8 drops in group Y (group size
        # 10 pre-curation — naive whole-table counting would pass it)
        [(i, "X", True) for i in range(10)]
        + [(100 + i, "Y", i < 2) for i in range(10)],
        "doc_id long, qi string, keep boolean",
    )
    gated = validate.k_anonymity_gate(
        df, ["qi"], k=8, keep_pred=F.col("keep")
    )
    y = {r.doc_id: r.suppress for r in gated.where(F.col("qi") == "Y").collect()}
    x = {r.doc_id: r.suppress for r in gated.where(F.col("qi") == "X").collect()}
    assert all(y.values())  # every Y row's group is under k among keeps
    assert not any(x.values())


def test_semdedup_dial_derivation():
    """The measured joint scale rule lives IN the operator: the
    reference dial derives itself (128 cells -> 6 probes, so fixture
    configs are unchanged by the None default), and the third-decade
    corpus derives the study's dominating point (SCALE.md: 1280/24,
    recall 0.977 at scan 0.348; the engine's 20,000/16 -> 1250 cells
    lands the same 24 probes)."""
    from databus_spark.operators import similarity as sim

    assert sim.semdedup_probe_for_cells(sim.SEM_EVAL_CELLS) == sim.SEM_EVAL_PROBE
    assert sim.semdedup_dial(2_000) == (125, 6)
    assert sim.semdedup_dial(20_000) == (1250, 24)
    # monotone and clamped
    assert sim.semdedup_probe_for_cells(1) == 1
    k10, p10 = sim.semdedup_dial(200_000)
    assert k10 == 12_500 and p10 > 24


def test_sq8_scale_invariance_and_recall_flag(spark):
    """int8-quantized cosine: the per-vector scale cancels (two
    parallel vectors at very different magnitudes read sim_q8 = 1.0),
    an anti-parallel vector reads -1.0, and in_float_topk flags
    agreement with the exact float ranking."""
    from databus_spark.operators import similarity as sim

    rows = [
        (0, [0.001, 0.002, 0.0]),     # query: tiny magnitude
        (1, [500.0, 1000.0, 0.0]),    # parallel, huge magnitude
        (2, [-0.5, -1.0, 0.0]),       # anti-parallel
        (3, [1.0, 0.0, 0.0]),         # orthogonal-ish
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.query_id, r.neighbor_id): (r.rank, r.sim_q8, r.in_float_topk)
        for r in sim.sq8_topk(emb, n_queries=1, k=3).collect()
    }
    assert got[(0, 1)][0] == 1 and got[(0, 1)][1] == 1.0
    # the floor(x+0.5) grid is half-a-step asymmetric around zero
    # (0.5 -> 64, -0.5 -> -63 at scale 127), so anti-parallel reads
    # -1 + O(1/127), ranked last — not the exact -1.0
    assert got[(0, 2)][0] == 3 and abs(got[(0, 2)][1] + 1.0) < 0.001
    assert all(v[2] for v in got.values())  # everyone is in top-3 of 3


def test_min_gram_unit(spark):
    rows = spark.range(1).select(
        joins._min_gram(F.lit("banana")).alias("g1"),
        joins._min_gram(F.lit("ab")).alias("g2"),
        joins._min_gram(F.lit("")).alias("g3"),
        joins._min_gram(F.lit(None).cast("string")).alias("g4"),
    ).first()
    # 4-grams of banana: bana, anan, nana -> min 'anan'
    assert rows.g1 == "anan"
    assert rows.g2 == "ab\x01\x01"  # conditional pad, no truncation
    assert rows.g3 == "\x01\x01\x01\x01"
    assert rows.g4 is None
