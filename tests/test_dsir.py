"""DSIR importance-weighted data selection (arXiv:2302.03169).

Oracle parity runs in the parametrized registry gate; these tests pin
what the oracle can't: real discrimination on a distributionally-split
corpus (the sf fixture's langs share one lexicon, so its separation is
structurally flat), weight-table arithmetic invariants, and the
broadcast/no-global-sort plan shape.
"""

from __future__ import annotations

import pytest

from databus_spark.operators import shards as S


@pytest.fixture(scope="module")
def bimodal(spark):
    """40 docs over two DISJOINT lexicons: odd doc_ids are 'en' (the
    DSIR target domain) over {alpha..delta}, even are 'zh' over
    {omega..phi}. A correct importance scorer must rank every en doc
    above every zh doc."""
    rows = []
    for i in range(40):
        words = (
            ["alpha", "beta", "gamma", "delta"]
            if i % 2
            else ["omega", "psi", "chi", "phi"]
        )
        text = " ".join(words[(i + j) % 4] for j in range(30))
        rows.append((i, text, "en" if i % 2 else "zh"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_target_domain_fully_separated(bimodal):
    sc = {r["doc_id"]: r["per_feat_micro"] for r in S.dsir_doc_scores(bimodal).collect()}
    assert len(sc) == 40
    en = [v for k, v in sc.items() if k % 2]
    zh = [v for k, v in sc.items() if not k % 2]
    assert min(en) > max(zh), (min(en), max(zh))


def test_topk_selects_target_docs(bimodal):
    top = S.dsir_select_topk(bimodal, k=20).collect()
    assert len(top) == 20
    assert all(r["doc_id"] % 2 == 1 for r in top)  # all 20 en docs
    assert [r["rank"] for r in top] == list(range(1, 21))
    # deterministic tie order: rank ascending => (score desc, doc_id asc)
    for a, b in zip(top, top[1:]):
        assert (a["per_feat_micro"], -a["doc_id"]) >= (
            b["per_feat_micro"],
            -b["doc_id"],
        )


def test_weight_table_invariants(spark, sf_dir):
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    rows = S.dsir_feature_weights(docs).collect()
    assert 0 < len(rows) <= S.DSIR_BUCKETS
    t_r = sum(r["c_corpus"] for r in rows)
    t_t = sum(r["c_target"] for r in rows)
    assert 0 < t_t < t_r  # target is a strict subset of the corpus
    B = S.DSIR_BUCKETS
    for r in rows:
        assert 0 <= r["c_target"] <= r["c_corpus"]  # subset per bucket
        # weight is exactly the floored micro-ratio
        expect = ((r["c_target"] + 1) * (t_r + B) * 1_000_000) // (
            (r["c_corpus"] + 1) * (t_t + B)
        )
        assert r["weight_micro"] == expect


def test_scores_plan_broadcasts_weights_no_global_sort(spark, sf_dir):
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    plan = (
        S.dsir_select_topk(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan[:1200]
    assert "CartesianProduct" not in plan
    # top-k must be TakeOrdered (per-partition heads + k-row merge),
    # never a full Sort+Exchange of the scored corpus
    assert "TakeOrderedAndProject" in plan, plan[:1200]


def test_incremental_staged_weights_equal_inline(spark, sf_dir):
    """Scoring through staged weights must be result-identical to
    inline training, and an exact copy of a base doc must score
    exactly what the base doc scores in-corpus (same feature stream,
    same weights)."""
    from databus_spark.operators import dedup as D
    from pyspark.sql import functions as F

    base = spark.read.parquet(sf_dir + "/documents.parquet")
    incoming = D.documents_with_dups(spark, sf_dir).where(F.col("doc_id") >= 1_000_000)
    inline = S.dsir_incremental_scores(incoming, base)
    staged = S.dsir_incremental_scores(
        incoming, base, weights=S.dsir_feature_weights(base)
    )
    a = {tuple(r) for r in inline.collect()}
    b = {tuple(r) for r in staged.collect()}
    assert a == b and a
    # mirrored copies (doc_id = base + 1M) score identically to their
    # base doc under the base-trained weights
    base_scores = {
        r["doc_id"]: (r["n_feats"], r["score_micro"])
        for r in S.dsir_doc_scores(base).collect()
    }
    for r in inline.collect():
        if r["doc_id"] < 2_000_000:  # the exact mirrors
            orig = base_scores[r["doc_id"] - 1_000_000]
            assert (r["n_feats"], r["score_micro"]) == orig
