"""ExactSubstr dedup (Lee et al., arXiv:2107.06499) — sliding-window
restatement.

Oracle parity is covered by the parametrized registry gate
(test_registry_oracles); these tests pin the SEMANTIC contract the
oracle comparison can't see: unaligned detection, span maximality,
keep-first policy, token conservation, and the no-token-explode plan.
"""

from __future__ import annotations

import pytest

from databus_spark.operators import dedup as D


@pytest.fixture(scope="module")
def planted(spark):
    """Three docs; B repeats A's 12-token sentence at a DIFFERENT token
    offset (A: position 4, B: position 2). Aligned non-overlapping
    windows cannot pair these; sliding windows must."""
    shared = "the quick brown fox jumps over the lazy dog near the river"
    rows = [
        (1, f"alpha beta gamma {shared} delta epsilon"),
        (2, f"one two {shared} three four five six"),
        (3, "entirely unique text with no repeated content of any kind here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_detects_unaligned_duplicate(planted):
    spans = {r["doc_id"]: r for r in D.exactsubstr_spans(planted, win=8).collect()}
    assert set(spans) == {1, 2}  # doc 3 untouched
    # the shared sentence is 12 tokens: spans must cover exactly it
    # (doc 1: tokens 4..15, doc 2: tokens 3..14 — 1-based)
    assert (spans[1]["span_start"], spans[1]["span_end"]) == (4, 15)
    assert (spans[2]["span_start"], spans[2]["span_end"]) == (3, 14)
    assert spans[1]["span_tokens"] == 12
    # 12-token dup at win=8 -> 5 sliding windows merged into ONE span
    assert spans[1]["n_windows"] == 5


def test_keep_first_occurrence(planted):
    out = {r["doc_id"]: r for r in D.exactsubstr_dedup(planted, win=8).collect()}
    # doc 1 owns the first occurrence (min doc_id): fully intact
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"].startswith("alpha beta gamma the quick")
    # doc 2 loses exactly the 12 shared tokens
    assert out[2]["n_removed"] == 12
    assert out[2]["clean_text"] == "one two three four five six"
    assert out[3]["n_removed"] == 0
    # conservation: clean token count == n_tokens - n_removed
    for r in out.values():
        n_clean = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert n_clean == r["n_tokens"] - r["n_removed"]


def test_spans_maximal_and_disjoint(spark, sf_dir):
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    win = D.EXSUB_WIN
    by_doc: dict[int, list] = {}
    for r in D.exactsubstr_spans(docs).collect():
        assert r["span_tokens"] >= win
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1
        by_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    assert by_doc, "fixture should contain duplicated windows"
    for doc_spans in by_doc.values():
        doc_spans.sort()
        for (s1, e1), (s2, _) in zip(doc_spans, doc_spans[1:]):
            # maximality: merged islands leave a real gap — the next
            # span's first window starts > win past the previous last
            # window, i.e. span gaps are at least 2 tokens
            assert s2 >= e1 + 2, (s1, e1, s2)


def test_dedup_covers_all_docs_and_short_docs_untouched(spark, sf_dir):
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    out = D.exactsubstr_dedup(docs).collect()
    assert len(out) == docs.count()
    for r in out:
        if r["n_tokens"] < D.EXSUB_WIN:
            assert r["n_removed"] == 0
        assert 0 <= r["n_removed"] <= r["n_tokens"]


def test_clean_plan_never_explodes_tokens(spark, sf_dir):
    """The cut step must stay a per-doc array filter: exactly ONE
    generator (the window-hash posexplode) in the whole plan — a second
    explode would mean the clean step shuffles O(corpus tokens)."""
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    plan = D.exactsubstr_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") <= 2, plan[:1200]  # posexplode + its codegen echo
    assert "CartesianProduct" not in plan


def test_incremental_cuts_against_base_only(spark):
    """Incoming content already in the base is cut even at a shifted
    offset; incoming-only duplication is NOT this operator's job
    (in-batch dedup belongs to exactsubstr_dedup on the survivors)."""
    shared = "the quick brown fox jumps over the lazy dog near the river"
    base = spark.createDataFrame(
        [(1, f"intro words {shared} outro")], "doc_id long, text string"
    )
    rep = "one two three four five six seven eight nine ten eleven twelve"
    incoming = spark.createDataFrame(
        [
            (10, f"prefix {shared} suffix tokens"),  # base content, new offset
            (11, rep),   # duplicated only WITHIN the batch
            (12, rep),
            (13, "totally fresh text with nothing shared anywhere at all ok"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in D.exactsubstr_incremental(incoming, base, win=8).collect()}
    assert out[10]["n_removed"] == 12  # exactly the shared sentence
    assert "quick" not in out[10]["clean_text"]
    assert out[10]["clean_text"].startswith("prefix") and out[10]["clean_text"].endswith("suffix tokens")
    # in-batch dups untouched by the incremental check
    assert out[11]["n_removed"] == 0 and out[12]["n_removed"] == 0
    assert out[13]["n_removed"] == 0


def test_incremental_staged_index_equals_inline(spark, sf_dir):
    """Passing a pre-staged base hash set must be result-identical to
    inline hashing (the staging is a pure materialization)."""
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    incoming = D.documents_with_dups(spark, sf_dir).where("doc_id >= 1000000")
    inline = D.exactsubstr_incremental(incoming, docs)
    staged = D.exactsubstr_incremental(
        incoming, docs, base_hashes=D.exactsubstr_base_hashes(docs)
    )
    a = {tuple(r) for r in inline.collect()}
    b = {tuple(r) for r in staged.collect()}
    assert a == b and a


def test_sketch_eval_confusion_consistency(spark, sf_dir):
    """The confusion row must reconcile exactly with the two pair sets
    it scores, and the micro-ratios must be their floored definitions."""
    corpus = D.documents_with_dups(spark, sf_dir)
    truth = {(r["doc_a"], r["doc_b"]) for r in D.ngram_jaccard_pairs(corpus, 5, 0.5).collect()}
    pred = {(r["doc_a"], r["doc_b"]) for r in D.minhash_lsh_pairs(corpus, 5, 0.5).collect()}
    row = D.sketch_eval(corpus, 5, 0.5).collect()[0]
    assert row["tp"] == len(truth & pred)
    assert row["fp"] == len(pred - truth)
    assert row["fn"] == len(truth - pred)
    assert row["precision_micro"] == 1_000_000 * row["tp"] // max(row["tp"] + row["fp"], 1)
    assert row["recall_micro"] == 1_000_000 * row["tp"] // max(row["tp"] + row["fn"], 1)
    assert row["tp"] + row["fn"] == len(truth) and len(truth) > 0
