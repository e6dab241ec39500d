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


# ---------------------------------------------------------------------------
# Winnowing pre-filter equivalence (r8 verdict ask #3)
# ---------------------------------------------------------------------------

def _adversarial_corpus(spark):
    """Every shape that could break the pre-filter's recall guarantee:
    a dup of EXACTLY win=8 tokens (the guarantee threshold, no slack),
    a 7-token near-miss (must NOT be cut by either path), a within-doc
    duplicate, a self-overlapping repeat with period < win, a long
    cross-doc dup at different offsets, and clean docs."""
    exactly8 = "w1 w2 w3 w4 w5 w6 w7 w8"
    long_dup = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, f"aa bb cc {exactly8} dd ee"),
        (2, f"xx {exactly8} yy zz qq rr"),
        (3, "p1 p2 p3 p4 p5 p6 p7 other p1 p2 p3 p4 p5 p6 p7 end"),  # 7-token dup: below win
        (4, f"intro {long_dup} outro words here"),
        (5, f"{long_dup} trailing content of doc five"),
        (6, f"selfdup {exactly8} middle filler tokens {exactly8} tail"),  # within-doc
        (7, "rep rep rep rep rep rep rep rep rep rep rep rep"),  # period 1 < win
        (8, "entirely unique text with no repeated content of any kind"),
        (9, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_prefilter_differential_equivalence(spark, sf_dir):
    """Pre-filtered output must be row-identical to the brute path on
    the adversarial corpus AND on the real fixture corpus."""
    adv = _adversarial_corpus(spark)
    for docs in (adv, D.documents_with_dups(spark, sf_dir)):
        assert _sorted_rows(D.exactsubstr_dedup(docs, prefilter=True)) == \
            _sorted_rows(D.exactsubstr_dedup(docs, prefilter=False))
        assert _sorted_rows(D.exactsubstr_spans(docs, prefilter=True)) == \
            _sorted_rows(D.exactsubstr_spans(docs, prefilter=False))


def test_prefilter_candidates_exact_recall(spark):
    """Every doc holding a duplicated win-window is a candidate; the
    clean docs are pruned (that pruning IS the shuffle saving)."""
    adv = _adversarial_corpus(spark)
    cand = {r["doc_id"] for r in D._exsub_candidates(adv, D.EXSUB_WIN).collect()}
    assert {1, 2, 4, 5, 6, 7} <= cand      # all true dup docs present
    assert len(cand) < 9                   # and SOME doc was pruned
    assert 9 not in cand                   # <win tokens can never dup


def test_prefilter_incremental_differential(spark):
    """Incremental probe with the staged k-hash screen equals the
    unfiltered probe, including the edited-copy (offset-shifted) shape
    the aligned profile misses."""
    base = _adversarial_corpus(spark)
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    incoming = spark.createDataFrame(
        [
            (101, f"new prefix {shared} new suffix"),     # dup vs base
            (102, "totally fresh tokens never seen before anywhere at all"),
            (103, "the quick brown fox jumps over the lazy dog near the river bank shifted"),
        ],
        "doc_id long, text string",
    )
    a = _sorted_rows(D.exactsubstr_incremental(incoming, base, prefilter=True))
    b = _sorted_rows(D.exactsubstr_incremental(incoming, base, prefilter=False))
    assert a == b
    cut = {r[0]: r[2] for r in a}  # doc_id -> n_removed
    assert cut[101] > 0 and cut[103] > 0 and cut[102] == 0


def test_prefilter_auto_threshold_and_long_window(spark):
    """Default (prefilter=None) auto-engages only at win >=
    EXSUB_PREFILTER_MIN_WIN; at win=16 the anchor is k=11 (binary
    decomposition 8+2+1 — exercises the remainder fold) and the
    pre-filtered output still equals brute."""
    assert not D._exsub_prefilter_on(None, D.EXSUB_WIN)
    assert D._exsub_prefilter_on(None, D.EXSUB_PREFILTER_MIN_WIN)
    assert D._exsub_anchor(16) == (11, 6)

    shared16 = " ".join(f"s{i}" for i in range(16))       # exactly win
    shared20 = " ".join(f"t{i}" for i in range(20))
    rows = [
        (1, f"a1 a2 a3 {shared16} a4 a5"),
        (2, f"b1 {shared16} b2 b3 b4 b5 b6"),
        (3, f"c1 c2 {shared20} c3"),
        (4, f"{shared20} d1 d2 d3 d4 d5 d6 d7"),
        (5, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12 u13 u14 u15 u16 u17"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = _sorted_rows(D.exactsubstr_dedup(docs, win=16, prefilter=True))
    b = _sorted_rows(D.exactsubstr_dedup(docs, win=16, prefilter=False))
    assert a == b
    cut = {r[0]: r[2] for r in a}
    assert cut[2] > 0 and cut[4] > 0 and cut[5] == 0
    cand = {r["doc_id"] for r in D._exsub_candidates(docs, 16).collect()}
    assert {1, 2, 3, 4} <= cand and 5 not in cand
