"""Blocked fuzzy join / record linkage + corpus-drift tests (round 11).

The oracle gate (test_registry_oracles / the driver) pins cross-engine
equality; these tests pin the SEMANTIC claims the docstrings make:

* fuzzy_join_pairs' two-bucket probe is recall-EXACT for pairs within
  max_dist when bucket > max_dist — including pairs whose lengths
  straddle a bucket boundary (the case one-bucket blocking misses);
* oversized blocks drop from pair generation (cap discipline), and the
  cap parameter provably gates that;
* the bucket<=max_dist misconfiguration raises instead of silently
  losing recall;
* the DuckDB twin raises loudly on non-ASCII input (byte-based
  levenshtein would diverge from Spark's char-based one);
* corpus_drift: a slice matching the corpus mixture scores ~0, a
  disjoint-vocabulary slice scores strictly higher, and zero-count
  bins stay finite (smoothing).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from databus_spark.operators import joins
from databus_spark.operators.dedup import dedup_clusters
from databus_spark.operators.text import corpus_drift


def _lev(s: str, t: str) -> int:
    prev = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
        prev = cur
    return prev[-1]


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, f"src{i % 3}", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_boundary_straddling_pair_is_found(spark):
    # len 63 vs len 65 straddle the width-16 buckets (3 vs 4) with a
    # 2-char edit: single-bucket blocking misses it, two-bucket probing
    # must not.
    a = "x" * 63
    b = "x" * 63 + "yy"
    assert len(a) // 16 != len(b) // 16
    docs = _docs(spark, [(a, "en"), (b, "en")])
    got = joins.fuzzy_join_pairs(docs, max_dist=4).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.doc_a, r.doc_b) == (0, 1)
    # prefix-bounded: the edit sits past LINK_PREFIX=64 for doc_b's
    # 65th char only; chars 64..65 are beyond doc_a's length, so the
    # prefix distance is 1 (one trailing y inside the 64-char window)
    assert r.dist == 1


def test_recall_exact_vs_bruteforce(spark):
    # adversarial small corpus: clusters of near-identical strings at
    # assorted lengths; blocking must find EXACTLY the brute-force set
    base = [
        "the quick brown fox jumps over the lazy dog and runs away fast",
        "a completely different sentence about spark shuffles and joins",
        "short text",
    ]
    rows = []
    for t in base:
        rows.append((t, "en"))
        rows.append((t[:-1] + "x", "en"))  # 1-2 edits away
        rows.append((t + " tail", "en"))
    docs = _docs(spark, rows)
    got = {
        (r.doc_a, r.doc_b, r.dist)
        for r in joins.fuzzy_join_pairs(docs, max_dist=6).collect()
    }
    # brute force over the same prefix semantics, same block key (all
    # docs same lang -> blocking restricts only by length, which the
    # two-bucket probe makes exact for dist<=6 < bucket 16)
    import itertools

    pys = [(i, t[:64]) for i, (t, _) in enumerate(rows)]
    want = set()
    for (i, si), (j, sj) in itertools.combinations(pys, 2):
        d = _lev(si, sj)
        if d <= 6:
            want.add((min(i, j), max(i, j), d))
    assert got == want and want  # non-trivial fixture


corpus_strategy = st.lists(
    st.tuples(
        # 2-letter alphabet + short strings make near-dup pairs common
        st.text(alphabet="ab", min_size=0, max_size=30),
        st.sampled_from(["x", "y"]),
    ),
    min_size=2,
    max_size=24,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=corpus_strategy, max_dist=st.sampled_from([1, 3, 6]))
def test_property_fuzzy_join_equals_bruteforce(spark, rows, max_dist):
    """For ANY corpus: blocked output == brute force over same-lang
    pairs (two-bucket length blocking is recall-exact below the bucket
    width, and blocking never admits a pair the filter would reject)."""
    import itertools

    docs = _docs(spark, rows)
    got = {
        (r.doc_a, r.doc_b, r.dist)
        for r in joins.fuzzy_join_pairs(docs, max_dist=max_dist).collect()
    }
    want = {
        (i, j, _lev(si, sj))
        for (i, (si, li)), (j, (sj, lj)) in itertools.combinations(
            enumerate(rows), 2
        )
        if li == lj and _lev(si, sj) <= max_dist
    }
    assert got == want


long_corpus_strategy = st.lists(
    st.tuples(
        # lengths straddling LINK_PREFIX=64: the prefix-length clamp in
        # the bucketing is what keeps long-text pairs recall-exact
        st.text(alphabet="abc", min_size=50, max_size=95),
        st.sampled_from(["x", "y"]),
    ),
    min_size=2,
    max_size=12,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=long_corpus_strategy, max_dist=st.sampled_from([2, 6]))
def test_property_long_texts_equal_prefix_bruteforce(spark, rows, max_dist):
    """Round-12 contract pin: for texts LONGER than the comparison
    prefix, blocked output == brute force over same-lang pairs by
    PREFIX edit distance. Under r11's full-length bucketing this fails
    whenever two 64-char-identical prefixes ride texts whose full
    lengths land >= one bucket apart (the truncated-duplicate class)."""
    import itertools

    docs = _docs(spark, rows)
    got = {
        (r.doc_a, r.doc_b, r.dist)
        for r in joins.fuzzy_join_pairs(docs, max_dist=max_dist).collect()
    }
    want = {
        (i, j, _lev(si[:64], sj[:64]))
        for (i, (si, li)), (j, (sj, lj)) in itertools.combinations(
            enumerate(rows), 2
        )
        if li == lj and _lev(si[:64], sj[:64]) <= max_dist
    }
    assert got == want


def test_block_cap_counts_distinct_prefixes(spark):
    # 5 IDENTICAL docs collapse to ONE distinct-prefix rep (r13 clone
    # collapse), so the cap — which now bounds distinct-prefix
    # DIVERSITY, the quantity the C(cap,2) DP-cost argument needs —
    # never sees them: all C(5,2)=10 dist-0 pairs emit at ANY cap.
    # (The r12 shape dropped this heap wholesale at max_block=4: the
    # clone pile-up residual the round-13 rework closed.)
    docs = _docs(spark, [("same text here", "en")] * 5)
    full = joins.fuzzy_join_pairs(docs, max_dist=2, max_block=16).collect()
    assert len(full) == 10
    capped = joins.fuzzy_join_pairs(docs, max_dist=2, max_block=4).collect()
    assert len(capped) == 10
    assert all(r.dist == 0 for r in capped)
    # the cap still binds where it should: 5 DISTINCT same-length
    # prefixes sharing their min-gram (common min suffix) over cap -> drop
    diverse = _docs(
        spark, [(f"{ch} same tail here", "en") for ch in "vwxyz"]
    )
    assert (
        joins.fuzzy_join_pairs(diverse, max_dist=2, max_block=4).count() == 0
    )


def test_truncated_duplicate_long_texts_found(spark):
    """Round-11 ADVICE #1: a 63-char text and an 83-char text sharing
    the 64-char comparison prefix (a truncated duplicate) must pair —
    full-length bucketing put them 2 buckets apart and silently
    dropped them; bucketing on least(len, prefix_len) restores the
    recall-exactness argument (prefix lengths differ by at most the
    prefix edit distance)."""
    a = "w" * 63
    b = "w" * 63 + "q" * 20  # 83 chars; prefix = w*63 + 'q' -> dist 1
    assert len(a) // 16 != len(b) // 16 and abs(len(a) - len(b)) > 16
    docs = _docs(spark, [(a, "en"), (b, "en")])
    got = joins.fuzzy_join_pairs(docs, max_dist=4).collect()
    assert [(r.doc_a, r.doc_b, r.dist) for r in got] == [(0, 1, 1)]
    # and the incremental probe agrees (same blocking both sides)
    inc = joins.fuzzy_join_incremental(
        docs.where(F.col("doc_id") == 1),
        base=docs.where(F.col("doc_id") == 0),
        max_dist=4,
    ).collect()
    assert [(r.doc_id, r.base_id, r.dist) for r in inc] == [(1, 0, 1)]


def test_oversized_block_splits_on_min_gram(spark):
    """Round-12: an over-cap (key, bucket) block with DIVERSE content
    re-blocks on the min 4-gram instead of dropping wholesale — the
    near-dup pairs inside it survive because a tail edit leaves the
    minimum gram untouched; and the DuckDB twin computes the identical
    split."""
    rows = []
    for ch in "abcd":  # 4 clusters of 2 near-twins, one length bucket
        rows.append((ch * 40, "en"))
        rows.append((ch * 39 + "z", "en"))  # 'z' > ch: min gram unchanged
    docs = _docs(spark, rows)
    # 8 docs per (en, bucket) block > max_block=4 -> split; each
    # min-gram sub-block holds exactly its cluster of 2
    got = {
        (r.doc_a, r.doc_b, r.dist)
        for r in joins.fuzzy_join_pairs(docs, max_dist=2, max_block=4).collect()
    }
    assert got == {(0, 1, 1), (2, 3, 1), (4, 5, 1), (6, 7, 1)}
    # oracle twin parity in the split regime
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        + " UNION ALL ".join(
            f"SELECT {i}::BIGINT AS doc_id, '{t}' AS text, '{lang}' AS lang,"
            f" 'src{i % 3}' AS source, {len(t)}::BIGINT AS n_chars"
            for i, (t, lang) in enumerate(rows)
        )
    )
    duck = {
        (int(a), int(b), int(d))
        for a, b, d in con.execute(
            joins.fuzzy_join_pairs_sql(
                "SELECT * FROM documents", max_dist=2, max_block=4
            )
        ).fetchall()
    }
    assert duck == got


def test_bucket_must_exceed_max_dist(spark):
    docs = _docs(spark, [("abc", "en")])
    with pytest.raises(ValueError, match="must exceed max_dist"):
        joins.fuzzy_join_pairs(docs, max_dist=16, bucket=16)


def test_sql_twin_raises_on_non_ascii():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1::BIGINT AS doc_id, '的是和' AS text,"
        " 'zh' AS lang, 'src0' AS source, 3::BIGINT AS n_chars"
        " UNION ALL SELECT 2, '的不和', 'zh', 'src0', 3"
    )
    with pytest.raises(duckdb.Error, match="non-ASCII"):
        con.execute(joins.fuzzy_join_pairs_sql("SELECT * FROM documents")).df()


def test_linkage_clusters_transitive(spark):
    # a-b and b-c within distance, a-c further: one cluster of three
    rows = [
        ("aaaaaaaaaaaaaaaaaaaa", "en"),
        ("aaaaaaaaaaaaaaaaaabb", "en"),
        ("aaaaaaaaaaaaaaaabbbb", "en"),
        ("zzzz completely unrelated zzzzzzzz", "en"),
    ]
    docs = _docs(spark, rows)
    pairs = joins.fuzzy_join_pairs(docs, max_dist=2)
    got = {(r.doc_id, r.cluster_id) for r in dedup_clusters(pairs).collect()}
    assert got == {(0, 0), (1, 0), (2, 0)}


def test_incremental_staged_equals_inline(spark):
    base = _docs(
        spark,
        [
            ("the quick brown fox jumps over the lazy dog", "en"),
            ("a completely different document about joins", "en"),
            ("short text", "en"),
        ],
    )
    incoming = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog", "en", "m", 44),
            (101, "quick brown fox jumps over the lazy dog", "en", "e", 44),
            (102, "nothing like anything in the base corpus!!", "en", "n", 42),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    inline = joins.fuzzy_join_incremental(incoming, base=base)
    staged = joins.fuzzy_join_incremental(
        incoming, base_blocks=joins.fuzzy_join_blocks(base)
    )
    got_i = sorted((r.doc_id, r.base_id, r.dist) for r in inline.collect())
    got_s = sorted((r.doc_id, r.base_id, r.dist) for r in staged.collect())
    assert got_i == got_s
    # the exact mirror links at dist 0; the unrelated doc links nowhere
    assert (100, 0, 0) in got_i
    assert not any(d == 102 for d, _, _ in got_i)


def test_incremental_base_cap_rides_the_index(spark):
    # r13 clone collapse: 5 IDENTICAL base docs are ONE rep in the
    # staged index — they can't overflow any cap, and an exact incoming
    # mirror finds all 5 through the clone map at every cap setting
    base = _docs(spark, [("same text here", "en")] * 5)
    incoming = spark.createDataFrame(
        [(100, "same text here", "en", "m", 14)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    for cap in (4, 16):
        got = joins.fuzzy_join_incremental(
            incoming,
            base_blocks=joins.fuzzy_join_blocks(base, max_block=cap),
            base_map=joins.fuzzy_join_clone_map(base),
        ).collect()
        assert len(got) == 5 and all(r.dist == 0 for r in got)
    # the cap still rides the index where it should: 5 DISTINCT base
    # prefixes sharing their min-gram (common min suffix) overflow a
    # cap of 4 at index-build time, so a probe finds nothing — batch
    # and incremental cap semantics agree
    diverse = _docs(spark, [(f"{ch} same tail here", "en") for ch in "vwxyz"])
    idx = joins.fuzzy_join_blocks(diverse, max_block=4)
    probe = spark.createDataFrame(
        [(200, "v same tail here", "en", "m", 16)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert (
        joins.fuzzy_join_incremental(
            probe,
            base_blocks=idx,
            base_map=joins.fuzzy_join_clone_map(diverse),
        ).collect()
        == []
    )


def test_incremental_clusters_equal_full_recompute(spark):
    """The contraction identity end-to-end: base clusters entered as
    star edges + (cross ∪ within-batch) new edges must yield the SAME
    components as a from-scratch solve over the unioned corpus. Caps
    are set generously so blocking-population differences between the
    split and unioned corpora cannot mask the equivalence."""
    base_rows = [
        ("aaaaaaaaaaaaaaaaaaaa", "en"),
        ("aaaaaaaaaaaaaaaaaabb", "en"),  # links to 0
        ("cccccccccccccccccccc", "en"),
        ("zzzz nothing like the others zzzz", "en"),
    ]
    base = _docs(spark, base_rows)
    incoming = spark.createDataFrame(
        [
            # bridges base clusters 0/1 with doc 2's cluster? no — links
            # to doc 2 only (new 2-member cluster)
            (100, "ccccccccccccccccccdd", "en", "inc", 20),
            # mirror of doc 0: joins the {0,1} cluster
            (101, "aaaaaaaaaaaaaaaaaaaa", "en", "inc", 20),
            # two incoming docs linked only to each other
            (102, "eeeeeeeeeeeeeeeeeeee", "en", "inc", 20),
            (103, "eeeeeeeeeeeeeeeeeeff", "en", "inc", 20),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    blocks = joins.fuzzy_join_blocks(base, max_block=4096)
    base_cl = dedup_clusters(joins.fuzzy_join_pairs(base, max_block=4096))
    from pyspark.sql import functions as F2

    cross = joins.fuzzy_join_incremental(incoming, base_blocks=blocks).select(
        F2.col("doc_id").alias("doc_a"), F2.col("base_id").alias("doc_b")
    )
    within = joins.fuzzy_join_pairs(incoming, max_block=4096).select(
        "doc_a", "doc_b"
    )
    star = base_cl.where(F2.col("doc_id") != F2.col("cluster_id")).select(
        F2.col("doc_id").alias("doc_a"), F2.col("cluster_id").alias("doc_b")
    )
    got = sorted(
        tuple(r)
        for r in dedup_clusters(
            cross.unionByName(within).unionByName(star)
        ).collect()
    )
    full = sorted(
        tuple(r)
        for r in dedup_clusters(
            joins.fuzzy_join_pairs(
                base.unionByName(incoming), max_block=4096
            )
        ).collect()
    )
    assert got == full
    clusters = {r[0]: r[1] for r in got}
    assert clusters[101] == 0 and clusters[1] == 0  # mirror joined {0,1}
    assert clusters[100] == 2  # edit joined doc 2
    assert clusters[103] == 102  # incoming-only pair formed its own


def test_corpus_drift_flags_the_shifted_slice(spark):
    # srcA and srcB share the corpus mixture; srcC is disjoint vocab
    rows = []
    for i in range(30):
        rows.append((f"{i}", "alpha beta gamma delta", "en", "srcA"))
    for i in range(30, 60):
        rows.append((f"{i}", "alpha beta gamma delta", "en", "srcB"))
    for i in range(60, 90):
        rows.append((f"{i}", "omega omega omega omega", "en", "srcC"))
    docs = spark.createDataFrame(
        [(int(i), t, lang, s, len(t)) for i, t, lang, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.source: r for r in corpus_drift(docs).collect()}
    assert set(out) == {"srcA", "srcB", "srcC"}
    assert out["srcA"].n_tokens == 120
    # matching slices: near-zero drift; disjoint slice: strictly higher
    assert abs(out["srcA"].kl_div - out["srcB"].kl_div) < 1e-9
    assert out["srcC"].kl_div > out["srcA"].kl_div + 0.1
    # smoothing keeps every term finite even though srcC never emits
    # the top-vocab tokens and srcA never emits omega
    for r in out.values():
        assert r.kl_div == r.kl_div  # not NaN


def test_corpus_drift_single_slice_is_exactly_zero(spark):
    """One slice == the corpus mixture: p == q bin-for-bin, every term
    rounds to 0, and the decimal sum is EXACTLY 0.0 (not epsilon)."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma", "en", "only", 16) for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = corpus_drift(docs).collect()
    assert len(out) == 1 and out[0].kl_div == 0.0


drift_corpus_strategy = st.lists(
    st.tuples(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=6).map(" ".join),
        st.sampled_from(["s0", "s1", "s2"]),
    ),
    min_size=3,
    max_size=30,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=drift_corpus_strategy)
def test_property_corpus_drift_nonnegative(spark, rows):
    """Gibbs' inequality survives the 6dp per-term rounding: smoothed
    KL against the corpus mixture can dip below zero by at most the
    accumulated rounding slack, never materially."""
    docs = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    for r in corpus_drift(docs).collect():
        assert r.kl_div >= -1e-4  # bins x 0.5ulp(6dp) rounding slack
        assert r.n_tokens > 0
