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

from databus_spark.operators import joins
from databus_spark.operators.dedup import dedup_clusters
from databus_spark.operators.text import corpus_drift


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

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct))
                )
            prev = cur
        return prev[-1]

    want = set()
    for (i, si), (j, sj) in itertools.combinations(pys, 2):
        d = lev(si, sj)
        if d <= 6:
            want.add((min(i, j), max(i, j), d))
    assert got == want and want  # non-trivial fixture


def test_block_cap_drops_oversized_blocks(spark):
    # 5 identical docs: with max_block >= 10 (5 docs x 2 buckets) all
    # C(5,2)=10 pairs emit; with max_block 4 every block is oversized
    # and pair generation drops them all
    docs = _docs(spark, [("same text here", "en")] * 5)
    full = joins.fuzzy_join_pairs(docs, max_dist=2, max_block=16).collect()
    assert len(full) == 10
    capped = joins.fuzzy_join_pairs(docs, max_dist=2, max_block=4).collect()
    assert capped == []


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
