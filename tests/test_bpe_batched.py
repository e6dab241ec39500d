"""Batched-greedy BPE (round-8): conflict-safety and spec pins.

The batched learner adopts up to k token-disjoint rules per round from
one count snapshot. Disjointness is what makes the batch exact: counts
of disjoint pairs are invariant under each other's application, so the
adopted (rule, n) pairs equal what k serial recount-rounds would adopt
whenever the serial winners are themselves disjoint.
"""

from __future__ import annotations


def _learn(spark, corpus: str, n_merges: int, k: int):
    from databus_spark.operators.text import bpe_learn_merges_batched

    docs = spark.createDataFrame([(1, corpus)], "doc_id BIGINT, text STRING")
    return [
        (r["rank"], r["pair"], r["n"])
        for r in bpe_learn_merges_batched(
            docs, n_merges=n_merges, k_per_round=k
        ).collect()
    ]


def test_conflicting_candidate_skipped(spark):
    """(b,c) ties the adopted (a,b)/(c,d) at n=2 but shares tokens with
    both — the greedy walk must skip it within the round."""
    rules = _learn(spark, "a b a b c d c d b c", n_merges=2, k=2)
    assert [p for _, p, _ in rules] == ["a b", "c d"]
    # counts are the snapshot counts, exact because rules are disjoint
    assert [n for _, _, n in rules] == [2, 2]


def test_adopted_rules_are_token_disjoint_per_round(spark, sf_dir):
    from databus_spark.operators.text import bpe_learn_merges_batched
    from databus_spark.catalog import load_table

    k = 16
    rows = bpe_learn_merges_batched(
        load_table(spark, sf_dir, "documents"), n_merges=64, k_per_round=k
    ).collect()
    assert len(rows) >= 48  # realistic rule count actually learned
    ranks = [r["rank"] for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    # within each adoption round: no shared tokens, no output/input
    # collisions (rule outputs 'a b' never appear as other rules' sides)
    by_round: dict[int, list[str]] = {}
    for r in rows:
        by_round.setdefault((r["rank"] - 1) // k, []).append(r["pair"])
    for _rnd, pairs in by_round.items():
        used: set[str] = set()
        for p in pairs:
            a, b = p.split(" ", 1)[0], p.split(" ", 1)[1]
            assert a not in used and b not in used and p not in used
            used.update((a, b, p))


def test_batched_first_round_matches_serial_top1(spark, sf_dir):
    """Rank-1 of the batched learner IS the serial greedy's first rule
    (same snapshot, same ordering) — the batch is an extension of the
    serial loop, not a different algorithm."""
    from databus_spark.operators.text import (
        bpe_learn_merges,
        bpe_learn_merges_batched,
    )
    from databus_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    serial = bpe_learn_merges(docs, n_merges=1).collect()
    batched = bpe_learn_merges_batched(docs, n_merges=4, k_per_round=4).collect()
    assert (serial[0]["pair"], serial[0]["n"]) == (
        batched[0]["pair"],
        batched[0]["n"],
    )


def test_bpe_encode_consistency(spark):
    """Encode invariants: n_tokens never exceeds the raw whitespace
    token count, total token reduction equals the rules' total
    application count on the training corpus (each merge application
    removes exactly one token), and the fold is idempotent-stable
    (same rules -> same md5s)."""
    from pyspark.sql import functions as F

    from databus_spark.operators.text import (
        bpe_encode,
        bpe_encode_rules,
        bpe_learn_merges_batched,
        tokens_col,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    rules = bpe_encode_rules(docs, n_merges=8, k_per_round=4)
    enc1 = bpe_encode(docs, n_merges=8, k_per_round=4, rules=rules)
    enc2 = bpe_encode(docs, n_merges=8, k_per_round=4, rules=rules)
    p1 = {r["doc_id"]: (r["n_tokens"], r["enc_md5"]) for r in enc1.collect()}
    p2 = {r["doc_id"]: (r["n_tokens"], r["enc_md5"]) for r in enc2.collect()}
    assert p1 == p2  # deterministic
    raw = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(tokens_col(F.col("text"))).alias("n")
        ).collect()
    }
    assert all(p1[d][0] <= raw[d] for d in raw)
    # conservation: merges learned ON this corpus each removed one token
    total_merged = sum(
        int(r["n"]) for r in bpe_learn_merges_batched(docs, 8, 4).collect()
    )
    assert sum(raw.values()) - sum(n for n, _ in p1.values()) == total_merged


def test_positional_cap_parity_non_divisible(spark, sf_dir):
    """A short round forfeits its unused slots in BOTH engines: the
    engine cap is positional (min(k, n_merges - (r-1)*k)), matching the
    SQL twin. Corpus engineered so round 1 adopts only 1 of its 2
    slots; with n_merges=3, k=2 a len(rules)-keyed engine cap would
    adopt 2 rules in round 2 while the oracle caps at 1 — rule tables
    diverge (this was a live bug for any non-divisible params)."""
    from databus_spark.operators.text import (
        bpe_learn_merges_batched,
        bpe_learn_merges_batched_sql,
    )
    from tests.oracle_utils import compare, duck_connect

    corpus = "a b b c a b b c"
    docs = spark.createDataFrame([(1, corpus)], "doc_id BIGINT, text STRING")
    df = bpe_learn_merges_batched(docs, n_merges=3, k_per_round=2).select(
        "rank", "pair", "n"
    )
    rules = df.collect()
    # round 1: (a,b) adopted, (b,b)/(b,c)/(c,a) all conflict -> 1 rule;
    # round 2 positional cap is 1 -> exactly 2 rules total
    assert [r["pair"] for r in sorted(rules, key=lambda r: r["rank"])] == [
        "a b",
        "a b b",
    ]
    con = duck_connect(sf_dir)
    try:
        compare(
            df,
            con,
            bpe_learn_merges_batched_sql(
                f"SELECT 1 AS doc_id, '{corpus}' AS text",
                n_merges=3,
                k_per_round=2,
            ),
        )
    finally:
        con.close()
