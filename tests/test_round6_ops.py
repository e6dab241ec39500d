"""Round-6 operators: python-reference differentials and properties
beyond the DuckDB oracle checks (which prove cross-engine agreement,
not that BOTH engines aren't wrong the same way)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from databus_spark.catalog import load_table


def test_bpe_pair_counts_matches_python_reference(spark, sf_dir):
    """The merge ranking equals a direct python count of adjacent
    whitespace-token pairs, including the (count DESC, pair ASC) order."""
    from databus_spark.operators.text import bpe_pair_counts

    docs = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    ref = Counter()
    for t in texts:
        toks = t.strip().lower().split()
        ref.update(" ".join(p) for p in zip(toks, toks[1:]))
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [(r["pair"], r["n"]) for r in bpe_pair_counts(docs).collect()]
    assert got == want


def test_split_assign_is_content_keyed_and_stable(spark, sf_dir):
    """Leakage safety + growth stability: byte-identical texts share a
    split; a doc's assignment is unchanged when the corpus doubles."""
    from databus_spark.operators.shards import split_assign

    docs = load_table(spark, sf_dir, "documents")
    twins = docs.unionByName(
        docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text",
                    "lang", "source", "n_chars")
    )
    rows = {r["doc_id"]: r["split"] for r in split_assign(twins).collect()}
    n = docs.count()
    for doc_id in list(rows):
        if doc_id >= 10_000_000:
            assert rows[doc_id] == rows[doc_id - 10_000_000], "twin split leak"
    base = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    assert all(rows[k] == v for k, v in base.items()), "growth moved assignments"
    # all three splits populated with roughly the configured shares
    shares = Counter(base.values())
    assert set(shares) == {"train", "val", "test"}
    assert shares["train"] / n > 0.6


def test_hll_parity_at_sf01(spark):
    """The sf0.1 leg of the 'parity verified at sf0.1 too' claim for
    the new sketch (the raw-estimator branch engages only there)."""
    from databus_spark.registry import ORACLES, QUERIES
    from tests.oracle_utils import compare, duck_connect

    con = duck_connect("/root/testdata/sf0.1")
    try:
        compare(
            QUERIES["hll_distinct_users"](spark, "/root/testdata/sf0.1"),
            con,
            ORACLES["hll_distinct_users"],
        )
    finally:
        con.close()


def test_binned_quantiles_within_bin_width(spark, sf_dir):
    """The histogram estimate can be off by at most ~one bin width of
    the value range (interpolation inside the straddling bin)."""
    from databus_spark.operators.stats import QB_BINS, binned_quantiles

    e = load_table(spark, sf_dir, "events").select("value")
    mm = e.agg(F.min("value"), F.max("value")).collect()[0]
    bin_w = (mm[1] - mm[0]) / QB_BINS
    for r in binned_quantiles(e, "value").collect():
        assert r["abs_err"] <= bin_w, (r["q"], r["abs_err"], bin_w)


def test_incremental_near_matches_batch_lsh_semantics(spark, sf_dir):
    """Every delta doc the in-corpus LSH pair generator links to a base
    doc must also be matched by the incremental probe (same bands, same
    signatures — the incremental index loses no recall vs batch)."""
    from databus_spark.operators import dedup

    corpus = dedup.documents_with_dups(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(corpus, k=5).collect()
    batch_matched = {
        max(r["doc_a"], r["doc_b"])
        for r in pairs
        if min(r["doc_a"], r["doc_b"]) < 1_000_000 <= max(r["doc_a"], r["doc_b"])
    }
    incoming = corpus.where(F.col("doc_id") >= 1_000_000)
    base = load_table(spark, sf_dir, "documents")
    inc = {
        r["doc_id"]
        for r in dedup.incremental_near_dedup(incoming, base).where(~F.col("is_new")).collect()
    }
    assert batch_matched <= inc
