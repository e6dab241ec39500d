"""Nondeterminism guard: queries with windows/collects/iterations must
return identical results across repeated executions (shuffle order must
not leak into results — the driver hashes values, so flakiness here
would fail the correctness gate randomly)."""

from __future__ import annotations

import pytest

RISKY = [
    "xml_trail_parse",        # collect_list ordering
    "ann_lsh_topk",           # multi-table union + dropDuplicates + rank
    "vocab_top_terms",        # global rank with count ties
    "tfidf_top_terms",        # per-doc rank with score ties
    "dedup_minhash_lsh",      # banded join + distinct
    "dedup_cluster_survivors",  # iterative label propagation
    "keyset_page",            # limit after orderBy
    "dtail_json",             # tail limit
    "events_as_changelog_state",  # window compaction
    # round-5 second wave
    "quality_topk_per_lang",  # two-phase salted top-k with score ties
    "ann_ivfpq_topk",         # IVF candidates + decimal ADC rank
    "oov_rate",               # vocab cut at count ties
    "dedup_span_windows",     # min-occurrence race across shuffles
    "dedup_cluster_star",     # iterative star alternation
]


@pytest.mark.parametrize("name", RISKY)
def test_repeated_execution_identical(name, spark, sf_dir):
    from databus_spark.registry import QUERIES

    def run():
        df = QUERIES[name](spark, sf_dir)
        return sorted(tuple(r) for r in df.collect())

    assert run() == run()
