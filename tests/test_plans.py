"""Physical-plan regression guards: the plan properties SCALE.md claims
(pushdown, broadcast, bounded shuffles, partial aggregation) are
asserted here so perf regressions fail loudly, not silently.
"""

from __future__ import annotations

import pytest


def _plan(spark, name, sf_dir):
    from databus_spark.registry import QUERIES

    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_filters_no_shuffle(spark, sf_dir):
    for name in ["filter_keymod_longkey", "filter_keyrange", "filter_payload_fields"]:
        plan = _plan(spark, name, sf_dir)
        assert "Exchange" not in plan, f"{name} gained a shuffle:\n{plan[:800]}"


def test_compaction_single_shuffle_with_partial_agg(spark, sf_dir):
    plan = _plan(spark, "snapshot_orders", sf_dir)
    assert "partial_max_by" in plan, "map-side combine lost"
    assert plan.count("Exchange") <= 2, f"snapshot grew to {plan.count('Exchange')} exchanges"


def test_analytics_latest_state_is_max_by_not_window(spark, sf_dir):
    """pricing_summary / cube_rollup reconstruct latest state through
    compaction.latest_by_key (map-side-combinable max_by), NOT a
    row_number window over the whole changelog. The only Window allowed
    in these plans is the fixture builder's per-(orderkey,linenumber)
    _seq disambiguator, which a real ingested changelog wouldn't need."""
    for name in ["pricing_summary", "cube_rollup"]:
        plan = _plan(spark, name, sf_dir)
        assert "partial_max_by" in plan, f"{name}: latest-state lost map-side combine"
        # No key_str-partitioned row_number window (the slow latest-state shape).
        assert "windowspecdefinition(key_str" not in plan.lower(), (
            f"{name}: latest-state regressed to a row_number window"
        )


def test_dim_joins_broadcast_not_sortmerge(spark, sf_dir):
    for name in ["source_registry_join", "revenue_by_nation", "topk_orders_per_segment"]:
        plan = _plan(spark, name, sf_dir)
        assert "BroadcastHashJoin" in plan, f"{name}: broadcast join lost"
    plan = _plan(spark, "revenue_by_nation", sf_dir)
    assert "SortMergeJoin" not in plan, "star join fell back to sort-merge"


def test_scan_pruning_reaches_parquet(spark, sf_dir):
    plan = _plan(spark, "filter_keymod_longkey", sf_dir)
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan, "column pruning regressed"
    plan = _plan(spark, "bootstrap_snapshot_catchup", sf_dir)
    assert "LessThanOrEqual(o_orderkey" in plan, "scn range predicate no longer pushed"


def test_keyset_page_is_top_k_not_global_sort(spark, sf_dir):
    plan = _plan(spark, "keyset_page", sf_dir)
    assert "TakeOrderedAndProject" in plan, "keyset page became a full sort"


def test_returned_items_topk_plan(spark, sf_dir):
    """Q10 shape: returnflag filter pushed to the lineitem scan, dims
    broadcast, top-20 via TakeOrderedAndProject (never a global sort)."""
    plan = _plan(spark, "returned_items_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan, "top-k became a full sort"
    assert "BroadcastHashJoin" in plan, "dim broadcast lost"
    assert "EqualTo(l_returnflag,R)" in plan, "returnflag not pushed to scan"


def test_ivf_assignment_is_partial_agg_not_window(spark, sf_dir):
    """IVF cell assignment must reduce the xN_CELLS scoring fan-out
    map-side (max_by partial agg); a corpus-wide row_number window here
    would sort-shuffle every scored row at 100 TB."""
    plan = _plan(spark, "ann_ivf_topk", sf_dir)
    assert "partial_max_by" in plan, "IVF assignment lost map-side combine"
    assert "SortMergeJoin" not in plan, "IVF candidate join fell back to sort-merge"


def test_sequence_packing_single_shuffle(spark, sf_dir):
    """Packing must stay one hash-bin shuffle — a global-order window
    here would serialize 100 TB through one partition."""
    plan = _plan(spark, "sequence_packing", sf_dir)
    assert plan.count("Exchange") == 1, "packing gained shuffles"
    assert "SinglePartition" not in plan, "packing collapsed to a global window"


def test_struct_key_compaction_single_shuffle(spark, sf_dir):
    """Struct-keyed compaction keeps the map-side-combinable single-shuffle
    plan — grouping by key_struct must not de-optimize vs string keys."""
    plan = _plan(spark, "schema_key_compaction", sf_dir)
    assert "partial_max_by" in plan, "map-side combine lost on struct keys"


def test_avro_decode_is_arrow_batched(spark, sf_dir):
    """The Avro codec path must be Arrow-batched pandas UDFs, never
    row-at-a-time Python UDFs."""
    plan = _plan(spark, "avro_binary_decode", sf_dir)
    assert "ArrowEvalPython" in plan, "pandas UDF lost Arrow batching"
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF crept in"


def test_key_mod_subscription_prunes_partitions(spark, sf_dir, tmp_path):
    """F6 scale path: a key-mod subscription over a route-materialized
    stage dir must become a PARTITION filter (directory pruning — zero
    data files read for unsubscribed buckets), not a per-row hash."""
    from pyspark.sql import functions as F

    from databus_spark.envelope import customer_changelog
    from databus_spark.operators.filters import key_mod_filter, key_mod_subscription
    from databus_spark.streaming.source import stage_changelog

    log = customer_changelog(spark, sf_dir)
    stage = str(tmp_path / "routed")
    stage_changelog(log, stage, n_chunks=2, route_buckets=8)

    staged = spark.read.option("basePath", stage).parquet(stage + "/chunk=*")
    sub = staged.where(key_mod_subscription(8, 0, 4, route_buckets=8))
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(route_partition" in plan, (
        "subscription did not reach PartitionFilters:\n" + plan[:800]
    )
    # pruning is real: subscribed read touches strictly fewer files
    all_files = staged.select(F.input_file_name()).distinct().count()
    sub_files = sub.select(F.input_file_name()).distinct().count()
    assert 0 < sub_files < all_files

    # and the routed subscription selects EXACTLY the hash-path rows
    expected = log.where(key_mod_filter(8, 0, 4)).count()
    assert sub.count() == expected

    # num_buckets dividing route_buckets composes too (H%4 == route%4)
    sub4 = staged.where(key_mod_subscription(4, 1, 3, route_buckets=8))
    assert sub4.count() == log.where(key_mod_filter(4, 1, 3)).count()


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """Decontamination must broadcast the (small) benchmark gram set and
    stream the corpus map-side — a SortMergeJoin here would shuffle the
    whole exploded corpus at 100 TB."""
    plan = _plan(spark, "decontaminate_vs_benchmark", sf_dir)
    assert "BroadcastHashJoin" in plan, "benchmark gram set not broadcast"
    assert "SortMergeJoin" not in plan, "corpus-side shuffle join crept in"


def test_chunk_documents_no_shuffle(spark, sf_dir):
    """Chunking is per-row transform+explode — any KEYED Exchange here
    means a shuffle crept into a linear scan op. The single allowed
    exchange is widen_scan's deliberate round-robin input guard (r14:
    a no-op at production split counts, it spreads the per-row chunk
    transform off a single-split fixture scan)."""
    plan = _plan(spark, "chunk_documents", sf_dir)
    n_ex = plan.count("Exchange")
    assert n_ex <= 1, "chunk_documents gained a shuffle:\n" + plan[:800]
    if n_ex:
        assert "RoundRobinPartitioning" in plan, (
            "chunk_documents' only exchange must be the round-robin widen "
            "guard, found a keyed shuffle:\n" + plan[:800]
        )


def test_event_rate_anomaly_partial_aggs(spark, sf_dir):
    """Both aggregations (hourly counts, per-type moments) must show
    map-side partial aggregation."""
    plan = _plan(spark, "event_rate_anomaly", sf_dir)
    assert "partial_count" in plan or "partial count" in plan.lower(), (
        "hourly count lost map-side combine"
    )
    assert plan.count("HashAggregate") >= 4, "two-phase agg shape lost"


def test_pq_ann_broadcast_and_partial_agg(spark, sf_dir):
    """PQ ENCODE (the index build) must reduce the codebook fan-out
    map-side (min_by partials); PQ SERVE (the registry query, which
    reads the staged codes index since r7) must join the broadcast ADC
    table — a SortMergeJoin would shuffle the whole encoded corpus at
    100 TB."""
    from databus_spark.catalog import load_table
    from databus_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    cb = similarity._pq_codebook(emb, "vec_id", "embedding")
    enc_plan = (
        similarity.pq_encode(emb, cb, "vec_id", "embedding")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_min_by" in enc_plan, "PQ code assignment lost map-side combine"

    plan = _plan(spark, "ann_pq_topk", sf_dir)
    assert "BroadcastHashJoin" in plan, "ADC table not broadcast"
    assert "SortMergeJoin" not in plan, "PQ scoring fell back to sort-merge"


def test_lsh_band_pairs_have_no_self_join(spark, sf_dir):
    """Banded-LSH candidate generation must be pair-gen from capped
    posting lists, never a banded-vs-banded self-join — a degenerate
    band bucket would fan out O(n^2) at 100 TB. The simhash plan has
    zero joins total; the minhash plan's only joins are the two
    signature-scoring joins of the (already bounded) candidate set."""
    plan = _plan(spark, "dedup_simhash_pairs", sf_dir)
    assert "Join" not in plan, "simhash pair-gen regressed to a join:\n" + plan[:800]
    plan = _plan(spark, "dedup_minhash_lsh", sf_dir)
    n_joins = plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") + plan.count(
        "ShuffledHashJoin"
    )
    assert n_joins <= 2, f"minhash gained joins beyond the scoring pair ({n_joins}):\n" + plan[:800]


def test_snapshot_diff_reuses_agg_partitioning(spark, sf_dir):
    """Both compaction legs shuffle on the key, and the full-outer join
    reuses that partitioning — exactly two Exchanges, never a third for
    the join (which would reshuffle both reconstructed states)."""
    plan = _plan(spark, "snapshot_diff", sf_dir)
    assert plan.count("Exchange") == 2, (
        f"snapshot_diff grew to {plan.count('Exchange')} exchanges:\n" + plan[:800]
    )


def test_mixture_sample_broadcasts_rates(spark, sf_dir):
    """Mixture sampling must broadcast the (few-row) group-rate table and
    filter the corpus map-side — a SortMergeJoin or corpus-wide window
    here would shuffle the whole corpus at 100 TB."""
    plan = _plan(spark, "mixture_temperature_sample", sf_dir)
    assert "BroadcastHashJoin" in plan, "group rates not broadcast"
    assert "SortMergeJoin" not in plan, "corpus-side shuffle join crept in"


def test_byte_budget_fetch_is_topk_bounded(spark, sf_dir):
    """The /stream byte-budget cutoff must bound the input via
    distributed top-k BEFORE the exact running-size window — the
    unbounded form global-sorts the whole retained log."""
    plan = _plan(spark, "stream_fetch_bounded", sf_dir)
    assert "TakeOrderedAndProject" in plan, "byte budget lost the top-k bound"


def test_media_dhash_near_pairs_plan_bounded(spark, sf_dir):
    """The banded hamming pair plan: exactly one posting-list shuffle +
    one repartition before the explode + one distinct — 3 exchanges
    total; the decode feeds all bands from ONE localCheckpoint (a
    Python-RDD scan per band would re-run the codec per band)."""
    plan = _plan(spark, "media_dhash_near_pairs", sf_dir)
    n_ex = plan.count("Exchange")
    assert n_ex <= 3, f"pair-gen grew to {n_ex} exchanges:\n{plan[:1200]}"
    # bands read the checkpointed hash frame, not three decode pipelines
    # (physical plans spell the node "MapInPandas"; an earlier disjunct
    # matching lowercase "mapInPandas" was vacuously true)
    assert plan.count("MapInPandas") <= 1, plan[:1200]


def test_media_dhash_dedup_single_shuffle(spark, sf_dir):
    """Exact perceptual classes are one hash-groupBy with map-side
    partial aggregation — the exact_dedup shape."""
    plan = _plan(spark, "media_dhash_dedup", sf_dir)
    assert plan.count("Exchange") <= 1, plan[:1200]
    assert "partial_count" in plan or "partial_min" in plan, plan[:1200]


def test_media_dhash_incremental_probes_index_not_base(spark, sf_dir):
    """The rolling-ingestion invariant: the delta probe plan contains
    exactly ONE Python decode stage (the delta batch) — the base corpus
    is served from the materialized band-index parquet, never
    re-decoded or re-hashed."""
    plan = _plan(spark, "media_dhash_incremental", sf_dir)
    # the delta decode sits behind a localCheckpoint barrier, so the
    # main plan shows the checkpointed scan (ExistingRDD), not 4 decode
    # branches; without the barrier this count was 4 (one per band
    # projection + the final join — each re-running the Python codec)
    n_py = plan.count("MapInPandas")
    assert n_py <= 1, f"delta decode fans out {n_py}x:\n{plan[:1200]}"
    assert "FileScan parquet" in plan  # the staged band index
    assert "ExistingRDD" in plan  # the barrier is in place


def test_minhash_lsh_pairs_join_free(spark, sf_dir):
    """Scoring rides the posting lists: est_jaccard is computed inline
    from signature structs carried through the buckets, so the pair
    plan has ZERO joins (the old plan re-joined the signature table
    twice — two extra shuffles of sig per query, 10 exchanges vs 6)."""
    plan = _plan(spark, "dedup_minhash_lsh", sf_dir)
    assert plan.count("Join") == 0, plan[:1500]
    assert plan.count("Exchange") <= 6, plan[:1500]
