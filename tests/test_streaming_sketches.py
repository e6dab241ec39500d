"""Streaming sketch maintenance: HLL max-merge / CM add across
micro-batches equals the batch sketch of all data; replay safety."""

from __future__ import annotations

from pyspark.sql import functions as F

from databus_spark.catalog import load_table


def _halves(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return e, e.where(F.col("user_id") % 2 == 0), e.where(F.col("user_id") % 2 == 1)


def test_streaming_hll_converges_to_batch(spark, sf_dir, tmp_path):
    from databus_spark.operators.stats import hll_distinct
    from databus_spark.streaming.sketches import StreamingDistinctCounter

    whole, h1, h2 = _halves(spark, sf_dir)
    c = StreamingDistinctCounter(spark, str(tmp_path / "hll"), "user_id", "event_type")
    c.process_batch(h1, 0)
    c.process_batch(h2, 1)
    got = {r["grp"]: r["n_hll"] for r in c.estimates().collect()}
    want = {
        r["event_type"]: r["n_hll"]
        for r in hll_distinct(whole, "user_id", "event_type").collect()
    }
    assert got == want

    # replay of batch 1 (at-least-once) must not move the estimate:
    # register max is idempotent
    c.process_batch(h2, 1)
    assert {r["grp"]: r["n_hll"] for r in c.estimates().collect()} == want

    # vacuum keeps the current version readable
    c.vacuum(keep_last=1)
    assert {r["grp"]: r["n_hll"] for r in c.estimates().collect()} == want


def test_streaming_cm_converges_and_skips_replay(spark, sf_dir, tmp_path):
    from databus_spark.operators.stats import cm_frequency_profile
    from databus_spark.streaming.sketches import StreamingFrequencySketch

    whole, h1, h2 = _halves(spark, sf_dir)
    whole = whole.where(F.col("user_id") < 50).select("user_id")
    h1 = h1.where(F.col("user_id") < 50).select("user_id")
    h2 = h2.where(F.col("user_id") < 50).select("user_id")

    s = StreamingFrequencySketch(spark, str(tmp_path / "cm"), "user_id")
    s.process_batch(h1, 0)
    s.process_batch(h2, 1)
    keys = whole.distinct()
    got = {r["user_id"]: r["n_cm"] for r in s.estimate(keys).collect()}
    want = {
        r["user_id"]: r["n_cm"]
        for r in cm_frequency_profile(whole, "user_id").collect()
    }
    assert got == want

    # counter addition is NOT idempotent -> replayed batch must be skipped
    s.process_batch(h2, 1)
    assert {r["user_id"]: r["n_cm"] for r in s.estimate(keys).collect()} == want
