"""Advanced streaming: exactly-once to non-idempotent sinks,
stream-stream joins, watermarked streaming dedup — capabilities beyond
the reference's transport (SURVEY §2.10 T7/T8 depth + T13 extensions)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from databus_spark.envelope import orders_changelog
from databus_spark.streaming.exactly_once import EpochLedger, ExactlyOnceSink
from databus_spark.streaming.source import changelog_stream, stage_changelog


def test_exactly_once_append_sink_under_replay(spark, sf_dir, tmp_path):
    """A crash AFTER the sink but BEFORE Spark commits the batch replays
    the epoch; the ledger must dedupe it so the append sink stays exact."""
    log = orders_changelog(spark, sf_dir).select("scn", "opcode", "key_str")
    stage = str(tmp_path / "stage")
    stage_changelog(log, stage, n_chunks=4)
    out = str(tmp_path / "out")

    def append_sink(batch, epoch_id):
        batch.write.mode("append").parquet(out)

    ledger = EpochLedger(str(tmp_path / "ledger"))

    class CrashAfterSecondSink(ExactlyOnceSink):
        def __call__(self, batch, epoch_id):
            super().__call__(batch, epoch_id)
            if self.applied == 2:
                # crash AFTER sink+ledger commit, BEFORE Spark's offset commit:
                # Spark will replay this epoch on restart
                raise RuntimeError("crash between sink and offset commit")

    failing = CrashAfterSecondSink(ledger, append_sink)
    q = (
        changelog_stream(spark, stage, log.schema)
        .writeStream.foreachBatch(failing)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception):
        q.awaitTermination(300)
        q.processAllAvailable()

    sink2 = ExactlyOnceSink(ledger, append_sink)
    q2 = (
        changelog_stream(spark, stage, log.schema)
        .writeStream.foreachBatch(sink2)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)

    assert sink2.skipped >= 1, "replayed epoch was not deduped by the ledger"
    written = spark.read.parquet(out)
    assert written.count() == log.count()  # appended EXACTLY once
    assert written.select("scn").distinct().count() == log.select("scn").distinct().count()


def test_stream_stream_join_with_watermarks(spark, sf_dir, tmp_path):
    """Stream-stream inner join (impossible in the reference): customer
    UPSERTs joined to orders UPSERTs of the same partition arriving
    within the watermark window."""
    from databus_spark.envelope import customer_changelog

    o = orders_changelog(spark, sf_dir).select(
        "scn", "part_id", "key_str", F.col("ts").cast("timestamp").alias("ts"), "opcode"
    )
    c = customer_changelog(spark, sf_dir).select(
        F.col("scn").alias("c_scn"),
        F.col("part_id").alias("c_part_id"),
        F.col("key_str").alias("c_key"),
        F.col("ts").cast("timestamp").alias("c_ts"),
    )
    so, sc = str(tmp_path / "so"), str(tmp_path / "sc")
    stage_changelog(o, so, n_chunks=2)
    stage_changelog(c, sc, n_chunks=2, order_col="c_scn")

    left = changelog_stream(spark, so, o.schema).withWatermark("ts", "90 days")
    right = changelog_stream(spark, sc, c.schema).withWatermark("c_ts", "90 days")
    joined = left.join(
        right,
        (F.col("part_id") == F.col("c_part_id"))
        & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 365 DAYS"))
        & (F.col("c_ts") <= F.col("ts") + F.expr("INTERVAL 365 DAYS")),
        "inner",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT count(*) FROM ss_join").collect()[0][0]
    exp = o.join(
        c,
        (o["part_id"] == c["c_part_id"])
        & (c["c_ts"] >= o["ts"] - F.expr("INTERVAL 365 DAYS"))
        & (c["c_ts"] <= o["ts"] + F.expr("INTERVAL 365 DAYS")),
    ).count()
    # streaming inner join may retain everything at availableNow (no late
    # drops here: watermark generous); counts must match the batch join
    assert got == exp


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: cross-batch duplicate suppression
    with bounded state (the streaming exact-dedup operator)."""
    from datetime import datetime, timedelta

    schema = "ts timestamp, k string"
    src = str(tmp_path / "src")
    base = datetime(2024, 1, 1)
    m = timedelta(minutes=1)

    def chunk(i, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
            f"{src}/chunk={i:04d}"
        )

    chunk(1, [(base + 1 * m, "a"), (base + 2 * m, "b")])
    chunk(2, [(base + 3 * m, "a"), (base + 4 * m, "c")])  # 'a' is a dup
    chunk(3, [(base + 120 * m, "d")])

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src + "/chunk=*")
    )
    deduped = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(["k"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dd_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    ks = sorted(r["k"] for r in spark.sql("SELECT * FROM dd_out").collect())
    assert ks == ["a", "b", "c", "d"]  # second 'a' suppressed


def test_incremental_agg_view_maintenance(spark, sf_dir, tmp_path):
    """View = orders per customer, maintained incrementally: after the
    stream drains, the view equals a direct aggregation of the final
    snapshot, and each refresh touched only the batch's groups."""
    from databus_spark.store.snapshot import ParquetSnapshotStore
    from databus_spark.streaming.views import ViewMaintainingApplier

    log = orders_changelog(spark, sf_dir)
    stage = str(tmp_path / "stage")
    stage_changelog(log, stage, n_chunks=5)

    store = ParquetSnapshotStore(spark, str(tmp_path / "snap"))
    view_store = ParquetSnapshotStore(spark, str(tmp_path / "view"), key_cols=("key_str",))
    applier = ViewMaintainingApplier(
        store,
        view_store,
        group_col="o_custkey",
        agg_exprs=[
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(27,2)")).cast("double").alias("total"),
        ],
    )
    q = applier.run(changelog_stream(spark, stage, log.schema), str(tmp_path / "ck"))
    q.awaitTermination(300)

    from databus_spark.operators.compaction import snapshot as batch_snapshot_fn

    final_state = batch_snapshot_fn(log, key_cols=("source", "key_str"))
    expected = (
        final_state.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(27,2)")).cast("double").alias("total"),
        )
    )
    got = applier.view()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))
    # incrementality: every refresh touched a strict subset of all groups
    n_all_groups = expected.count()
    assert applier.groups_refreshed and all(
        g <= n_all_groups for g in applier.groups_refreshed
    )
    assert any(g < n_all_groups for g in applier.groups_refreshed)
