"""Streaming metrics listener (A2-A5 live path)."""

from __future__ import annotations

from databus_spark.streaming.metrics import EngineMetricsListener


def test_listener_collects_batches_and_summarizes(spark, sf_dir, tmp_path):
    from databus_spark.envelope import orders_changelog
    from databus_spark.streaming.source import changelog_stream, stage_changelog

    listener = EngineMetricsListener()
    spark.streams.addListener(listener)
    try:
        log = orders_changelog(spark, sf_dir).select("scn", "opcode", "key_str")
        stage = str(tmp_path / "stage")
        stage_changelog(log, stage, n_chunks=3)
        q = (
            changelog_stream(spark, stage, log.schema)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        import time

        deadline = time.time() + 30
        while time.time() < deadline and len(listener.batches) < 3:
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    assert len(listener.started) >= 1
    data_batches = [b for b in listener.batches if b.num_input_rows > 0]
    assert len(data_batches) >= 3
    assert sum(b.num_input_rows for b in data_batches) == log.count()

    summary = listener.summary(spark).collect()[0]
    assert summary["total_rows"] >= log.count()
    assert summary["p50_ms"] > 0
    assert summary["p99_ms"] >= summary["p50_ms"]
