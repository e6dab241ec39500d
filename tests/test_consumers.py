"""Consumer callback surface: dispatch ordering, routing, batching,
fan-out, rollback-by-retry (SURVEY §2.11)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databus_spark.envelope import multi_source_changelog, orders_changelog
from databus_spark.streaming.consumers import (
    BatchingConsumer,
    Consumer,
    Dispatcher,
    LoggingConsumer,
    MultiConsumer,
    SelectingConsumer,
)
from databus_spark.streaming.source import changelog_stream, stage_changelog


def test_dispatch_ordering_and_checkpoints(spark, sf_dir):
    log = orders_changelog(spark, sf_dir).where(F.col("scn") <= 20)
    probe = LoggingConsumer()
    d = Dispatcher(probe, checkpoint_every=5)
    d.dispatch_batch(log)

    kinds = [k for k, _ in probe.calls]
    assert kinds[0] == "start"
    # windows arrive in ascending scn order
    scns = [v for k, v in probe.calls if k == "start_window"]
    assert scns == sorted(scns)
    # every window is start -> events -> end
    for i, (k, v) in enumerate(probe.calls):
        if k == "start_window":
            assert probe.calls[i + 1][0] == "events"
            assert probe.calls[i + 2][0] in ("end_window",)
    # checkpoint every 5 windows
    n_windows = len(scns)
    n_ckpts = len([1 for k, _ in probe.calls if k == "checkpoint"])
    assert n_ckpts == n_windows // 5
    assert probe.rows == log.count()


def test_selecting_consumer_routes_by_source(spark, sf_dir):
    log = multi_source_changelog(spark, sf_dir).where(
        (F.col("scn") % 100 == 0)
    )
    probe = LoggingConsumer()
    d = Dispatcher(SelectingConsumer(probe, ["customer"]))
    d.dispatch_batch(log)
    seen_sources = {src for k, (src, _) in [c for c in probe.calls if c[0] == "events"]}
    assert seen_sources == {"customer"}
    assert probe.rows == log.where(F.col("source") == "customer").count()


def test_batching_consumer_flushes_on_threshold_and_checkpoint(spark, sf_dir):
    log = orders_changelog(spark, sf_dir).where(F.col("scn") <= 30)
    inner = LoggingConsumer()
    batching = BatchingConsumer(inner, threshold=10)
    d = Dispatcher(batching, checkpoint_every=1000)  # no mid-stream ckpt
    d.dispatch_batch(log)
    batching.flush()
    assert inner.rows == log.count()
    assert batching.flushes >= 2
    # delegate saw >= threshold rows per flush except possibly the last
    flushed = [n for k, (_, n) in [c for c in inner.calls if c[0] == "events"]]
    assert all(n >= 10 for n in flushed[:-1])


def test_multi_consumer_fanout_and_failure_propagates(spark, sf_dir):
    log = orders_changelog(spark, sf_dir).where(F.col("scn") <= 10)
    a, b = LoggingConsumer(), LoggingConsumer()
    d = Dispatcher(MultiConsumer([a, b]))
    d.dispatch_batch(log)
    assert a.rows == b.rows == log.count()

    class Failing(Consumer):
        def on_source_events(self, source, events):
            raise RuntimeError("consumer error")

    d2 = Dispatcher(MultiConsumer([LoggingConsumer(), Failing()]))
    with pytest.raises(RuntimeError, match="consumer error"):
        d2.dispatch_batch(log)


def test_streaming_rollback_replay_converges(spark, sf_dir, tmp_path):
    """A consumer that fails on its first window sees the window AGAIN on
    query restart (ROLLBACK/replay, GenericDispatcher.java:671-950)."""
    log = orders_changelog(spark, sf_dir).where(F.col("scn") <= 200)
    stage = str(tmp_path / "stage")
    stage_changelog(log, stage, n_chunks=2)

    class FailOnce(LoggingConsumer):
        def __init__(self):
            super().__init__()
            self.failed = False

        def on_source_events(self, source, events):
            super().on_source_events(source, events)
            if not self.failed:
                self.failed = True
                raise RuntimeError("transient consumer failure")

    probe = FailOnce()
    d = Dispatcher(probe)
    q = d.run(changelog_stream(spark, stage, log.schema), str(tmp_path / "ck"))
    with pytest.raises(Exception):
        q.awaitTermination(300)
        q.processAllAvailable()

    # restart with the same checkpoint dir: failed batch replays
    d2 = Dispatcher(probe)
    q2 = d2.run(changelog_stream(spark, stage, log.schema), str(tmp_path / "ck"))
    q2.awaitTermination(300)
    # total delivered >= log rows (at-least-once: first window seen twice)
    assert probe.rows >= log.count()
    scns = [v for k, v in probe.calls if k == "start_window"]
    assert len(scns) > len(set(scns)) or probe.rows >= log.count()


def test_distributed_dispatcher_many_windows(spark, sf_dir):
    """VERDICT fix: per-window delivery must not be a driver job per
    window. The distributed dispatcher delivers every (window, source)
    group in ONE applyInPandas job; wall-time is sublinear in window
    count, and outputs match the declarative oracle exactly."""
    import time

    import pandas as pd

    from databus_spark.streaming.consumers import DistributedDispatcher

    log = orders_changelog(spark, sf_dir).localCheckpoint(eager=True)
    n_windows = log.select("scn").distinct().count()
    assert n_windows >= 500  # a batch holding many hundreds of windows

    def agg_fn(scn, source, pdf):
        return pd.DataFrame(
            [{
                "scn": scn,
                "source": source,
                "n_rows": len(pdf),
                "sum_price": float(pdf["o_totalprice"].sum()),
            }]
        )

    disp = DistributedDispatcher(
        agg_fn, "scn BIGINT, source STRING, n_rows BIGINT, sum_price DOUBLE"
    )

    out = disp.dispatch_batch(log).localCheckpoint(eager=True)
    assert out.count() == n_windows  # one delivery per window (single source)

    expected = log.groupBy("scn", "source").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("o_totalprice").alias("sum_price")
    )
    joined = out.alias("g").join(expected.alias("e"), ["scn", "source"])
    bad = joined.where(
        (F.col("g.n_rows") != F.col("e.n_rows"))
        | (F.abs(F.col("g.sum_price") - F.col("e.sum_price")) > 1e-6)
    )
    assert bad.count() == 0

    # scale property: the distributed path issues O(1) Spark jobs for the
    # whole batch, so its per-window cost must beat the serial
    # job-per-window Dispatcher by a wide margin (measured on a small
    # serial slice so the test stays fast)
    t0 = time.monotonic()
    disp.dispatch_batch(log).write.format("noop").mode("overwrite").save()
    t_dist = time.monotonic() - t0
    per_window_dist = t_dist / n_windows

    serial_slice = log.where(F.col("scn") % 40 == 0).localCheckpoint(eager=True)
    n_serial = serial_slice.select("scn").distinct().count()
    probe = LoggingConsumer()
    t0 = time.monotonic()
    Dispatcher(probe, checkpoint_every=10**9).dispatch_batch(serial_slice)
    per_window_serial = (time.monotonic() - t0) / n_serial

    assert per_window_dist < per_window_serial / 4, (
        f"distributed {per_window_dist*1000:.2f} ms/window over {n_windows} "
        f"windows vs serial {per_window_serial*1000:.2f} ms/window over "
        f"{n_serial} — expected a >=4x per-window advantage"
    )


def test_distributed_dispatcher_streaming_sink(spark, sf_dir, tmp_path):
    """Streaming form: callback outputs land in the sink dir, once per
    (window, source), across micro-batches."""
    import pandas as pd

    from databus_spark.streaming.consumers import DistributedDispatcher

    log = orders_changelog(spark, sf_dir)
    stage = str(tmp_path / "stage")
    stage_changelog(log, stage, n_chunks=3)

    def agg_fn(scn, source, pdf):
        return pd.DataFrame([{"scn": scn, "source": source, "n_rows": len(pdf)}])

    disp = DistributedDispatcher(agg_fn, "scn BIGINT, source STRING, n_rows BIGINT")
    stream = changelog_stream(spark, stage, log.schema)
    q = disp.run(stream, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == log.select("scn", "source").distinct().count()
    assert got.agg(F.sum("n_rows")).collect()[0][0] == log.count()


def test_partition_ordered_dispatcher_strict_scn_order(spark, sf_dir, tmp_path):
    """PartitionOrderedDispatcher: callbacks within a physical partition
    fire in strictly ascending (scn, source) order, in ONE Spark job per
    batch (no per-window driver loop). The callback carries its own
    last-seen state per invocation chain — a partition is one task, so an
    out-of-order delivery would surface in the emitted rows."""
    import pandas as pd

    from databus_spark.streaming.consumers import PartitionOrderedDispatcher

    log = multi_source_changelog(spark, sf_dir)

    state = {}  # lives in the Python worker; one partition = one task

    def probe(part, scn, source, pdf):
        last = state.get(part, (-1, ""))
        ok = (scn, source) > last
        state[part] = (scn, source)
        return pd.DataFrame(
            [{"part_id": part, "scn": scn, "source": source,
              "n_rows": len(pdf), "in_order": bool(ok)}]
        )

    disp = PartitionOrderedDispatcher(
        probe, "part_id INT, scn BIGINT, source STRING, n_rows BIGINT, in_order BOOLEAN"
    )
    out = disp.dispatch_batch(log).localCheckpoint(eager=True)

    # every (partition, window, source) delivered exactly once, in order
    assert out.where(~F.col("in_order")).count() == 0
    expected = log.select("part_id", "scn", "source").distinct().count()
    assert out.count() == expected
    assert out.agg(F.sum("n_rows")).collect()[0][0] == log.count()

    # single-job shape over a real staged input (a clean parquet scan, as
    # in production — the synthetic fixture's own build shuffles would
    # otherwise pollute the count): one grouping Exchange feeding one
    # FlatMapGroupsInPandas, not a driver-side window loop
    staged_dir = str(tmp_path / "staged")
    log.write.parquet(staged_dir)
    staged = spark.read.parquet(staged_dir)
    plan = disp.dispatch_batch(staged)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange") <= 1


def test_partition_ordered_dispatcher_streaming_epochs(spark, sf_dir, tmp_path):
    """Cross-batch: epochs run serially, so per-partition SCN order holds
    across micro-batches too (each epoch appends its deliveries)."""
    import pandas as pd

    from databus_spark.streaming.consumers import PartitionOrderedDispatcher

    log = orders_changelog(spark, sf_dir)
    stage = str(tmp_path / "stage")
    stage_changelog(log, stage, n_chunks=3)

    def agg_fn(part, scn, source, pdf):
        return pd.DataFrame(
            [{"part_id": part, "scn": scn, "source": source, "n_rows": len(pdf)}]
        )

    disp = PartitionOrderedDispatcher(
        agg_fn, "part_id INT, scn BIGINT, source STRING, n_rows BIGINT"
    )
    stream = changelog_stream(spark, stage, log.schema)
    q = disp.run(stream, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == log.select("part_id", "scn", "source").distinct().count()
    assert got.agg(F.sum("n_rows")).collect()[0][0] == log.count()
