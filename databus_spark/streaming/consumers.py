"""Consumer callback surface: the engine's UDF layer (SURVEY §2.11).

The reference's consumer API is lifecycle callbacks driven by the
dispatcher state machine (reference: databus-client-api/.../
DatabusStreamConsumer.java:34-140 — onStartConsumption /
onStartDataEventSequence / onStartSource / onDataEvent / onEndSource /
onEndDataEventSequence / onCheckpoint / onRollback; dispatch loop
databus-client-common/.../GenericDispatcher.java; composition:
MultiConsumerCallback.java (parallel fan-out, per-callback timeouts),
SelectingDatabusCombinedConsumer (route by source),
BatchingDatabusCombinedConsumer (micro-batching), LoggingConsumer).

Spark restatement: consumers receive micro-batch slices inside
foreachBatch. The dispatcher iterates each batch in SCN-window order
and, within a window, per source — reproducing the reference's
callback ordering exactly, but handing the consumer a DataFrame slice
(vectorized) instead of one event at a time. A consumer raising ->
the micro-batch fails -> Spark retries it: the reference's
ROLLBACK-and-replay (GenericDispatcher.java:671-950) for free.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


class Consumer:
    """Base lifecycle consumer (AbstractDatabusCombinedConsumer analog)."""

    def on_start_consumption(self) -> None: ...

    def on_start_window(self, scn: int) -> None: ...

    def on_source_events(self, source: str, events: DataFrame) -> None:
        """The onDataEvent analog — one call per (window, source), with
        the window's rows for that source (already scn-ordered)."""

    def on_end_window(self, scn: int) -> None: ...

    def on_checkpoint(self, scn: int) -> None: ...

    def on_rollback(self, scn: int) -> None: ...

    def on_stop_consumption(self) -> None: ...


class LoggingConsumer(Consumer):
    """Counts and logs (LoggingConsumer analog); also a test probe."""

    def __init__(self) -> None:
        self.calls: list[tuple[str, object]] = []
        self.rows = 0

    def on_start_consumption(self) -> None:
        self.calls.append(("start", None))

    def on_start_window(self, scn: int) -> None:
        self.calls.append(("start_window", scn))

    def on_source_events(self, source: str, events: DataFrame) -> None:
        n = events.count()
        self.rows += n
        self.calls.append(("events", (source, n)))

    def on_end_window(self, scn: int) -> None:
        self.calls.append(("end_window", scn))

    def on_checkpoint(self, scn: int) -> None:
        self.calls.append(("checkpoint", scn))


class SelectingConsumer(Consumer):
    """Routes to a delegate only for subscribed sources
    (SelectingDatabusCombinedConsumer analog)."""

    def __init__(self, delegate: Consumer, sources: Iterable[str]) -> None:
        self.delegate = delegate
        self.sources = set(sources)

    def on_start_consumption(self) -> None:
        self.delegate.on_start_consumption()

    def on_start_window(self, scn: int) -> None:
        self.delegate.on_start_window(scn)

    def on_source_events(self, source: str, events: DataFrame) -> None:
        if source in self.sources:
            self.delegate.on_source_events(source, events)

    def on_end_window(self, scn: int) -> None:
        self.delegate.on_end_window(scn)

    def on_checkpoint(self, scn: int) -> None:
        self.delegate.on_checkpoint(scn)


class BatchingConsumer(Consumer):
    """Accumulates slices and flushes every `threshold` rows
    (BatchingDatabusCombinedConsumer analog)."""

    def __init__(self, delegate: Consumer, threshold: int) -> None:
        self.delegate = delegate
        self.threshold = threshold
        self._pending: list[DataFrame] = []
        self._pending_rows = 0
        self.flushes = 0

    def on_source_events(self, source: str, events: DataFrame) -> None:
        self._pending.append(events)
        self._pending_rows += events.count()
        if self._pending_rows >= self.threshold:
            self.flush(source)

    def flush(self, source: str = "<batched>") -> None:
        if not self._pending:
            return
        union = self._pending[0]
        for df in self._pending[1:]:
            union = union.unionByName(df)
        self.delegate.on_source_events(source, union)
        self._pending, self._pending_rows = [], 0
        self.flushes += 1

    def on_checkpoint(self, scn: int) -> None:
        self.flush()
        self.delegate.on_checkpoint(scn)


class MultiConsumer(Consumer):
    """Fan-out to several consumers with per-callback timing; any failure
    propagates, failing the micro-batch -> Spark retry = ROLLBACK
    (MultiConsumerCallback semantics, minus threads: Spark already
    parallelizes the heavy lifting inside each DataFrame op)."""

    def __init__(self, consumers: list[Consumer], timeout_s: float | None = None) -> None:
        self.consumers = consumers
        self.timeout_s = timeout_s
        self.timings: list[tuple[str, float]] = []

    def _each(self, method: str, *args) -> None:
        for c in self.consumers:
            t0 = time.monotonic()
            getattr(c, method)(*args)
            dt = time.monotonic() - t0
            self.timings.append((f"{type(c).__name__}.{method}", dt))
            if self.timeout_s is not None and dt > self.timeout_s:
                raise TimeoutError(
                    f"{type(c).__name__}.{method} exceeded {self.timeout_s}s ({dt:.3f}s)"
                )

    def on_start_consumption(self) -> None:
        self._each("on_start_consumption")

    def on_start_window(self, scn: int) -> None:
        self._each("on_start_window", scn)

    def on_source_events(self, source: str, events: DataFrame) -> None:
        self._each("on_source_events", source, events)

    def on_end_window(self, scn: int) -> None:
        self._each("on_end_window", scn)

    def on_checkpoint(self, scn: int) -> None:
        self._each("on_checkpoint", scn)


class Dispatcher:
    """Drives consumers from micro-batches in SCN-window order
    (GenericDispatcher's EXPECT_EVENT_WINDOW -> ... -> checkpoint loop).

    SCALE WARNING — this is the PARITY dispatcher, not the scale path.
    It intentionally reproduces the reference's serial callback loop:
    one driver-side window list per batch, then one Spark job per SCN
    window (``batch.where(scn == X)``). That is O(windows) driver
    round-trips per batch — fine for the reference's semantics tests,
    pathological on a real cluster when batches carry thousands of
    windows. At 100x, use:

    * ``DistributedDispatcher`` — one applyInPandas job per batch,
      callbacks run inside executors, window order preserved per key;
    * ``PartitionOrderedDispatcher`` — per-partition serial order with
      executor-side callbacks (the reference's per-buffer ordering
      guarantee, distributed).

    Both are plan-tested (single Exchange; see test_consumers)."""

    def __init__(self, consumer: Consumer, checkpoint_every: int = 1) -> None:
        self.consumer = consumer
        self.checkpoint_every = checkpoint_every
        self._windows_since_ckpt = 0
        self.last_checkpoint_scn = -1
        self._started = False

    def dispatch_batch(self, batch: DataFrame, epoch_id: int = 0) -> None:
        if not self._started:
            self.consumer.on_start_consumption()
            self._started = True
        batch = batch.localCheckpoint(eager=True)
        windows = [
            (r["scn"], r["sources"])
            for r in batch.groupBy("scn")
            .agg(F.sort_array(F.collect_set("source")).alias("sources"))
            .orderBy("scn")
            .collect()
        ]
        for scn, sources in windows:
            window_df = batch.where(F.col("scn") == scn)
            self.consumer.on_start_window(scn)
            for source in sources:  # START/END_STREAM_SOURCE ordering
                self.consumer.on_source_events(
                    source, window_df.where(F.col("source") == source)
                )
            self.consumer.on_end_window(scn)
            self._windows_since_ckpt += 1
            if self._windows_since_ckpt >= self.checkpoint_every:
                self.consumer.on_checkpoint(scn)
                self.last_checkpoint_scn = scn
                self._windows_since_ckpt = 0

    def run(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.dispatch_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )


class DistributedDispatcher:
    """Executor-side per-window delivery for DataFrame-shaped consumers.

    The serial Dispatcher above preserves the reference's strict global
    callback order, but it issues one driver-side Spark job per SCN
    window — at scale a micro-batch holds thousands of windows and the
    driver becomes the dispatcher bottleneck. This variant delivers
    every (window, source) group in ONE Spark job via applyInPandas:
    the consumer callback runs on executors, each invocation receiving
    one window's rows for one source as a pandas DataFrame (scn-ordered
    within the group; the grouping key IS the window, so a window is
    never split).

    Ordering contract: windows are processed in parallel — there is no
    global cross-window callback order (use Dispatcher when the strict
    serial callback API is required). Per (window, source) atomicity and
    intra-window row order are preserved, which is what window-shaped
    aggregating/transforming consumers actually depend on.

    Reference: GenericDispatcher.java's per-window loop; this is the
    engine-native scale path for it.
    """

    def __init__(self, fn, output_ddl: str, sort_within: tuple[str, ...] = ("key_str",)):
        """fn(scn: int, source: str, events: pandas.DataFrame) -> pandas.DataFrame
        with columns matching output_ddl.

        sort_within must be a REAL intra-window order: scn/source are the
        grouping key (constant within a group) and would leave the order
        shuffle-dependent. The default key_str is unique per row within
        every envelope window, so delivery order is deterministic; pass a
        commit-sequence column instead when the callback must see rows in
        original commit order."""
        self.fn = fn
        self.output_ddl = output_ddl
        self.sort_within = sort_within
        self.windows_delivered = 0

    def dispatch_batch(self, batch: DataFrame, epoch_id: int = 0) -> DataFrame:
        fn = self.fn
        sort_cols = list(self.sort_within)

        def deliver(key, pdf):
            scn, source = key
            cols = [c for c in sort_cols if c in pdf.columns]
            if cols:
                pdf = pdf.sort_values(cols, kind="mergesort")  # stable
            return fn(int(scn), source, pdf)

        return batch.groupBy("scn", "source").applyInPandas(deliver, self.output_ddl)

    def run(self, stream: DataFrame, out_dir: str, checkpoint_dir: str):
        """Streaming form: callback outputs append to out_dir per epoch."""

        def sink(batch: DataFrame, epoch_id: int) -> None:
            out = self.dispatch_batch(batch, epoch_id)
            out.write.mode("append").parquet(out_dir)

        return (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )


class PartitionOrderedDispatcher:
    """The bounded middle between Dispatcher and DistributedDispatcher:
    STRICT SCN callback order within each physical partition, one Spark
    job per micro-batch (never one driver job per window).

    The reference's GenericDispatcher delivers a strict GLOBAL window
    order (GenericDispatcher.java:671-950) — inherently serial. At scale
    the engine relaxes exactly one thing: order is per physical
    partition, the same unit the reference's per-buffer dispatch loop
    already serializes on (one DbusEventBuffer per physical partition,
    each drained in order by its puller/dispatcher pair). Cross-partition
    interleaving was never observable to a partition-subscribed consumer.

    Execution shape: groupBy(part_id).applyInPandas — ONE shuffle, one
    task per partition; inside a task the windows of that partition are
    walked in ascending SCN order, per source, invoking the callback
    sequentially. Micro-batch boundaries batch the windows (the
    watermark: a window is delivered only once its trigger closes, and
    Structured Streaming runs epochs serially), so cross-batch order is
    also strict per partition. Per-invocation memory is bounded by one
    partition's slice of one micro-batch — size triggers accordingly
    (maxFilesPerTrigger / maxOffsetsPerTrigger), not by window count.
    """

    def __init__(
        self,
        fn,
        output_ddl: str,
        partition_col: str = "part_id",
        sort_within: tuple[str, ...] = ("key_str",),
    ):
        """fn(part_id: int, scn: int, source: str, events: pandas.DataFrame)
        -> pandas.DataFrame matching output_ddl. Called in ascending
        (scn, source) order within each partition; rows inside a call are
        ordered by sort_within (see DistributedDispatcher.sort_within for
        why the default is key_str)."""
        self.fn = fn
        self.output_ddl = output_ddl
        self.partition_col = partition_col
        self.sort_within = sort_within

    def dispatch_batch(self, batch: DataFrame, epoch_id: int = 0) -> DataFrame:
        import pandas as pd

        fn = self.fn
        sort_cols = list(self.sort_within)
        out_names = [c.strip().split()[0] for c in self.output_ddl.split(",")]

        def deliver(key, pdf):
            part = int(key[0])
            cols = [c for c in sort_cols if c in pdf.columns]
            pdf = pdf.sort_values(["scn", "source", *cols], kind="mergesort")
            outs = []
            for scn, wdf in pdf.groupby("scn", sort=True):
                for source, sdf in wdf.groupby("source", sort=True):
                    outs.append(fn(part, int(scn), source, sdf))
            if not outs:
                return pd.DataFrame(columns=out_names)
            return pd.concat(outs, ignore_index=True)

        return batch.groupBy(self.partition_col).applyInPandas(deliver, self.output_ddl)

    def run(self, stream: DataFrame, out_dir: str, checkpoint_dir: str):
        """Streaming form: callback outputs append to out_dir per epoch."""

        def sink(batch: DataFrame, epoch_id: int) -> None:
            self.dispatch_batch(batch, epoch_id).write.mode("append").parquet(out_dir)

        return (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
