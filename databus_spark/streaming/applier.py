"""Streaming snapshot applier: the relay->consumer->applier pipeline.

foreachBatch MERGE with transaction-atomic windows — the Spark
restatement of the reference's dispatcher + bootstrap applier
(reference: databus-client-common/.../GenericDispatcher.java state
machine; BootstrapApplierThread.java:242-305,850):

* each micro-batch is grouped into whole SCN windows (a txn is never
  half-applied: the source stages whole windows per file, and the MERGE
  applies per-key latest of the full batch atomically via the store's
  version-pointer commit — T13/custom #1 in SURVEY §4),
* the MERGE is idempotent (last-(key,scn)-wins), so Spark's micro-batch
  retry after failure (T7 rollback/replay) converges — at-least-once
  delivery + idempotent sink = exactly-once state,
* an app-level Checkpoint advances per batch (onCheckpoint analog) and
  a subscription filter runs BEFORE the sink (server-side filtering,
  DbusEventBuffer.java:2536).
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from databus_spark.store.snapshot import ParquetSnapshotStore
from databus_spark.streaming.checkpoint import Checkpoint


class StreamingApplier:
    """Applies an envelope stream to a snapshot store, batch by batch."""

    def __init__(
        self,
        store: ParquetSnapshotStore,
        subscription: Column | None = None,
        on_checkpoint: Callable[[Checkpoint], None] | None = None,
    ) -> None:
        self.store = store
        self.subscription = subscription
        self.checkpoint = Checkpoint()
        self.on_checkpoint = on_checkpoint
        self.batches_applied = 0
        self.rows_applied = 0

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        if self.subscription is not None:
            batch = batch.where(self.subscription)
        # bucket BEFORE the checkpoint so ONE job yields stats AND the
        # store's touched-bucket set: count/max-scn/bucket-probe were
        # two separate driver round-trips per micro-batch on top of the
        # MERGE — measurable against a ~1 s micro-batch budget (this
        # fusion closed the r8 >= 20k rows/s watchpoint)
        batch = batch.withColumn("_bucket", self.store.bucket_col())
        batch = batch.localCheckpoint(eager=True)  # stabilize for two passes
        rows = batch.groupBy("_bucket").agg(
            F.count(F.lit(1)).alias("_n"), F.max("scn").alias("_mx")
        ).collect()
        n = sum(r["_n"] for r in rows)
        if n == 0:
            return
        self.store.merge(
            batch,
            precheckpointed=True,
            touched=[r["_bucket"] for r in rows],
            prebucketed=True,  # _bucket above IS store.bucket_col() — explicit contract
            batch_rows=n,  # fused-stats count: lets merge pick the broadcast path
        )
        self.checkpoint.on_window_end(
            max(int(r["_mx"]) for r in rows), time.time_ns()
        )
        self.batches_applied += 1
        self.rows_applied += n
        if self.on_checkpoint:
            self.on_checkpoint(self.checkpoint)

    def run(self, stream: DataFrame, checkpoint_dir: str, once: bool = True):
        """Start the streaming query (availableNow drains the staged log)."""
        writer = (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if once:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
        return q
