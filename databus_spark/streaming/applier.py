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
        checkpoint_batches: bool = False,
    ) -> None:
        self.store = store
        self.subscription = subscription
        self.checkpoint = Checkpoint()
        self.on_checkpoint = on_checkpoint
        self.batches_applied = 0
        self.rows_applied = 0
        # True re-enables the pre-r14 eager localCheckpoint of every
        # micro-batch before the stats/merge passes. The default skips
        # it: the engine's batch sources (staged parquet chunks, rate
        # ranges) re-evaluate deterministically, and the checkpoint
        # copy was a third serialized JOB per micro-batch (~25% of the
        # ~1.2 s micro-batch budget; measured 16.9k -> 17.7k rows/s at
        # sf0.1 without it). Set True for a source whose batch plan is
        # NOT stable under re-evaluation.
        self.checkpoint_batches = checkpoint_batches

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        if self.subscription is not None:
            batch = batch.where(self.subscription)
        # bucket first so ONE job yields stats AND the store's
        # touched-bucket set: count/max-scn/bucket-probe were two
        # separate driver round-trips per micro-batch on top of the
        # MERGE — measurable against a ~1 s micro-batch budget (this
        # fusion closed the r8 >= 20k rows/s watchpoint)
        batch = batch.withColumn("_bucket", self.store.bucket_col())
        if self.checkpoint_batches:
            batch = batch.localCheckpoint(eager=True)
        rows = batch.groupBy("_bucket").agg(
            F.count(F.lit(1)).alias("_n"), F.max("scn").alias("_mx")
        ).collect()
        n = sum(r["_n"] for r in rows)
        if n == 0:
            return
        self.store.merge(
            batch,
            # "precheckpointed" to merge() means "do not checkpoint
            # again — the caller vouches the batch plan is stable for
            # a second evaluation" (a file-source micro-batch is a
            # fixed file list; re-reading it is cheaper than copying
            # every batch into block storage)
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
