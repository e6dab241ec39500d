"""Bootstrap handoff controller: fell-off detection -> snapshot ->
catchup -> resume online.

The reference's flow (SURVEY §3.3): a consumer pulls from the relay;
when its checkpoint SCN has been overwritten in the ring buffer the
relay answers SCNNotFound and the client switches to bootstrap —
snapshot phase, then log catchup to targetSCN, then back online
(reference: databus-client-http/.../RelayPullThread.java:104-124,251
SCNNotFound -> BOOTSTRAP; BootstrapPullThread.java; server side
StartSCNRequestProcessor.java:51, TargetSCNRequestProcessor.java:47,
BootstrapProcessor.java:214-273; phase transitions
core/BootstrapCheckpointHandler.java:90-276).

Spark restatement (custom driver-side orchestration — SURVEY §4 lists
this as one of the few pieces Catalyst cannot provide):

  relay retention window  = the staged changelog dir, where old chunks
                            get pruned (OVERWRITE_ON_WRITE ring analog)
  bootstrap snapshot      = batch read of the log-table compaction at
                            start_scn (the applier-maintained state)
  catchup                 = batch read of the log over (start, target]
  resume online           = stream the staged dir filtered to
                            scn > target with a fresh checkpoint

The controller owns an app-level Checkpoint and drives its mode machine
exactly as BootstrapCheckpointHandler does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databus_spark.operators.bootstrap import bootstrap_state
from databus_spark.store.snapshot import ParquetSnapshotStore
from databus_spark.streaming.applier import StreamingApplier
from databus_spark.streaming.checkpoint import (
    MODE_CATCHUP,
    MODE_ONLINE,
    MODE_SNAPSHOT,
    Checkpoint,
)
from databus_spark.streaming.source import changelog_stream


class SCNNotFoundError(Exception):
    """Consumer checkpoint SCN no longer in the retention window."""


class BootstrapController:
    def __init__(
        self,
        spark: SparkSession,
        log_table: DataFrame,
        stage_dir: str,
        schema,
        store: ParquetSnapshotStore,
        sources: list[str],
    ) -> None:
        self.spark = spark
        self.log_table = log_table  # durable change log (bootstrap DB analog)
        self.stage_dir = stage_dir  # relay retention window (pruned dir)
        self.schema = schema
        self.store = store
        self.sources = sources
        self.checkpoint = Checkpoint()

    # -- relay side -----------------------------------------------------------
    def retained_min_scn(self) -> int:
        """Smallest SCN still in the retention window (buffer minScn)."""
        df = self.spark.read.schema(self.schema).parquet(self.stage_dir + "/chunk=*")
        return df.agg(F.min("scn")).collect()[0][0]

    def check_availability(self, from_scn: int) -> None:
        """The relay's SCN check: streaming from a pruned SCN raises
        (ReadEventsRequestProcessor SCNNotFound path)."""
        min_scn = self.retained_min_scn()
        if from_scn < min_scn:
            raise SCNNotFoundError(f"requested scn {from_scn} < retained min {min_scn}")

    # -- bootstrap orchestration ---------------------------------------------
    def bootstrap(self, since_scn: int) -> None:
        """Snapshot + catchup phases, applied to the consumer's store."""
        ckpt = self.checkpoint
        ckpt.start_bootstrap(since_scn, self.sources)
        assert ckpt.consumption_mode == MODE_SNAPSHOT

        # startSCN = max applied scn of the bootstrap DB (StartSCNRequestProcessor)
        start_scn = self.log_table.agg(F.max("scn")).collect()[0][0]
        # targetSCN = current head of the online stream (TargetSCNRequestProcessor)
        target_scn = start_scn

        for src in self.sources:
            # snapshot phase for this source: full state at start_scn
            state = bootstrap_state(
                self.log_table.where(F.col("source") == src),
                start_scn,
                target_scn,
                key_cols=("source", "key_str"),
            )
            self.store.merge(state.withColumn("opcode", F.lit("UPSERT")))
            ckpt.advance_after_snapshot_phase(start_scn)
        assert ckpt.consumption_mode == MODE_CATCHUP

        for src in self.sources:
            # catchup: replay any log rows past start (none here since
            # start == target; the range read keeps the exact protocol shape)
            catchup = self.log_table.where(
                (F.col("source") == src)
                & (F.col("scn") > start_scn)
                & (F.col("scn") <= target_scn)
            )
            if catchup.limit(1).count() > 0:
                self.store.merge(catchup)
            ckpt.advance_after_catchup_phase(target_scn)
        assert ckpt.consumption_mode == MODE_ONLINE

    # -- consumer entry point -------------------------------------------------
    def consume_from(self, from_scn: int, checkpoint_dir: str) -> StreamingApplier:
        """Resume consumption at from_scn; bootstraps first if the relay
        no longer retains it (the RelayPullThread error edge)."""
        try:
            self.check_availability(from_scn)
        except SCNNotFoundError:
            self.bootstrap(from_scn)
            from_scn = self.checkpoint.windowScn

        applier = StreamingApplier(self.store, subscription=F.col("scn") > from_scn)
        applier.checkpoint = self.checkpoint
        stream = changelog_stream(self.spark, self.stage_dir, self.schema)
        q = applier.run(stream, checkpoint_dir)
        q.awaitTermination(600)
        return applier
