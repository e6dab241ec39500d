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
        log_table,
        stage_dir: str,
        schema,
        store: ParquetSnapshotStore,
        sources: list[str],
    ) -> None:
        self.spark = spark
        # durable change log (bootstrap DB analog): a DataFrame, or a
        # zero-arg callable returning one — the callable form re-reads a
        # live log so rows staged between the snapshot and catchup phases
        # are visible to catchup (the moving-head case the protocol exists
        # for, TargetSCNRequestProcessor.java:47).
        self.log_table = log_table
        self.stage_dir = stage_dir  # relay retention window (pruned dir)
        self.schema = schema
        self.store = store
        self.sources = sources
        self.checkpoint = Checkpoint()
        self.last_catchup_rows = 0

    def _log(self) -> DataFrame:
        return self.log_table() if callable(self.log_table) else self.log_table

    # -- relay side -----------------------------------------------------------
    def retained_min_scn(self) -> int | None:
        """Smallest SCN still in the retention window (buffer minScn);
        None when the window holds nothing."""
        try:
            df = self.spark.read.schema(self.schema).parquet(self.stage_dir + "/chunk=*")
            return df.agg(F.min("scn")).collect()[0][0]
        except Exception:
            return None

    def check_availability(self, from_scn: int) -> None:
        """The relay's SCN check: streaming from a pruned SCN raises
        (ReadEventsRequestProcessor SCNNotFound path).

        A consumer at from_scn needs events strictly GREATER than
        from_scn, so from_scn == min_scn - 1 is still fully served and
        must not trigger a needless bootstrap."""
        min_scn = self.retained_min_scn()
        if min_scn is None:
            raise SCNNotFoundError(
                f"retention window {self.stage_dir} is empty: no SCN is served"
            )
        if from_scn < min_scn - 1:
            raise SCNNotFoundError(f"requested scn {from_scn} < retained min {min_scn}")

    # -- bootstrap orchestration ---------------------------------------------
    def snapshot_phase(self) -> int:
        """Phase 1: serve each source's full state at startSCN
        (StartSCNRequestProcessor + BootstrapProcessor.java:214-243).

        The bootstrap result must be REPLACEMENT state, not a blind
        merge: keys deleted between the consumer's old checkpoint and
        start_scn are absent from the snapshot, and the resumed online
        stream (scn > target) will never deliver those DELETEs again.
        So for every key the consumer's store holds that the snapshot
        lacks, a DELETE tombstone at start_scn is merged alongside."""
        ckpt = self.checkpoint
        log = self._log()
        # startSCN = max applied scn of the bootstrap DB (StartSCNRequestProcessor)
        start_scn = log.agg(F.max("scn")).collect()[0][0]

        for src in self.sources:
            state = bootstrap_state(
                log.where(F.col("source") == src),
                start_scn,
                start_scn,
                key_cols=("source", "key_str"),
            ).withColumn("opcode", F.lit("UPSERT"))
            batch = state
            existing = self.store.read()
            if existing is not None:
                stale = (
                    existing.where(F.col("source") == src)
                    .join(
                        state.select(*self.store.key_cols),
                        list(self.store.key_cols),
                        "left_anti",
                    )
                    .withColumn("opcode", F.lit("DELETE"))
                    .withColumn("scn", F.lit(start_scn).cast("long"))
                )
                batch = state.unionByName(stale)
            self.store.merge(batch)
            ckpt.advance_after_snapshot_phase(start_scn)
        return start_scn

    def catchup_phase(self, start_scn: int) -> int:
        """Phase 2: replay the log over (startSCN, targetSCN], where
        targetSCN is the CURRENT head — re-read at catchup time, so a head
        that moved during the snapshot phase yields a non-empty replay
        (TargetSCNRequestProcessor.java:47, BootstrapProcessor.java:244-273)."""
        ckpt = self.checkpoint
        log = self._log()
        head = log.agg(F.max("scn")).collect()[0][0]
        target_scn = max(head, start_scn) if head is not None else start_scn

        self.last_catchup_rows = 0
        for src in self.sources:
            catchup = log.where(
                (F.col("source") == src)
                & (F.col("scn") > start_scn)
                & (F.col("scn") <= target_scn)
            )
            n = catchup.count()
            if n > 0:
                self.store.merge(catchup)
                self.last_catchup_rows += n
            ckpt.advance_after_catchup_phase(target_scn)
        return target_scn

    def bootstrap(self, since_scn: int) -> None:
        """Snapshot + catchup phases, applied to the consumer's store."""
        ckpt = self.checkpoint
        ckpt.start_bootstrap(since_scn, self.sources)
        assert ckpt.consumption_mode == MODE_SNAPSHOT
        start_scn = self.snapshot_phase()
        assert ckpt.consumption_mode == MODE_CATCHUP
        self.catchup_phase(start_scn)
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
