"""Golden end-to-end flow (SURVEY §5 'implication for the rebuild'):
ingest -> filter -> serve -> bootstrap -> resume, all composed.

One test drives the entire engine the way a reference user would:
  1. incremental puller drains a source table into a staged log
  2. a subscribed consumer group (per-partition appliers) streams it
     into snapshot stores with metrics collection
  3. the union of per-partition stores equals the direct oracle snapshot
  4. a late consumer whose SCN fell off bootstraps and converges
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databus_spark.envelope import ORDERS_PAYLOAD, orders_changelog
from databus_spark.operators.compaction import snapshot as batch_snapshot
from databus_spark.operators.filters import physical_partition_filter
from databus_spark.sources.incremental import FileMaxSCNHandler, IncrementalPuller
from databus_spark.store.snapshot import ParquetSnapshotStore
from databus_spark.streaming.applier import StreamingApplier
from databus_spark.streaming.controller import BootstrapController
from databus_spark.streaming.metrics import EngineMetricsListener
from databus_spark.streaming.source import changelog_stream, stage_changelog


def _rows(df, cols=("key_str", "scn", *ORDERS_PAYLOAD)):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_golden_flow_end_to_end(spark, sf_dir, tmp_path):
    source_table = orders_changelog(spark, sf_dir).localCheckpoint(eager=True)

    # -- 1. ingest: puller drains the source into the staged log (relay) --
    staged_batches = []
    puller = IncrementalPuller(
        lambda: source_table,
        FileMaxSCNHandler(str(tmp_path / "scn.json")),
        max_scn_per_poll=1_000_000_000,
    )
    stage = str(tmp_path / "stage")

    def to_stage(batch):
        staged_batches.append(batch.count())
        batch.write.mode("append").parquet(stage + f"/chunk={len(staged_batches):05d}")

    cycles = puller.drain(to_stage)
    assert cycles >= 3

    # -- 2. consumer group: one applier per physical partition ------------
    listener = EngineMetricsListener()
    spark.streams.addListener(listener)
    stores = {}
    try:
        for pid in range(4):
            store = ParquetSnapshotStore(spark, str(tmp_path / f"snap_p{pid}"))
            applier = StreamingApplier(store, subscription=physical_partition_filter([pid]))
            q = applier.run(
                changelog_stream(spark, stage, source_table.schema),
                str(tmp_path / f"ck_p{pid}"),
            )
            q.awaitTermination(300)
            stores[pid] = store
    finally:
        spark.streams.removeListener(listener)

    # -- 3. union of partition stores == oracle snapshot ------------------
    parts = [s.read() for s in stores.values() if s.read() is not None]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    expected = batch_snapshot(source_table, key_cols=("source", "key_str"))
    assert _rows(union) == _rows(expected)
    # partition disjointness: no key appears in two stores
    assert union.count() == union.dropDuplicates(["source", "key_str"]).count()
    # metrics saw the streamed rows
    assert sum(b.num_input_rows for b in listener.batches) >= source_table.count()

    # -- 4. late consumer fell off -> bootstrap -> converge ----------------
    import shutil

    shutil.rmtree(stage + "/chunk=00001")
    late_store = ParquetSnapshotStore(spark, str(tmp_path / "late_snap"))
    ctl = BootstrapController(
        spark, source_table, stage, source_table.schema, late_store, sources=["orders"]
    )
    ctl.consume_from(0, str(tmp_path / "late_ck"))
    assert ctl.checkpoint.consumption_mode == "ONLINE_CONSUMPTION"
    assert _rows(late_store.read().where(F.col("opcode") != "DELETE")) == _rows(expected)
