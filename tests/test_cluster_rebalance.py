"""T14: consumer-group rebalance — a member dies mid-stream, its
partitions move to a survivor WITH their checkpoints, nothing is
replayed into the stores and nothing is lost."""

from __future__ import annotations

from pyspark.sql import functions as F

from databus_spark.envelope import ORDERS_PAYLOAD, UPDATE_BASE, orders_changelog
from databus_spark.operators.compaction import snapshot as batch_snapshot
from databus_spark.operators.filters import physical_partition_filter
from databus_spark.store.snapshot import ParquetSnapshotStore
from databus_spark.streaming.applier import StreamingApplier
from databus_spark.streaming.cluster import ConsumerCluster
from databus_spark.streaming.source import changelog_stream, stage_changelog


def _rows(df, cols=("key_str", "scn", *ORDERS_PAYLOAD)):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_rebalance_on_member_death_preserves_checkpoints(spark, sf_dir, tmp_path):
    log = orders_changelog(spark, sf_dir).localCheckpoint(eager=True)
    stage = str(tmp_path / "stage")

    cluster = ConsumerCluster(n_partitions=4)
    cluster.join("m1")
    cluster.join("m2")
    a1 = cluster.assignment()
    assert sorted(p for ps in a1.values() for p in ps) == [0, 1, 2, 3]
    assert len(a1["m1"]) == len(a1["m2"]) == 2
    gen1 = cluster.generation

    # shared per-PARTITION state: store + spark checkpoint keyed by pid,
    # never by member (ClusterCheckpointPersistenceProvider analog)
    stores = {
        pid: ParquetSnapshotStore(spark, str(tmp_path / f"snap_p{pid}"))
        for pid in range(4)
    }

    def run_member(member: str, pids: list[int]) -> int:
        applied = 0
        for pid in pids:
            applier = StreamingApplier(
                stores[pid], subscription=physical_partition_filter([pid])
            )
            q = applier.run(
                changelog_stream(spark, stage, log.schema),
                str(tmp_path / f"ck_p{pid}"),
            )
            q.awaitTermination(300)
            applied += applier.rows_applied
        return applied

    # ---- phase 1: both members consume the insert wave ----
    stage_changelog(log.where(F.col("scn") < UPDATE_BASE), stage, n_chunks=3)
    n_phase1 = sum(run_member(m, pids) for m, pids in a1.items())
    assert n_phase1 == log.where(F.col("scn") < UPDATE_BASE).count()

    # ---- membership change: m2 dies; update+delete waves arrive ----
    cluster.leave("m2")
    assert cluster.generation > gen1
    a2 = cluster.assignment()
    assert list(a2) == ["m1"] and sorted(a2["m1"]) == [0, 1, 2, 3]

    # the new waves land as NEW chunks appended after phase 1's
    stage_changelog(
        log.where(F.col("scn") >= UPDATE_BASE), stage, n_chunks=3, first_chunk=4
    )
    n_phase2 = run_member("m1", a2["m1"])

    # the survivor resumed m2's partitions from their checkpoints: phase 2
    # applied exactly the new rows — no replay of phase 1, no loss
    n_new = log.where(F.col("scn") >= UPDATE_BASE).count()
    assert n_phase2 == n_new

    # final state: union of per-partition stores == oracle snapshot
    parts = [s.read() for s in stores.values() if s.read() is not None]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    expected = batch_snapshot(log, key_cols=("source", "key_str"))
    assert _rows(union) == _rows(expected)
    # ownership stayed disjoint across the move
    assert union.count() == union.dropDuplicates(["source", "key_str"]).count()
