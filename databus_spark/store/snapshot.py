"""Versioned parquet snapshot store with MERGE (upsert) semantics.

The engine's analog of the reference's bootstrap snapshot tables
``tab_<srcid>`` maintained by ``insert ... on duplicate key update``
(reference: databus-bootstrap-producer/.../BootstrapApplierThread.java:850)
plus their log/applier separation and periodic compaction
(BootstrapDBCleaner.java).

No Delta/Iceberg jars ship in this image, so MERGE is implemented as
copy-on-write over hash-bucketed parquet with an atomic version pointer:

    root/
      _VERSION                  <- text file: current version number
      v<N>/bucket=<k>/*.parquet <- state partitioned by key-hash bucket

merge(batch) rewrites ONLY the buckets the batch touches (anti-join +
union per bucket), then commits a new version pointer — the same
copy-on-write-by-file strategy Delta's MERGE uses, at directory
granularity. On a cluster this class is swapped for a one-line
``DeltaTable.merge``; the interface is kept identical to make that a
drop-in (see ``DELTA_MERGE_SQL``).

Idempotence: merge() is last-writer-wins by (key, scn). Replaying a
micro-batch (T7/T8 at-least-once retry) converges to the same state,
which is what makes the streaming applier exactly-once end-to-end.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databus_spark.operators.compaction import latest_by_key

# What this store becomes when Delta is on the classpath (kept for parity docs):
DELTA_MERGE_SQL = """
MERGE INTO snapshot s
USING batch b ON s.key_str = b.key_str AND s.source = b.source
WHEN MATCHED AND b.scn > s.scn AND b.opcode = 'DELETE' THEN DELETE
WHEN MATCHED AND b.scn > s.scn THEN UPDATE SET *
WHEN NOT MATCHED AND b.opcode <> 'DELETE' THEN INSERT *
"""


class ParquetSnapshotStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_cols: Sequence[str] = ("source", "key_str"),
        n_buckets: int = 16,
    ) -> None:
        self.spark = spark
        self.root = root
        self.key_cols = list(key_cols)
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)

    # -- version pointer ----------------------------------------------------
    def _version(self) -> int:
        path = os.path.join(self.root, "_VERSION")
        if not os.path.exists(path):
            return 0
        with open(path) as f:
            return int(f.read().strip())

    def _commit(self, version: int) -> None:
        tmp = os.path.join(self.root, "_VERSION.tmp")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.root, "_VERSION"))

    def _data_dir(self, version: int) -> str:
        return os.path.join(self.root, f"v{version}")

    def _bucket_col(self) -> F.Column:
        return F.pmod(F.hash(*self.key_cols), F.lit(self.n_buckets)).alias("_bucket")

    # -- reads ---------------------------------------------------------------
    def read(self) -> DataFrame | None:
        """Live state: tombstones filtered out (they are retained on disk so
        that a replayed/out-of-order older batch cannot resurrect a deleted
        key — same reason Delta retains deletion vectors)."""
        v = self._version()
        if v == 0:
            return None
        df = self.spark.read.parquet(self._data_dir(v)).drop("_bucket")
        return df.where(F.col("opcode") != "DELETE")

    def read_version(self, version: int) -> DataFrame:
        """Time travel: read any retained historical version (vacuum
        bounds retention) — the Delta VERSION AS OF analog, free because
        MERGE is copy-on-write versioned."""
        path = self._data_dir(version)
        if not os.path.isdir(path):
            raise FileNotFoundError(f"version {version} not retained under {self.root}")
        df = self.spark.read.parquet(path).drop("_bucket")
        return df.where(F.col("opcode") != "DELETE")

    def versions(self) -> list[int]:
        return sorted(
            int(e[1:]) for e in os.listdir(self.root) if e.startswith("v") and e[1:].isdigit()
        )

    def lookup(self, keys: DataFrame) -> DataFrame | None:
        """Point/multi-key reads that touch ONLY the key's buckets — the
        serving path of the reference's bootstrap DB (per-key state to a
        catching-up consumer) without a full-table scan.

        The requested keys' bucket ids are computed with the SAME hash
        expression merge() buckets by, then only those _bucket=<k>
        directories are scanned; within a bucket the key predicate is
        left to parquet min/max skipping (optimize() sorts by key).
        At 16k buckets over 100 TB a lookup reads ~1/16000th of the
        table regardless of table size.
        """
        v = self._version()
        if v == 0:
            return None
        buckets = sorted(
            r["_bucket"]
            for r in keys.select(self._bucket_col()).distinct().collect()
        )
        paths = [
            p
            for b in buckets
            if os.path.isdir(p := os.path.join(self._data_dir(v), f"_bucket={b}"))
        ]
        if not paths:
            return self.spark.read.parquet(self._data_dir(v)).drop("_bucket").limit(0)
        df = (
            self.spark.read.option("basePath", self._data_dir(v))
            .parquet(*paths)
            .drop("_bucket")
        )
        return df.join(keys.select(*self.key_cols).distinct(), self.key_cols, "left_semi").where(
            F.col("opcode") != "DELETE"
        )

    # -- MERGE ----------------------------------------------------------------
    def bucket_col(self) -> F.Column:
        """The store's bucket expression — exposed so a caller can fuse
        its own per-batch statistics with the bucket probe into ONE job
        (see StreamingApplier.apply_batch) and hand `touched` to
        merge()."""
        return self._bucket_col()

    def merge(
        self,
        batch: DataFrame,
        precheckpointed: bool = False,
        touched: list[int] | None = None,
        prebucketed: bool = False,
    ) -> int:
        """Upsert a changelog batch: latest (key, scn) wins, DELETE removes.

        Only buckets containing batch keys are rewritten; untouched
        buckets are carried forward by cheap directory hard-links, so
        merge cost scales with batch keyspan, not table size.

        One shuffle per merge: intra-batch last-wins is FUSED into the
        (current ∪ batch) compaction below — max_by over the union picks
        the same winners a separate intra-batch pass would, so
        pre-compacting the batch only added a second shuffle per
        micro-batch. The batch is checkpointed eagerly so the bucket
        probe and the merged write evaluate the (streaming-source) plan
        once, not twice. ``precheckpointed=True`` tells merge the caller
        ALREADY materialized the batch (the streaming applier eager-
        checkpoints for its stats pass): re-checkpointing then would copy
        every batch a second time, and the _bucket projection re-derived
        from the caller's cached blocks is nearly free.

        ``prebucketed=True`` declares the batch already carries a
        ``_bucket`` column computed with THIS store's bucket_col() (the
        applier's fused stats+probe path). It is an explicit contract,
        not an inference: a caller whose changelog schema happens to
        carry a ``_bucket`` field — or a stale one from a different
        bucket geometry — must NOT be silently routed by it (r10 ADVICE
        #4), so without the flag merge always overwrites the column.
        """
        if prebucketed:
            if "_bucket" not in batch.columns:
                raise ValueError(
                    "merge(prebucketed=True) requires a _bucket column "
                    "computed with this store's bucket_col()"
                )
        else:
            # always (re)derive: an inherited _bucket column from another
            # schema or geometry would route rows into wrong buckets
            batch = batch.withColumn("_bucket", self._bucket_col())
        if not precheckpointed:
            batch = batch.localCheckpoint(eager=True)
        if touched is None:
            touched = sorted(
                r["_bucket"] for r in batch.select("_bucket").distinct().collect()
            )
        else:
            touched = sorted(touched)
        cur_version = self._version()
        new_version = cur_version + 1
        new_dir = self._data_dir(new_version)
        os.makedirs(new_dir, exist_ok=True)

        current = None
        if cur_version > 0:
            current = self.spark.read.parquet(self._data_dir(cur_version))

        # 1. carry forward untouched buckets without rewriting data files
        if cur_version > 0:
            for entry in os.listdir(self._data_dir(cur_version)):
                if not entry.startswith("_bucket="):
                    continue
                b = int(entry.split("=", 1)[1])
                if b not in touched:
                    self._link_tree(
                        os.path.join(self._data_dir(cur_version), entry),
                        os.path.join(new_dir, entry),
                    )

        # 2. merge the touched buckets: latest of (current ∪ batch). Tombstones
        # are KEPT (read() hides them) so replayed older upserts lose to them.
        merged = batch
        if current is not None:
            cur_touched = current.where(F.col("_bucket").isin(touched))
            cols = [c for c in batch.columns]
            merged = cur_touched.select(*cols).unionByName(batch)
        merged = latest_by_key(merged, self.key_cols + ["_bucket"])
        (
            merged.repartition(max(1, len(touched)), "_bucket")
            .write.mode("append")
            .partitionBy("_bucket")
            .parquet(new_dir)
        )
        self._commit(new_version)
        return new_version

    @staticmethod
    def _link_tree(src: str, dst: str) -> None:
        os.makedirs(dst, exist_ok=True)
        for name in os.listdir(src):
            s, d = os.path.join(src, name), os.path.join(dst, name)
            if os.path.isdir(s):
                ParquetSnapshotStore._link_tree(s, d)
            else:
                try:
                    os.link(s, d)
                except OSError:
                    shutil.copy2(s, d)

    def optimize(self, tombstone_horizon_scn: int | None = None) -> int:
        """Compaction maintenance (the Delta OPTIMIZE + tombstone-retention
        analog). Per-bucket copy-on-write already keeps ~1 file per bucket,
        so the accumulating cost here is TOMBSTONES: DELETE markers are
        retained so replayed older batches cannot resurrect keys (see
        read()). Once every consumer checkpoint has passed
        `tombstone_horizon_scn`, markers at or below it can never be
        contradicted and are purged. Returns the new version."""
        v = self._version()
        if v == 0:
            return 0
        current = self.spark.read.parquet(self._data_dir(v))
        if tombstone_horizon_scn is not None:
            current = current.where(
                ~((F.col("opcode") == "DELETE") & (F.col("scn") <= tombstone_horizon_scn))
            )
        new_version = v + 1
        (
            # sortWithinPartitions by key: parquet row-group min/max stats
            # then skip inside a bucket, so lookup() point reads prune at
            # BOTH levels (bucket dir, then row group).
            current.repartition(self.n_buckets, "_bucket")
            .sortWithinPartitions(*self.key_cols)
            .write.mode("append")
            .partitionBy("_bucket")
            .parquet(self._data_dir(new_version))
        )
        self._commit(new_version)
        return new_version

    def vacuum(self, keep_last: int = 2) -> None:
        """Drop superseded versions (the BootstrapDBCleaner analog)."""
        v = self._version()
        for entry in os.listdir(self.root):
            if entry.startswith("v") and entry[1:].isdigit():
                if int(entry[1:]) < v - keep_last + 1:
                    shutil.rmtree(os.path.join(self.root, entry), ignore_errors=True)


def prune_staged_log(stage_dir: str, retain_from_scn: int, spark: SparkSession) -> list[str]:
    """Retention cleaner for the staged change log (the BootstrapDBCleaner /
    ring-buffer-overwrite analog): drop whole chunks whose max scn is
    below the retention floor. Chunks are never split — a txn window
    lives entirely in one chunk, so pruning preserves window atomicity.
    Returns the pruned chunk dirs."""
    import glob

    pruned = []
    for chunk in sorted(glob.glob(os.path.join(stage_dir, "chunk=*"))):
        try:
            max_scn = spark.read.parquet(chunk).agg(F.max("scn")).collect()[0][0]
        except Exception:
            continue
        if max_scn is not None and max_scn < retain_from_scn:
            shutil.rmtree(chunk)
            pruned.append(chunk)
    return pruned


def _count_files(path: str) -> int:
    total = 0
    for _root, _dirs, files in os.walk(path):
        total += sum(1 for f in files if f.endswith(".parquet"))
    return total
