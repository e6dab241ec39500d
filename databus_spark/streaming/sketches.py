"""Streaming sketch maintenance: mergeable HLL / Count-Min state kept
current across micro-batches.

The reference's stats collectors are MERGEABLE JMX beans — partial
collectors merge up the aggregation tree (reference:
databus-core-impl/.../core/monitoring/mbean/AggregatedDbusEventsTotalStats.java).
The batch sketches in operators/stats.py have the same algebra
(register-wise max for HLL, counter addition for Count-Min), which is
exactly what makes them streamable: per micro-batch, sketch the batch,
merge with the persisted state, commit. No per-key state store, no
watermark bookkeeping — the state is O(m) per group FOREVER, however
many keys the stream carries.

Persistence follows the snapshot store's crash contract: versioned
directories + an atomically-replaced ``_VERSION`` pointer, so a crash
mid-commit leaves the previous state readable and the batch replays
(merges are idempotent for HLL's max; for Count-Min the applier's
at-least-once replay can double-add a batch, so the committed version
records the last batch_id and replays of it are skipped).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamingDistinctCounter:
    """Per-group distinct-key estimate maintained across micro-batches
    via HLL register max-merge. Use as a foreachBatch sink:

        q = (stream.writeStream.foreachBatch(counter.process_batch)
             .start())
        ...
        counter.estimates()   # (grp, n_hll) at any commit point
    """

    def __init__(self, spark: SparkSession, root: str, key_col: str, group_col: str):
        self.spark, self.root = spark, root
        self.key_col, self.group_col = key_col, group_col
        os.makedirs(root, exist_ok=True)

    # -- version plumbing (snapshot-store contract) -------------------------
    def _version(self) -> int:
        p = os.path.join(self.root, "_VERSION")
        return int(open(p).read().split(":")[0]) if os.path.exists(p) else 0

    def _last_batch(self) -> int:
        p = os.path.join(self.root, "_VERSION")
        if not os.path.exists(p):
            return -1
        parts = open(p).read().split(":")
        return int(parts[1]) if len(parts) > 1 else -1

    def _commit(self, v: int, batch_id: int) -> None:
        tmp = os.path.join(self.root, "_VERSION.tmp")
        with open(tmp, "w") as f:
            f.write(f"{v}:{batch_id}")
        os.replace(tmp, os.path.join(self.root, "_VERSION"))

    def registers(self) -> DataFrame | None:
        v = self._version()
        if v == 0:
            return None
        return self.spark.read.parquet(os.path.join(self.root, f"v{v}"))

    # -- the foreachBatch hook ----------------------------------------------
    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Sketch the batch, max-merge with persisted registers, commit
        the next version. Replay-safe WITHOUT a batch-id check: max is
        idempotent, so re-merging a replayed batch changes nothing."""
        from databus_spark.operators.stats import hll_registers

        fresh = hll_registers(batch, self.key_col, self.group_col)
        prev = self.registers()
        merged = (
            fresh
            if prev is None
            else fresh.unionByName(prev).groupBy("grp", "b").agg(F.max("r").alias("r"))
        )
        v = self._version() + 1
        merged.write.mode("overwrite").parquet(os.path.join(self.root, f"v{v}"))
        self._commit(v, batch_id)

    def estimates(self) -> DataFrame:
        from databus_spark.operators.stats import hll_estimate

        regs = self.registers()
        if regs is None:
            return self.spark.createDataFrame([], "grp STRING, n_hll DOUBLE")
        return hll_estimate(regs)

    def vacuum(self, keep_last: int = 2) -> None:
        """Drop register versions older than the last keep_last."""
        v = self._version()
        for name in os.listdir(self.root):
            if name.startswith("v") and name[1:].isdigit():
                if int(name[1:]) <= v - keep_last:
                    shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)


class StreamingFrequencySketch:
    """Per-key frequency estimates maintained across micro-batches via
    Count-Min counter ADDITION. Addition is NOT idempotent, so the
    committed ``_VERSION`` records the last merged batch_id and an
    at-least-once replay of the same batch is skipped rather than
    double-added."""

    def __init__(self, spark: SparkSession, root: str, key_col: str):
        self.spark, self.root, self.key_col = spark, root, key_col
        os.makedirs(root, exist_ok=True)

    _version = StreamingDistinctCounter._version
    _last_batch = StreamingDistinctCounter._last_batch
    _commit = StreamingDistinctCounter._commit
    vacuum = StreamingDistinctCounter.vacuum

    def sketch(self) -> DataFrame | None:
        v = self._version()
        if v == 0:
            return None
        return self.spark.read.parquet(os.path.join(self.root, f"v{v}"))

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from databus_spark.operators.stats import cm_sketch

        if batch_id <= self._last_batch():
            return  # replay of an already-merged batch: adding twice would overcount
        fresh = cm_sketch(batch, self.key_col)
        prev = self.sketch()
        merged = (
            fresh
            if prev is None
            else fresh.unionByName(prev).groupBy("s", "pos").agg(F.sum("c").alias("c"))
        )
        v = self._version() + 1
        merged.write.mode("overwrite").parquet(os.path.join(self.root, f"v{v}"))
        self._commit(v, batch_id)

    def estimate(self, keys: DataFrame) -> DataFrame:
        from databus_spark.operators.stats import cm_estimate

        sk = self.sketch()
        if sk is None:
            return keys.select(self.key_col).withColumn("n_cm", F.lit(0).cast("long"))
        return cm_estimate(keys, sk, self.key_col)
