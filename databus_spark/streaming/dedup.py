"""Streaming incremental exact dedup: first-seen-wins across micro-batches.

Batch `operators.dedup` dedups a corpus at rest; a production ingest
dedups INCREMENTALLY — every arriving document is admitted only if its
content hash has never been seen, across all prior batches and runs.
This is the standard corpus-ingest gate (the content-hash index every
crawl pipeline keeps), built on the same micro-batch machinery as the
CDC applier.

Shape per batch (all distributed, no driver state):
  1. in-batch dedup: min doc_id per content hash (map-side-combinable
     min_by — one shuffle on the uniform md5 key);
  2. cross-batch dedup: left-anti join against the persisted hash index
     (shuffle on the same key; at scale, bucket BOTH sides by hash so
     the anti-join is co-located and the index scan prunes);
  3. EMIT survivors, then append their hashes to the index.

Emit-before-index order makes a crash between the two at-least-once
(the batch replays and re-emits; nothing is ever lost to a hash that
was indexed but whose documents never landed). Replayed emissions carry
the same content hash, so any idempotent downstream (e.g. the MERGE
snapshot store, or exact dedup itself) absorbs them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamingExactDeduper:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        out_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        hash_fn=None,
    ) -> None:
        """``hash_fn`` — optional DataFrame -> DataFrame stage producing a
        ``content_hash`` column, replacing the default md5(text). This is
        how PERCEPTUAL streaming ingest composes: pass a decode->dHash
        stage (e.g. multimodal.image_dhash renamed) and arriving media
        batches are gated first-seen-wins by perceptual identity across
        all prior batches and runs — the image twin of the text gate."""
        self.spark = spark
        self.index_dir = index_dir
        self.out_dir = out_dir
        self.text_col = text_col
        self.id_col = id_col
        self.hash_fn = hash_fn
        self.batches = 0

    def _index(self) -> DataFrame | None:
        if not os.path.exists(os.path.join(self.index_dir, "_SUCCESS")) and not any(
            n.endswith(".parquet") for n in (
                os.listdir(self.index_dir) if os.path.isdir(self.index_dir) else []
            )
        ):
            return None
        return self.spark.read.parquet(self.index_dir)

    def process_batch(self, batch: DataFrame, epoch_id: int = 0) -> None:
        if self.hash_fn is not None:
            hashed = self.hash_fn(batch)
        else:
            hashed = batch.withColumn("content_hash", F.md5(F.col(self.text_col)))
        # 1. in-batch: first (min id) doc per hash, whole row carried by min_by
        other = [c for c in hashed.columns if c != "content_hash"]
        survivors = (
            hashed.groupBy("content_hash")
            .agg(F.min_by(F.struct(*other), F.col(self.id_col)).alias("r"))
            .select("content_hash", "r.*")
        )
        # 2. cross-batch: drop hashes the index has seen
        idx = self._index()
        if idx is not None:
            survivors = survivors.join(idx, "content_hash", "left_anti")
        survivors = survivors.localCheckpoint(eager=True)  # compute ONCE for both writes
        # 3. emit, THEN index (at-least-once: replay re-emits, never loses)
        survivors.drop("content_hash").write.mode("append").parquet(self.out_dir)
        self._append_index(survivors)
        self.batches += 1

    def _append_index(self, survivors: DataFrame) -> None:
        """Separate step so fault-injection tests can crash between the
        emit and the index append — the at-least-once window."""
        survivors.select("content_hash").write.mode("append").parquet(self.index_dir)

    def run(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
