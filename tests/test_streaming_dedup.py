"""Streaming incremental exact dedup: first-seen-wins across batches and runs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from databus_spark.operators.dedup import documents_with_dups
from databus_spark.streaming.dedup import StreamingExactDeduper


def _stage_files(df, path: str, n: int) -> None:
    df.repartition(n).write.mode("overwrite").parquet(path)


def test_streaming_dedup_first_seen_wins(spark, sf_dir, tmp_path):
    docs = documents_with_dups(spark, sf_dir).localCheckpoint(eager=True)
    n_distinct = docs.select(F.md5("text")).distinct().count()
    assert n_distinct < docs.count(), "fixture must contain duplicates"

    stage = str(tmp_path / "stage")
    _stage_files(docs, stage, 3)

    dd = StreamingExactDeduper(
        spark, str(tmp_path / "index"), str(tmp_path / "out")
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = dd.run(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    assert dd.batches >= 2, "several micro-batches must have flowed"

    out = spark.read.parquet(str(tmp_path / "out"))
    # exactly one survivor per distinct content, nothing lost
    assert out.count() == n_distinct
    assert out.select(F.md5("text")).distinct().count() == n_distinct

    # a SECOND run over a re-staged copy of the same corpus (new files,
    # fresh checkpoint) admits nothing: the hash index persists across runs
    restage = str(tmp_path / "stage2")
    _stage_files(docs, restage, 2)
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(restage)
    )
    q2 = dd.run(stream2, str(tmp_path / "ckpt2"))
    q2.awaitTermination(300)
    assert spark.read.parquet(str(tmp_path / "out")).count() == n_distinct

    # and genuinely-new content flows through
    fresh = spark.createDataFrame(
        [(9_000_001, "a brand new never seen document", "en", "new", 31)],
        docs.schema,
    )
    stage3 = str(tmp_path / "stage3")
    _stage_files(fresh, stage3, 1)
    stream3 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage3)
    )
    q3 = dd.run(stream3, str(tmp_path / "ckpt3"))
    q3.awaitTermination(300)
    assert spark.read.parquet(str(tmp_path / "out")).count() == n_distinct + 1


def test_streaming_dedup_crash_between_emit_and_index(spark, sf_dir, tmp_path):
    """At-least-once contract: a crash AFTER the emit but BEFORE the index
    append re-emits the batch's survivors on replay (duplicates possible)
    but never loses a document — emit-before-index means no hash can be
    indexed while its document never landed."""
    import pytest
    from pyspark.sql import functions as F

    from databus_spark.operators.dedup import documents_with_dups

    docs = documents_with_dups(spark, sf_dir).limit(200).localCheckpoint(eager=True)
    n_distinct = docs.select(F.md5("text")).distinct().count()

    dd = StreamingExactDeduper(spark, str(tmp_path / "index"), str(tmp_path / "out"))

    # first delivery crashes BETWEEN the emit and the index append
    class Boom(RuntimeError):
        pass

    real_append = dd._append_index

    def crash_before_index(survivors):
        raise Boom()

    dd._append_index = crash_before_index
    with pytest.raises(Boom):
        dd.process_batch(docs)
    assert spark.read.parquet(str(tmp_path / "out")).count() == n_distinct
    import os

    assert not os.path.isdir(str(tmp_path / "index")) or not any(
        n.endswith(".parquet") for n in os.listdir(str(tmp_path / "index"))
    ), "index must not lead the emit"

    # replaying the SAME batch (source retry) re-emits already-emitted
    # survivors but the final state loses nothing
    dd._append_index = real_append
    dd.process_batch(docs)
    out = spark.read.parquet(str(tmp_path / "out"))
    hashes = out.select(F.md5("text").alias("h"))
    assert hashes.distinct().count() == n_distinct, "replay lost documents"
    # duplicates are allowed (at-least-once) but bounded by one replay
    assert out.count() == 2 * n_distinct

    # a THIRD delivery of the same content is fully absorbed by the index
    dd.process_batch(docs)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 2 * n_distinct


def test_streaming_perceptual_image_dedup(spark, tmp_path):
    """The PERCEPTUAL streaming ingest gate: media batches arrive as a
    file stream, each batch is decoded + dHashed inside foreachBatch,
    and a doc is admitted only if its perceptual hash was never seen —
    across batches. Brightness variants of an already-admitted image
    are rejected (same dHash); genuinely new groups land."""
    from pyspark.sql import functions as F

    from databus_spark.operators.multimodal import image_dhash, synth_phash_corpus
    from databus_spark.streaming.dedup import StreamingExactDeduper

    docs = spark.range(24).withColumnRenamed("id", "doc_id")
    media = synth_phash_corpus(docs)  # groups 0-5, 4 variants each
    # batch 1: variant 0 of every group; batch 2: ALL variants (the
    # brightness triples now collide with batch-1 admissions)
    stage = tmp_path / "stage"
    media.where(F.col("doc_id") % 4 == 0).coalesce(1).write.parquet(
        str(stage / "b=1")
    )
    media.coalesce(1).write.parquet(str(stage / "b=2"))

    def media_hash(batch):
        hashed = image_dhash(batch).withColumnRenamed("dhash", "content_hash")
        return batch.join(hashed, "doc_id")

    dedup = StreamingExactDeduper(
        spark,
        str(tmp_path / "idx"),
        str(tmp_path / "out"),
        id_col="doc_id",
        hash_fn=media_hash,
    )
    stream = (
        spark.readStream.schema("doc_id BIGINT, media BINARY")
        .option("recursiveFileLookup", "true")
        .parquet(str(stage))
    )
    q = dedup.run(stream, str(tmp_path / "ck"))
    q.awaitTermination(300)

    out = spark.read.parquet(str(tmp_path / "out"))
    got = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # one admission per perceptual class: v0 per group (first seen) +
    # each group's v3 edited variant (distinct hash) — never v1/v2
    assert all(d % 4 in (0, 3) for d in got), got
    base = [d for d in got if d % 4 == 0]
    assert sorted(base) == [4 * g for g in range(6)]
    # idempotence of the gate: admitted hashes are unique
    assert out.count() == out.select("doc_id").distinct().count()
