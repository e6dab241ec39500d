"""Corrupt-payload handling (the DbusEventCorrupter / CRC test analog):
malformed serialized payloads must be audited and quarantined, never
silently dropped nor poisoning the batch."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_malformed_payloads_audited_and_quarantined(spark):
    rows = [
        (1, '{"a": 10, "b": "ok"}'),
        (2, '{"a": 20, "b": "ok2"}'),
        (3, '{"a": broken'),            # malformed
        (4, "not json at all"),          # malformed
        (5, None),                       # missing payload
    ]
    df = spark.createDataFrame(rows, "key LONG, payload STRING")
    # PERMISSIVE decode with an explicit corrupt-record column: malformed
    # payloads land there verbatim instead of failing or vanishing
    decoded = df.withColumn(
        "p",
        F.from_json(
            "payload",
            "a LONG, b STRING, _corrupt STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    good = decoded.where(
        F.col("payload").isNotNull() & F.col("p._corrupt").isNull()
    ).select("key", "p.a", "p.b")
    bad = decoded.where(F.col("p._corrupt").isNotNull())
    missing = decoded.where(F.col("payload").isNull())

    assert sorted(r["key"] for r in good.collect()) == [1, 2]
    assert sorted(r["key"] for r in bad.collect()) == [3, 4]
    assert [r["key"] for r in missing.collect()] == [5]
    # good rows decoded intact despite corrupt neighbors
    assert {(r["a"], r["b"]) for r in good.collect()} == {(10, "ok"), (20, "ok2")}


def test_corrupt_parquet_chunk_fails_loudly(spark, tmp_path):
    """A truncated/garbage file in the staged log raises — integrity is
    storage-level (parquet magic/checksums replace the wire CRC32)."""
    import pytest

    stage = tmp_path / "stage"
    stage.mkdir()
    spark.range(10).write.mode("overwrite").parquet(str(stage / "chunk=00001"))
    (stage / "chunk=00001" / "part-corrupt.parquet").write_bytes(b"garbage-not-parquet")
    with pytest.raises(Exception):
        spark.read.parquet(str(stage / "chunk=00001")).count()
