"""S6/S7: rotating XML trail files — position seek, file-pruned batch
read, streaming tail across a rotation boundary."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from databus_spark.sources.trail import (
    TrailPositionSetter,
    TrailWriter,
    read_trail,
    tail_trail_stream,
    trail_files,
)


def _write_trail(trail_dir: str, scns, max_bytes=600):
    w = TrailWriter(trail_dir, max_bytes=max_bytes)
    for scn in scns:
        w.append_txn(scn, [("I", scn * 10 + j, float(scn) + j / 10) for j in range(2)])
    return w


def test_position_setter_locates_file_line_offset(tmp_path):
    trail = str(tmp_path / "trail")
    _write_trail(trail, range(1, 101))  # small max_bytes -> many rotations
    files = trail_files(trail)
    assert len(files) >= 5  # rotation actually happened

    setter = TrailPositionSetter(trail)
    pos = setter.locate(37)
    assert pos.scn == 38
    # the byte offset is exact: seeking there reads the scn-38 record
    with open(os.path.join(trail, pos.file), "rb") as f:
        f.seek(pos.byte_offset)
        line = f.readline().decode()
    assert 'scn="38"' in line

    # file bracketing pruned earlier files
    kept = setter.files_from(37)
    assert kept[0] == pos.file and len(kept) < len(files)

    # edges: before the first scn and past the last
    assert setter.locate(0).scn == 1
    assert setter.locate(100).scn == -1  # fully consumed


def test_batch_read_prunes_files_and_matches(spark, tmp_path):
    trail = str(tmp_path / "trail")
    _write_trail(trail, range(1, 101))
    n_files = len(trail_files(trail))

    got = read_trail(spark, trail, from_scn=80)
    rows = got.collect()
    assert sorted({r["txn_scn"] for r in rows}) == list(range(81, 101))
    assert all(r["price"] is not None for r in rows)

    # the seek is a FILE prune, not just a filter: strictly fewer files open
    opened = (
        read_trail(spark, trail, from_scn=80)
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert 0 < opened < n_files

    # full read parses every op
    assert read_trail(spark, trail).count() == 100 * 2


def test_stream_tails_across_rotation(spark, tmp_path):
    """Rotation mid-stream: drain, rotate + append, resume the same
    checkpoint — exactly-once union, nothing lost at the boundary."""
    trail = str(tmp_path / "trail")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    w = _write_trail(trail, range(1, 51), max_bytes=2000)

    def drain():
        q = (
            tail_trail_stream(spark, trail)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()
    n1 = spark.read.parquet(out).count()
    assert n1 == 50 * 2

    # rotate explicitly, then append the next scns into the new file
    w.rotate()
    for scn in range(51, 81):
        w.append_txn(scn, [("I", scn * 10 + j, float(scn) + j / 10) for j in range(2)])
    drain()

    got = spark.read.parquet(out)
    assert got.count() == 80 * 2  # no dupes, no gaps across the rotation
    assert got.select("txn_scn").distinct().count() == 80
