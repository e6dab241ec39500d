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


def test_second_source_shape_roundtrips(spark, tmp_path):
    """The trail record schema is spec-driven (ggParser StateMachine
    generality): a customer-shaped source with a string key and three
    typed columns writes and parses through the same writer/reader."""
    from databus_spark.sources.trail import TrailColumn, TrailWriter, read_trail

    spec = (
        TrailColumn("name", "key_str", "STRING"),
        TrailColumn("balance", "balance", "DOUBLE"),
        TrailColumn("segment", "segment", "STRING"),
    )
    trail = str(tmp_path / "trail2")
    w = TrailWriter(trail, max_bytes=256, spec=spec)
    want = []
    for scn in range(1, 21):
        ops = [("I", f"Customer#{scn:03d}", scn * 10.5, "BUILDING")]
        if scn % 4 == 0:
            ops.append(("U", f"Customer#{scn:03d}", scn * 10.5 + 1, "MACHINERY"))
        w.append_txn(scn, ops)
        for t, n, b, s in ops:
            want.append((scn, t, n, b, s))

    got = read_trail(spark, trail, spec=spec)
    assert got.columns == ["txn_scn", "op_type", "key_str", "balance", "segment"]
    rows = sorted(tuple(r) for r in got.collect())
    assert rows == sorted(want)

    # seek still works on the second shape: files below the position pruned
    resumed = read_trail(spark, trail, from_scn=15, spec=spec)
    assert sorted(r["txn_scn"] for r in resumed.select("txn_scn").distinct().collect()) == list(range(16, 21))


def test_default_shape_unchanged(spark, tmp_path):
    """Back-compat: the original (key, price) shape still parses with the
    default spec and original column names."""
    from databus_spark.sources.trail import TrailWriter, read_trail

    trail = str(tmp_path / "trail1")
    w = TrailWriter(trail)
    w.append_txn(5, [("I", 1, 2.5), ("I", 2, 3.5)])
    got = read_trail(spark, trail)
    assert got.columns == ["txn_scn", "op_type", "key_num", "price"]
    assert got.count() == 2


def test_trail_health_counts_corrupt_lines(spark, tmp_path):
    """from_xml silently NULLs malformed trail records; trail_health
    makes the drop observable."""
    import os

    from databus_spark.sources.trail import TrailWriter, read_trail, trail_health

    trail = str(tmp_path / "trail")
    w = TrailWriter(trail)
    w.append_txn(1, [("I", 1, 1.0)])
    w.append_txn(2, [("I", 2, 2.0)])

    healthy = trail_health(spark, trail).collect()[0]
    assert (healthy["n_lines"], healthy["n_parsed"], healthy["n_corrupt"]) == (2, 2, 0)

    fname = sorted(os.listdir(trail))[0]
    with open(os.path.join(trail, fname), "a") as f:
        f.write("<tx scn=oops NOT-XML</t\n")

    sick = trail_health(spark, trail).collect()[0]
    assert (sick["n_lines"], sick["n_parsed"], sick["n_corrupt"]) == (3, 2, 1)
    # the hot path still parses the good lines
    assert read_trail(spark, trail).count() == 2
