"""Avro Object Container File source: spec round-trips, codecs, schema
resolution, torn-file detection, distributed read."""

from __future__ import annotations

import json

import pytest

from databus_spark.sources.avro_ocf import (
    read_ocf_bytes,
    read_ocf_file,
    write_ocf,
)

SCHEMA = {
    "type": "record",
    "name": "txn",
    "fields": [
        {"name": "scn", "type": "long"},
        {"name": "key_str", "type": "string"},
        {"name": "amount", "type": "double"},
        {"name": "note", "type": ["null", "string"], "default": None},
    ],
}

RECS = [
    {"scn": 1, "key_str": "a", "amount": 1.5, "note": None},
    {"scn": 2, "key_str": "b", "amount": -2.25, "note": "x"},
    {"scn": 3, "key_str": "", "amount": 0.0, "note": None},
] * 7  # spans blocks at records_per_block=5


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip(tmp_path, codec):
    p = str(tmp_path / f"t_{codec}.avro")
    n_blocks = write_ocf(p, RECS, SCHEMA, codec=codec, records_per_block=5)
    assert n_blocks == (len(RECS) + 4) // 5
    assert list(read_ocf_file(p)) == RECS


def test_ocf_deterministic_bytes(tmp_path):
    a, b = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    write_ocf(a, RECS, SCHEMA, records_per_block=5)
    write_ocf(b, RECS, SCHEMA, records_per_block=5)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_ocf_reader_schema_resolution(tmp_path):
    p = str(tmp_path / "t.avro")
    write_ocf(p, RECS[:2], SCHEMA)
    reader = {
        "type": "record",
        "name": "txn",
        "fields": [
            {"name": "scn", "type": "double"},           # long -> double promotion
            {"name": "key_str", "type": "string"},
            {"name": "added", "type": "string", "default": "d"},  # reader-only
            # 'amount'/'note' are writer-only: decoded and dropped
        ],
    }
    got = list(read_ocf_file(p, reader_schema=reader))
    assert got == [
        {"scn": 1.0, "key_str": "a", "added": "d"},
        {"scn": 2.0, "key_str": "b", "added": "d"},
    ]


def test_ocf_torn_file_detected(tmp_path):
    p = str(tmp_path / "t.avro")
    write_ocf(p, RECS, SCHEMA, records_per_block=5)
    buf = bytearray(open(p, "rb").read())
    buf[-3] ^= 0xFF  # corrupt inside the final sync marker
    with pytest.raises(ValueError, match="sync marker"):
        list(read_ocf_bytes(bytes(buf)))
    with pytest.raises(ValueError, match="magic"):
        list(read_ocf_bytes(b"nope" + bytes(buf)))


def test_ocf_distributed_read(spark, tmp_path):
    from databus_spark.sources.avro_ocf import read_ocf

    for i in range(3):  # three files -> three parallel decode tasks
        write_ocf(
            str(tmp_path / f"part{i}.avro"),
            [{"scn": i * 100 + j, "key_str": f"k{j}", "amount": j / 2, "note": None}
             for j in range(50)],
            SCHEMA,
            codec="deflate" if i % 2 else "null",
            records_per_block=7,
        )
    df = read_ocf(
        spark,
        str(tmp_path / "*.avro"),
        "scn BIGINT, key_str STRING, amount DOUBLE, note STRING",
    )
    rows = df.collect()
    assert len(rows) == 150
    assert {r["scn"] for r in rows} == {i * 100 + j for i in range(3) for j in range(50)}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_ocf_sync_split_scan_exactly_once(spark, tmp_path):
    """Byte-range splits partition the records exactly once for ANY split
    size — including splits landing mid-block, mid-sync, and mid-header —
    matching the whole-file read."""
    from databus_spark.sources.avro_ocf import iter_ocf_split, read_ocf_splits

    p = str(tmp_path / "big.avro")
    recs = [
        {"scn": i, "key_str": f"key_{i:06d}", "amount": i * 0.25, "note": None}
        for i in range(2000)
    ]
    write_ocf(p, recs, SCHEMA, codec="deflate", records_per_block=64)

    import os

    size = os.path.getsize(p)
    for split_bytes in (977, 4096, size // 3, size * 2):
        got = []
        for off in range(0, size, split_bytes):
            got.extend(
                r["scn"] for r in iter_ocf_split(p, off, min(off + split_bytes, size))
            )
        assert sorted(got) == list(range(2000)), f"split_bytes={split_bytes}"

    df = read_ocf_splits(
        spark, p, "scn BIGINT, key_str STRING, amount DOUBLE, note STRING",
        split_bytes=977,
    )
    assert sorted(r["scn"] for r in df.collect()) == list(range(2000))
    assert size // 977 > 4  # the distributed read really had many splits


def test_ocf_split_frame_is_local_relation(spark, tmp_path):
    """The split-descriptor frame must plan as a pure-JVM LocalTableScan,
    never a pickled-Python parallelize: the latter materializes as
    defaultParallelism near-empty tasks each spinning a non-Arrow Python
    worker (r14 measurement: ~1.3 s of spin-up per task, 2.5 s -> 1.4 s
    on the read leg after the VALUES rewrite). Quote/backslash paths
    must survive the SQL literal escaping."""
    from databus_spark.sources.avro_ocf import read_ocf_splits, write_ocf as _w

    p = str(tmp_path / "o'dd path.avro")
    _w(p, [{"scn": 1, "key_str": "k", "amount": 0.5, "note": None}], SCHEMA)
    df = read_ocf_splits(
        spark, p, "scn BIGINT, key_str STRING, amount DOUBLE, note STRING"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan, plan[:800]
    assert "LocalTableScan" in plan, plan[:800]
    assert [r["scn"] for r in df.collect()] == [1]
