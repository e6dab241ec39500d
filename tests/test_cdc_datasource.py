"""S4: custom Python streaming DataSource for CDC — per-partition
(part_id, scn) offsets, exactly-once resume, oracle-equal drained state."""

from __future__ import annotations

from pyspark.sql import functions as F

from databus_spark.envelope import ORDERS_PAYLOAD, UPDATE_BASE, orders_changelog
from databus_spark.operators.compaction import snapshot as batch_snapshot
from databus_spark.sources.cdc_datasource import (
    CDC_SCHEMA_DDL,
    changelog_to_binlog,
    register,
)
from databus_spark.store.snapshot import ParquetSnapshotStore

ORDERS_PAYLOAD_DDL = (
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
    "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING"
)


def _decode(df):
    """Drained CDC rows -> typed envelope (payload JSON -> columns)."""
    return df.select(
        "scn",
        F.col("ts").cast("date").alias("ts"),
        "opcode",
        "source",
        "source_id",
        "part_id",
        "key_num",
        "key_str",
        "txn_end",
        F.from_json("payload", ORDERS_PAYLOAD_DDL).alias("p"),
    ).select("scn", "ts", "opcode", "source", "source_id", "part_id", "key_num",
             "key_str", "txn_end", "p.*")


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_cdc_stream_resume_exactly_once(spark, sf_dir, tmp_path):
    """Restart from checkpoint replays nothing and misses nothing: drain
    the insert wave, stop; append update+delete waves (with a file
    rotation); resume the SAME checkpoint; the union is exactly the log."""
    log = orders_changelog(spark, sf_dir).localCheckpoint(eager=True)
    trail = str(tmp_path / "trail")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    register(spark)

    n_txn1 = changelog_to_binlog(
        log.where(F.col("scn") < UPDATE_BASE), trail, ORDERS_PAYLOAD, n_files=2
    )
    assert n_txn1 > 0

    def drain():
        stream = (
            spark.readStream.format("databus_cdc")
            .option("path", trail)
            .option("parts", "4")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)

    drain()
    phase1 = spark.read.schema(CDC_SCHEMA_DDL).parquet(out)
    n_phase1 = phase1.count()
    assert n_phase1 == log.where(F.col("scn") < UPDATE_BASE).count()

    # head moves: update + delete waves land, rotating into new files
    changelog_to_binlog(
        log.where(F.col("scn") >= UPDATE_BASE), trail, ORDERS_PAYLOAD, n_files=2
    )
    drain()  # resume from the same checkpoint

    drained = spark.read.schema(CDC_SCHEMA_DDL).parquet(out)
    # exactly-once: no event duplicated, none lost, across the restart
    assert drained.count() == log.count()
    assert drained.select("scn", "part_id", "key_str").distinct().count() == log.count()

    # event-level equality with the source changelog (full envelope)
    cols = ["scn", "ts", "opcode", "source", "source_id", "part_id",
            "key_num", "key_str", *ORDERS_PAYLOAD]
    got = _decode(drained)
    want = log.withColumn("ts", F.col("ts").cast("date")).withColumn(
        "o_orderdate", F.col("o_orderdate").cast("date")
    )
    assert _rows(got, cols) == _rows(want, cols)

    # per-partition txn_end framing: every (scn, part_id) group ends with
    # exactly one end-of-window marker on its last event
    eop = drained.groupBy("scn", "part_id").agg(
        F.sum(F.col("txn_end").cast("int")).alias("n_eop")
    )
    assert eop.where(F.col("n_eop") != 1).count() == 0


def test_cdc_stream_feeds_snapshot_store(spark, sf_dir, tmp_path):
    """The CDC source replaces the staged-file stand-in in the applier
    path: binlog -> stream -> MERGE store == oracle-proven batch snapshot."""
    log = orders_changelog(spark, sf_dir).localCheckpoint(eager=True)
    trail = str(tmp_path / "trail")
    changelog_to_binlog(log, trail, ORDERS_PAYLOAD, n_files=3)
    register(spark)

    store = ParquetSnapshotStore(spark, str(tmp_path / "snap"))
    stream = spark.readStream.format("databus_cdc").option("path", trail).load()

    def merge_batch(batch, _epoch):
        store.merge(batch)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)

    expected = batch_snapshot(log, key_cols=("source", "key_str"))
    got = store.read()
    cols = ["source", "key_str", "scn", "opcode"]
    assert _rows(got, cols) == _rows(expected, cols)
    # payload survives the JSON crossing: spot-check totals match exactly
    got_sum = got.select(
        F.sum(F.get_json_object("payload", "$.o_totalprice")).alias("s")
    ).collect()[0]["s"]
    want_sum = expected.agg(F.sum("o_totalprice").alias("s")).collect()[0]["s"]
    assert abs(got_sum - want_sum) < 1e-6


def test_binlog_scn_index_prunes_files(tmp_path):
    """The SCN index sidecar lets a resumed reader skip whole trail files:
    offset discovery reads the sidecar (not the trail), and a partition
    read over (start, end] never opens files outside its SCN bracket."""
    from databus_spark.sources.cdc_datasource import (
        INDEX_NAME,
        BinlogWriter,
        _read_index,
        _select_files,
        _trail_files,
    )

    trail = str(tmp_path / "trail")
    w = BinlogWriter(trail, max_txns_per_file=10)
    for scn in range(1, 31):  # 30 txns -> 3 files of 10
        w.append_txn(scn, 1_700_000_000_000 + scn, [
            {"op": "UPSERT", "source": "orders", "source_id": 1, "part_id": scn % 4,
             "key_num": scn, "key_str": str(scn), "payload": {"k": scn}},
        ])

    files = _trail_files(trail)
    assert len(files) == 3
    idx = _read_index(trail)
    assert set(idx) == set(files)
    assert idx[files[0]] == {"first_scn": 1, "last_scn": 10}
    assert idx[files[2]] == {"first_scn": 21, "last_scn": 30}

    # checkpoint past file 1 -> file 1 pruned without being opened
    assert _select_files(trail, start_scn=10) == files[1:]
    # range bracketed inside file 2 -> file 2 selected; the NEWEST file is
    # always kept (its index entry may be one committed txn stale)
    assert _select_files(trail, start_scn=12, end_scn=18) == [files[1], files[2]]
    # fully caught up -> only the never-pruned newest file remains
    assert _select_files(trail, start_scn=30) == [files[2]]

    # an unindexed file (producer crash window) is conservatively kept
    (tmp_path / "trail" / INDEX_NAME).unlink()
    assert _select_files(trail, start_scn=30) == files


def test_latest_offset_uses_index_not_trail_scan(tmp_path, monkeypatch):
    """latestOffset must not rescan SEALED (non-newest) trail files each
    trigger; the newest file is scanned by contract (its index entry may
    be one committed txn stale)."""
    import databus_spark.sources.cdc_datasource as cdc

    trail = str(tmp_path / "trail")
    w = cdc.BinlogWriter(trail, max_txns_per_file=5)
    for scn in range(1, 16):
        w.append_txn(scn, 0, [
            {"op": "UPSERT", "source": "orders", "source_id": 1, "part_id": 0,
             "key_num": scn, "key_str": str(scn), "payload": {}},
        ])

    opened = []
    real_open = open

    def spy_open(path, *a, **k):
        if str(path).endswith(".jsonl"):
            opened.append(str(path))
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", spy_open)
    reader = cdc.CdcBinlogStreamReader({"path": trail, "parts": "4"})
    latest = reader.latestOffset()
    assert latest == {str(p): 15 for p in range(4)}
    newest = sorted(cdc._trail_files(trail))[-1]
    assert [p.rsplit("/", 1)[-1] for p in opened] == [newest], (
        f"latestOffset must open exactly the newest file: {opened}"
    )


def test_latest_offset_sees_txn_behind_stale_index(tmp_path):
    """Producer-crash window: append_txn writes the data line before the
    index update, so the newest file's entry can lag one committed txn.
    Offset discovery and partition reads must still surface that txn."""
    import json

    import databus_spark.sources.cdc_datasource as cdc

    trail = str(tmp_path / "trail")
    w = cdc.BinlogWriter(trail, max_txns_per_file=100)
    for scn in (1, 2, 3):
        w.append_txn(scn, 0, [
            {"op": "UPSERT", "source": "orders", "source_id": 1, "part_id": 0,
             "key_num": scn, "key_str": str(scn), "payload": {}},
        ])

    # simulate the crash: a committed (newline-terminated) txn line lands
    # in the newest file but the index never gets updated
    import os

    newest = os.path.join(trail, cdc._trail_files(trail)[-1])
    with open(newest, "a") as f:
        f.write(json.dumps({"scn": 4, "ts_ms": 0, "events": [
            {"op": "UPSERT", "source": "orders", "source_id": 1, "part_id": 0,
             "key_num": 4, "key_str": "4", "payload": {}},
        ]}) + "\n")
    assert cdc._read_index(trail)[cdc._trail_files(trail)[-1]]["last_scn"] == 3

    reader = cdc.CdcBinlogStreamReader({"path": trail, "parts": "2"})
    latest = reader.latestOffset()
    assert latest == {"0": 4, "1": 4}, "stale index entry hid the committed txn"

    parts = reader.partitions(reader.initialOffset(), latest)
    scns = sorted(
        row[0] for p in parts for row in reader.read(p)
    )
    assert scns == [1, 2, 3, 4], "partition read pruned the stale-indexed txn"


def test_corrupt_trail_line_handling(spark, tmp_path):
    """A corrupt committed line is a poison pill: 'fail' (default) raises
    with the file/line named; .option('on_corrupt','skip') drains around
    it; a TORN last line (producer crashed mid-append, no newline) is
    never treated as corrupt — it is simply an uncommitted txn."""
    import pytest as _pytest

    from databus_spark.sources.cdc_datasource import BinlogWriter, _scan_txns

    trail = str(tmp_path / "trail")
    w = BinlogWriter(trail, max_txns_per_file=100)
    for scn in (1, 2, 3):
        w.append_txn(scn, 0, [
            {"op": "UPSERT", "source": "orders", "source_id": 1, "part_id": 0,
             "key_num": scn, "key_str": str(scn), "payload": {}},
        ])

    import os

    fname = sorted(n for n in os.listdir(trail) if n.endswith(".jsonl"))[0]
    path = os.path.join(trail, fname)
    # inject a corrupt COMMITTED line (newline-terminated) mid-file
    lines = open(path).read().splitlines(keepends=True)
    lines.insert(2, '{"garbage": tru\n')
    open(path, "w").write("".join(lines))

    with _pytest.raises(ValueError, match="corrupt trail line"):
        list(_scan_txns(trail))
    assert [t["scn"] for t in _scan_txns(trail, on_corrupt="skip")] == [1, 2, 3]

    # torn tail: half-written last line without newline is ignored by both
    with open(path, "a") as f:
        f.write('{"scn": 4, "events": [')  # no newline
    assert [t["scn"] for t in _scan_txns(trail, on_corrupt="skip")] == [1, 2, 3]
    lines2 = open(path).read().splitlines(keepends=True)
    del lines2[2]  # remove the corrupt line; torn tail remains
    open(path, "w").write("".join(lines2))
    assert [t["scn"] for t in _scan_txns(trail)] == [1, 2, 3]


def test_scn_index_corruption_never_loses_data(tmp_path):
    """Property: NO corruption of the index sidecar (truncation at any
    byte, entry-level mangling, junk content) can hide committed
    transactions — the index only prunes, never gates. Mirrors the trail
    corruption tests for the sidecar (hypothesis-driven truncation)."""
    import json as _json
    import os

    from hypothesis import given, settings
    from hypothesis import strategies as st

    import databus_spark.sources.cdc_datasource as cdc

    trail = str(tmp_path / "trail")
    w = cdc.BinlogWriter(trail, max_txns_per_file=4)
    for scn in range(1, 13):  # 12 txns -> 3 files
        w.append_txn(scn, 0, [
            {"op": "UPSERT", "source": "orders", "source_id": 1, "part_id": scn % 2,
             "key_num": scn, "key_str": str(scn), "payload": {}},
        ])
    idx_path = os.path.join(trail, cdc.INDEX_NAME)
    pristine = open(idx_path, "rb").read()

    def full_drain():
        reader = cdc.CdcBinlogStreamReader({"path": trail, "parts": "2"})
        latest = reader.latestOffset()
        parts = reader.partitions(reader.initialOffset(), latest)
        return sorted(row[0] for p in parts for row in reader.read(p))

    expected = full_drain()
    assert expected == list(range(1, 13))

    @settings(max_examples=30, deadline=None)
    @given(cut=st.integers(min_value=0, max_value=len(pristine)))
    def truncated_index_still_complete(cut):
        with open(idx_path, "wb") as f:
            f.write(pristine[:cut])
        assert full_drain() == expected

    truncated_index_still_complete()

    # entry-level mangling: valid JSON, malformed entries
    files = cdc._trail_files(trail)
    for bad in (
        {files[0]: {}},                                # missing fields
        {files[0]: {"first_scn": "x", "last_scn": 4}}, # non-numeric
        {files[0]: None, files[1]: {"first_scn": 5, "last_scn": 8}},
        [1, 2, 3],                                     # not a dict at all
    ):
        with open(idx_path, "w") as f:
            _json.dump(bad, f)
        assert full_drain() == expected, f"corrupt index {bad!r} hid data"

    with open(idx_path, "wb") as f:
        f.write(pristine)
