"""Avro Object Container File (OCF) source/sink — pure spec, no jar.

The reference persists and ships Avro everywhere (bootstrap files, event
payloads — DbusEventAvroDecoder; file-based event producers). Spark's
idiomatic path is the external spark-avro module; this image doesn't
bundle it, so this module implements the PUBLIC container spec
(https://avro.apache.org/docs/current/specification/ — Object Container
Files) over the repo's pure-Python wire codec (functions/avro_codec.py):

    magic 'Obj\\x01'
    file metadata map: avro.schema (JSON), avro.codec (null | deflate)
    16-byte sync marker
    blocks: record count, byte size, records, sync marker

Scale notes: the Spark reader parallelizes per FILE (binaryFile source →
Arrow-batched mapInPandas decode); OCF is sync-marker-splittable, so the
100 TB extension is per-split scans that seek to the next sync — the
same splitting Hadoop's AvroInputFormat does. Writer-side the sync
marker is md5(schema JSON): deterministic output, reproducible fixtures.

Reader-schema resolution (writer-only fields skipped, reader defaults,
numeric promotions) comes from decode_record — the same rules
DbusEventAvroDecoder applies via GenericDatumReader.
"""

from __future__ import annotations

import hashlib
import io
import json
import zlib
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession

from databus_spark.functions.avro_codec import (
    _read_long,
    _write_long,
    decode_record,
    encode_record,
)

MAGIC = b"Obj\x01"


def _write_meta_map(out: bytearray, meta: dict[str, bytes]) -> None:
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode("utf-8")
        _write_long(out, len(kb))
        out.extend(kb)
        _write_long(out, len(v))
        out.extend(v)
    _write_long(out, 0)


def _read_meta_map(buf: bytes, pos: int) -> tuple[dict[str, bytes], int]:
    meta: dict[str, bytes] = {}
    while True:
        count, pos = _read_long(buf, pos)
        if count == 0:
            break
        if count < 0:  # negative block form: count is followed by byte size
            _, pos = _read_long(buf, pos)
            count = -count
        for _ in range(count):
            klen, pos = _read_long(buf, pos)
            key = buf[pos : pos + klen].decode("utf-8")
            pos += klen
            vlen, pos = _read_long(buf, pos)
            meta[key] = bytes(buf[pos : pos + vlen])
            pos += vlen
    return meta, pos


def write_ocf(
    path: str,
    records: list[dict],
    schema: dict,
    codec: str = "null",
    records_per_block: int = 1000,
) -> int:
    """Write records as one OCF file; returns the number of blocks.

    Deterministic bytes: sync marker = md5(schema JSON), sorted metadata,
    fixed block sizing — the same inputs always produce the same file.
    """
    schema_json = json.dumps(schema, sort_keys=True)
    sync = hashlib.md5(schema_json.encode()).digest()
    out = bytearray()
    out.extend(MAGIC)
    _write_meta_map(
        out,
        {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()},
    )
    out.extend(sync)
    n_blocks = 0
    for i in range(0, len(records), records_per_block):
        chunk = records[i : i + records_per_block]
        body = bytearray()
        for rec in chunk:
            body.extend(encode_record(rec, schema))
        data = bytes(body)
        if codec == "deflate":  # RFC1951 raw deflate per the spec
            comp = zlib.compressobj(level=6, wbits=-15)
            data = comp.compress(data) + comp.flush()
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        _write_long(out, len(chunk))
        _write_long(out, len(data))
        out.extend(data)
        out.extend(sync)
        n_blocks += 1
    with open(path, "wb") as f:
        f.write(bytes(out))
    return n_blocks


def read_ocf_bytes(buf: bytes, reader_schema: dict | None = None) -> Iterator[dict]:
    """Decode every record of one OCF byte string (spec walk: header,
    metadata, sync-delimited blocks, optional deflate)."""
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta, pos = _read_meta_map(buf, 4)
    writer = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    reader = reader_schema or writer
    sync = buf[pos : pos + 16]
    pos += 16
    while pos < len(buf):
        count, pos = _read_long(buf, pos)
        size, pos = _read_long(buf, pos)
        data = bytes(buf[pos : pos + size])
        pos += size
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        dpos = 0
        for _ in range(count):
            rec, dpos = _decode_at(data, dpos, writer, reader)
            yield rec
        if buf[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (torn block)")
        pos += 16


def _decode_at(data: bytes, pos: int, writer: dict, reader: dict) -> tuple[dict, int]:
    # decode_record consumes from the start of a buffer; slice per record
    # would re-scan, so reuse its internals via a cheap wrapper: records
    # are field-concatenated, and decode_record returns the record built
    # from buf[0:]; we track the consumed length through a sub-decode.
    rec, consumed = decode_record(data[pos:], writer, reader, return_consumed=True)
    return rec, pos + consumed


def read_ocf_file(path: str, reader_schema: dict | None = None) -> Iterator[dict]:
    with open(path, "rb") as f:
        return read_ocf_bytes(f.read(), reader_schema)


def _read_header(f) -> tuple[dict, str, bytes, int]:
    """Parse (writer_schema, codec, sync, data_start) from an open file."""
    head = f.read(1 << 16)  # metadata map is small; 64 KB covers it
    if head[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta, pos = _read_meta_map(head, 4)
    writer = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = bytes(head[pos : pos + 16])
    return writer, codec, sync, pos + 16


def _read_long_stream(f) -> int:
    """Zigzag varint from a stream (the block headers between syncs)."""
    shift = acc = 0
    while True:
        b = f.read(1)
        if not b:
            raise EOFError("truncated block header")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def iter_ocf_split(
    path: str, start: int, end: int, reader_schema: dict | None = None
) -> Iterator[dict]:
    """Records of every block whose preceding sync marker STARTS in
    [start, end) — the Hadoop AvroInputFormat split convention, so
    arbitrary byte ranges over one file partition the records exactly
    once with no coordination. Split 0 naturally owns the first block
    (the header's trailing sync is its preceding sync)."""
    with open(path, "rb") as f:
        writer, codec, sync, data_start = _read_header(f)
        reader = reader_schema or writer
        # find the first sync whose offset q >= start
        search_from = max(start, data_start - 16)
        f.seek(search_from)
        window = b""
        q = None
        base = search_from
        while q is None:
            chunk = f.read(1 << 20)
            if not chunk:
                return
            window += chunk
            i = window.find(sync)
            if i >= 0:
                q = base + i
            else:
                base += len(window) - 15
                window = window[-15:]
        while q < end:
            f.seek(q + 16)
            try:
                count = _read_long_stream(f)
                size = _read_long_stream(f)
            except EOFError:
                return  # file ends exactly after the final sync
            data = f.read(size)
            if codec == "deflate":
                data = zlib.decompress(data, wbits=-15)
            elif codec != "null":
                raise ValueError(f"unsupported avro codec {codec!r}")
            pos = 0
            for _ in range(count):
                rec, pos = _decode_at(data, pos, writer, reader)
                yield rec
            q = f.tell()  # next sync begins right here
            if f.read(16) != sync:
                raise ValueError("sync marker mismatch (torn block)")


def read_ocf_splits(
    spark: SparkSession,
    path_glob: str,
    out_ddl: str,
    split_bytes: int = 128 << 20,
    reader_schema: dict | None = None,
) -> DataFrame:
    """The 100 TB read path: byte-range splits WITHIN files, each task
    seeking to the next sync marker — intra-file parallelism, exactly
    like Hadoop's AvroInputFormat. The driver only lists (path, size);
    records never touch it. (Local-filesystem listing here; on HDFS/S3
    the same plan builds from the FileSystem listing.)"""
    import glob as _glob
    import os

    import pandas as pd

    splits = []
    for p in sorted(_glob.glob(path_glob)):
        size = os.path.getsize(p)
        for off in range(0, max(size, 1), split_bytes):
            splits.append((p, off, min(off + split_bytes, size)))
    out_names = [c.strip().split()[0] for c in out_ddl.split(",")]
    # pure-JVM VALUES LocalRelation, not createDataFrame-from-rows: the
    # split list is tiny driver metadata, but a pickled-Python local RDD
    # materializes as defaultParallelism near-empty tasks that each spin
    # a non-Arrow Python worker (r14 stage metrics: a 32-task stage of
    # 0.19 s total CPU but 42 s total run — ~1.3 s of worker spin-up per
    # task). Same trap as the zorder manifest / sources_registry dims.
    def _sql_str(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "''")

    rows_sql = ", ".join(f"('{_sql_str(p)}', {s}, {e})" for p, s, e in splits)
    sdf = spark.sql(
        "SELECT col1 AS path, CAST(col2 AS BIGINT) AS start,"
        f" CAST(col3 AS BIGINT) AS `end` FROM (VALUES {rows_sql})"
    )
    sdf = sdf.repartition(min(len(splits), spark.sparkContext.defaultParallelism))

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            for path, start, end in pdf.itertuples(index=False):
                recs = list(iter_ocf_split(path, int(start), int(end), reader_schema))
                yield pd.DataFrame(recs, columns=out_names)

    return sdf.mapInPandas(batches, out_ddl)


def read_ocf(
    spark: SparkSession,
    path_glob: str,
    out_ddl: str,
    reader_schema: dict | None = None,
) -> DataFrame:
    """Distributed OCF read: one task per file (binaryFile source), the
    decode Arrow-batched through mapInPandas with a fixed output schema.
    Writer schema comes from each file's own header; reader_schema (if
    given) applies GenericDatumReader-style resolution per record."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob).select("content")
    out_names = [c.strip().split()[0] for c in out_ddl.split(",")]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for blob in pdf["content"]:
                recs = list(read_ocf_bytes(bytes(blob), reader_schema))
                yield pd.DataFrame(recs, columns=out_names)

    return files.mapInPandas(batches, out_ddl)
