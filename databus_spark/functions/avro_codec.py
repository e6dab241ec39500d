"""Minimal pure-Python Avro BINARY codec (public Apache Avro spec).

The reference decodes Avro-binary payloads with a writer-schema lookup
and reader-schema resolution (reference: databus-client-common/.../
DbusEventAvroDecoder.java:57-148 — fetch VersionedSchema by digest,
`new GenericDatumReader(writerSchema, readerSchema)`). The idiomatic
Spark path is the external spark-avro module's from_avro/to_avro; this
image does not bundle that jar, so this module implements the wire
format from the published spec — zigzag-varint longs, little-endian
IEEE floats, length-prefixed strings/bytes, union-index prefixes, record
field concatenation — plus writer->reader schema resolution:

  * fields matched by name; writer-only fields are decoded and skipped
  * reader-only fields take their declared default (else null)
  * numeric promotions int->long, int/long->float/double, float->double

Spark integration is Arrow-batched pandas UDFs (never row-at-a-time
Python UDFs): the per-batch cost is one python loop over ~10k records,
and the writer-schema registry rides along as a tiny closure dict (the
broadcast-join analog for a map that fits in kilobytes). When a
spark-avro jar IS present, sources/payload_codec.py routes to the JVM
from_avro/to_avro instead — same plan shape, zero Python.

Supported schema subset (all the payloads the engine ships): records of
null / boolean / int / long / float / double / string / bytes fields
and 2-branch ["null", T] unions with defaults.
"""

from __future__ import annotations

import json
import struct
from typing import Any

import pandas as pd

_U64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------

def _write_long(out: bytearray, n: int) -> None:
    z = ((n << 1) ^ (n >> 63)) & _U64  # zigzag, bounded to 64 bits
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    z = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _encode_value(out: bytearray, value: Any, schema: Any) -> None:
    if isinstance(schema, list):  # union: index, then value
        if value is None:
            idx = schema.index("null")
            _write_long(out, idx)
            return
        idx = next(i for i, s in enumerate(schema) if s != "null")
        _write_long(out, idx)
        _encode_value(out, value, schema[idx])
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.extend(struct.pack("<f", float(value)))
    elif t == "double":
        out.extend(struct.pack("<d", float(value)))
    elif t == "string":
        raw = str(value).encode("utf-8")
        _write_long(out, len(raw))
        out.extend(raw)
    elif t == "bytes":
        raw = bytes(value)
        _write_long(out, len(raw))
        out.extend(raw)
    elif t == "record":
        for f in schema["fields"]:
            _encode_value(out, value.get(f["name"]), f["type"])
    else:
        raise ValueError(f"unsupported Avro type: {t!r}")


def encode_record(record: dict, schema: dict) -> bytes:
    out = bytearray()
    _encode_value(out, record, schema)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode (with writer->reader resolution)
# ---------------------------------------------------------------------------

def _decode_value(buf: bytes, pos: int, schema: Any) -> tuple[Any, int]:
    if isinstance(schema, list):
        idx, pos = _read_long(buf, pos)
        # validate BEFORE indexing: a torn/hostile union index decodes
        # as a negative zigzag long, and Python's negative indexing
        # would silently pick schema[-1] and misdecode garbage as clean
        # data instead of quarantining
        if not 0 <= idx < len(schema):
            raise ValueError(f"torn Avro union index {idx}")
        return _decode_value(buf, pos, schema[idx])
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "string":
        n, pos = _read_long(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("torn Avro string (bad length)")
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if t == "bytes":
        n, pos = _read_long(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("torn Avro bytes (bad length)")
        return bytes(buf[pos : pos + n]), pos + n
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode_value(buf, pos, f["type"])
        return rec, pos
    raise ValueError(f"unsupported Avro type: {t!r}")


def _base_type(schema: Any) -> str:
    if isinstance(schema, list):
        return next((s["type"] if isinstance(s, dict) else s) for s in schema if s != "null")
    return schema["type"] if isinstance(schema, dict) else schema


def _promote(value: Any, writer_t: str, reader_t: str) -> Any:
    if value is None:
        return None
    if reader_t in ("float", "double") and writer_t in ("int", "long", "float"):
        return float(value)
    if reader_t == "long" and writer_t == "int":
        return int(value)
    return value


def decode_record(
    buf: bytes, writer: dict, reader: dict, return_consumed: bool = False
):
    """Decode writer-shaped bytes, project onto the reader schema
    (Avro spec 'Schema Resolution'; DbusEventAvroDecoder.java:135-148).

    With return_consumed=True also returns the byte length consumed —
    what a container-file block reader needs to walk concatenated
    records (sources/avro_ocf.py).

    Quarantine contract (fuzz-pinned, like the media codecs): every
    malformed buffer fails as ValueError — wire-level struct.error /
    IndexError on torn bytes are converted so a poisoned payload lands
    in the caller's quarantine leg, never as an executor task crash."""
    try:
        return _decode_record_inner(buf, writer, reader, return_consumed)
    except (struct.error, IndexError) as e:
        raise ValueError(f"torn Avro record: {e}") from e


def _decode_record_inner(
    buf: bytes, writer: dict, reader: dict, return_consumed: bool
):
    reader_fields = {f["name"]: f for f in reader["fields"]}
    rec: dict[str, Any] = {}
    pos = 0
    for wf in writer["fields"]:
        value, pos = _decode_value(buf, pos, wf["type"])
        rf = reader_fields.get(wf["name"])
        if rf is not None:
            rec[wf["name"]] = _promote(
                value, _base_type(wf["type"]), _base_type(rf["type"])
            )
    written = {f["name"] for f in writer["fields"]}
    for rf in reader["fields"]:
        if rf["name"] not in written:
            rec[rf["name"]] = rf.get("default")
    if return_consumed:
        return rec, pos
    return rec


# ---------------------------------------------------------------------------
# Spark integration: Arrow-batched pandas UDFs
# ---------------------------------------------------------------------------

def avro_encode_udf(schema_json: str):
    """pandas UDF: struct column -> Avro binary under one writer schema."""
    from pyspark.sql.functions import pandas_udf

    schema = json.loads(schema_json)

    # hint says Series (what the type checker accepts); a StructType input
    # actually arrives as a pd.DataFrame — normalize either at runtime
    @pandas_udf("binary")
    def enc(s: pd.Series) -> pd.Series:
        if isinstance(s, pd.DataFrame):
            records = s.to_dict("records")
        else:
            records = [dict(v) for v in s]
        return pd.Series([encode_record(r, schema) for r in records], dtype=object)

    return enc


def avro_decode_udf(writer_schemas: dict[str, str], reader_schema_json: str, reader_ddl: str):
    """pandas UDF: (payload binary, schema_id) -> reader-schema struct.

    `writer_schemas` maps schema_id -> writer Avro schema JSON — the
    VersionedSchemaSet the reference keeps per source, resolved per ROW
    (mixed writer versions in one batch decode correctly)."""
    from pyspark.sql.functions import pandas_udf

    writers = {sid: json.loads(js) for sid, js in writer_schemas.items()}
    reader = json.loads(reader_schema_json)
    names = [f["name"] for f in reader["fields"]]

    @pandas_udf(reader_ddl)
    def dec(payload: pd.Series, schema_id: pd.Series) -> pd.DataFrame:
        rows = []
        for p, sid in zip(payload, schema_id):
            if p is None or sid not in writers:
                rows.append({n: None for n in names})
            else:
                rows.append(decode_record(p, writers[sid], reader))
        return pd.DataFrame(rows, columns=names)

    return dec


def _avro_json_value(value: Any, schema: Any) -> Any:
    """Avro JSON-encoding rules (spec 'JSON Encoding'): union values are
    wrapped in a one-key object named by the branch type, null stays
    bare null, bytes render as ISO-8859-1 text."""
    if isinstance(schema, list):  # union
        if value is None:
            return None
        branch = next(s for s in schema if s != "null")
        t = branch["type"] if isinstance(branch, dict) else branch
        name = branch.get("name", t) if isinstance(branch, dict) else t
        return {name: _avro_json_value(value, branch)}
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "record":
        return {
            f["name"]: _avro_json_value(value.get(f["name"]), f["type"])
            for f in schema["fields"]
        }
    if t == "bytes":
        return bytes(value).decode("latin-1")
    return value


def avro_json_render(record: dict, schema: dict) -> str:
    """One Avro-JSON-encoded line for a record (AvroJsonDtailPrinter
    renders each event the same way; DtailCliBase.java:57-64)."""
    return json.dumps(_avro_json_value(record, schema), separators=(",", ":"))


def schema_id_of(schema_json: str) -> str:
    """MD5 digest of the schema text (SchemaId.java:59)."""
    import hashlib

    return hashlib.md5(schema_json.encode()).hexdigest()
