"""Codec/integrity scalar functions of the reference, Spark-native.

Reference parity map:
  crc32          <- core/util/ByteBufferCRC32.java, DbusEventV2.java:138-151
                    (per-event integrity) -> Spark builtin F.crc32
  md5 schema id  <- schemas/SchemaId.java:36,59 (digest of canonical
                    schema text, carried per event) -> F.md5
  base64         <- core/util/Base64.java -> F.base64/F.unbase64
  gzip           <- core/util/CompressUtil.java:12-25 (ZK checkpoint blob
                    compression) -> Python gzip UDF pair (cold path only:
                    checkpoint blobs, never per-event data)
  JSON rendering <- Encoding.java:22-26 JSON | JSON_PLAIN_VALUE,
                    DbusEventPart.toJSON -> deterministic manual concat
                    (render_event_json) so oracles reproduce it exactly
"""

from __future__ import annotations

import gzip as _gzip

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def schema_id(schema_text: Column | str) -> Column:
    """MD5 digest of canonical schema text (SchemaId.java:59)."""
    c = F.col(schema_text) if isinstance(schema_text, str) else schema_text
    return F.md5(c)


@F.udf(T.BinaryType())
def gzip_compress(s: str) -> bytes | None:
    if s is None:
        return None
    # mtime=0 -> deterministic output (CompressUtil writes bare deflate;
    # fixed-header gzip keeps round-trips reproducible across runs)
    return _gzip.compress(s.encode("utf-8"), mtime=0)


@F.udf(T.StringType())
def gzip_decompress(b: bytes) -> str | None:
    if b is None:
        return None
    return _gzip.decompress(b).decode("utf-8")


def render_event_json(scn="scn", opcode="opcode", source="source", key="key_str") -> Column:
    """Deterministic JSON rendering of an envelope event (dtail JSON mode).

    Manual field-ordered concat rather than to_json so the byte output is
    engine-independent (JsonDtailPrinter renders by hand too).
    """
    return F.concat(
        F.lit('{"scn":'),
        F.col(scn).cast("string"),
        F.lit(',"opcode":"'),
        F.col(opcode),
        F.lit('","source":"'),
        F.col(source),
        F.lit('","key":"'),
        F.col(key),
        F.lit('"}'),
    )


RENDER_EVENT_JSON_SQL = (
    "concat('{\"scn\":', CAST(scn AS VARCHAR), ',\"opcode\":\"', opcode, "
    "'\",\"source\":\"', source, '\",\"key\":\"', key_str, '\"}')"
)
