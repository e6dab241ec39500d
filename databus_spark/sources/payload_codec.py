"""Payload serde: Avro when the spark-avro connector is loaded, JSON otherwise.

The reference's payloads are Avro-binary with writer-schema digests
(reference: DbusEventAvroDecoder.java:84-148). The idiomatic Spark
codec is from_avro/to_avro (the external spark-avro module — not
bundled in this image, detected at runtime). The JSON path is the
drop-in fallback with identical plan shape: serialize(struct) on the
producer, deserialize-with-reader-schema on the consumer; everything
in sources/schema_registry.py (versioning, digests, broadcast
resolution) is codec-agnostic.

For REAL Avro-binary wire bytes without the jar, use
functions/avro_codec.py — a pure-Python implementation of the public
Avro binary spec (zigzag varints, union indexes, writer->reader
resolution) behind Arrow-batched pandas UDFs; the `avro_binary_decode`
registry query proves it oracle-green over mixed writer versions.
"""

from __future__ import annotations

from functools import cache

from pyspark.sql import Column
from pyspark.sql import functions as F


@cache
def avro_available() -> bool:
    """True iff the spark-avro data source is on the classpath."""
    try:
        from pyspark.sql.avro.functions import to_avro

        # the import always succeeds; the function raises at plan time
        # when the data source is absent — probe with a literal
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            return False
        spark.range(1).select(to_avro(F.col("id"))).schema
        return True
    except Exception:
        return False


def encode_payload(struct_col: Column) -> Column:
    """struct -> serialized payload (Avro binary or canonical JSON)."""
    if avro_available():
        from pyspark.sql.avro.functions import to_avro

        return to_avro(struct_col)
    return F.to_json(struct_col)


def decode_payload(payload_col: Column, reader_ddl: str, writer_avro_schema: str | None = None) -> Column:
    """serialized payload -> struct under the READER schema (missing
    fields NULL, extra fields pruned — Avro resolution semantics)."""
    if avro_available() and writer_avro_schema is not None:
        from pyspark.sql.avro.functions import from_avro

        return from_avro(payload_col, writer_avro_schema)
    return F.from_json(payload_col, reader_ddl)
