"""Differential test: the pure-Python Avro wire codec vs spark-avro.

functions/avro_codec.py implements the public Avro binary spec
(zigzag varints, union indexes, writer->reader resolution) so the
engine can speak real Avro wire bytes without the external spark-avro
jar. If that jar is ever on the classpath, its from_avro/to_avro are
the ground truth — this module cross-checks both directions so any
resolution-rule drift between the two implementations is caught the
moment the jar ships. Skipped (not silently green) when the jar is
absent, which is the current container state.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from databus_spark.functions.avro_codec import decode_record, encode_record

WRITER = {
    "type": "record",
    "name": "Evt",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "tag", "type": ["null", "string"]},
    ],
}
WRITER_JSON = json.dumps(WRITER)
READER_DDL = "id BIGINT, name STRING, score DOUBLE, tag STRING"


def _jar_present(spark) -> bool:
    from databus_spark.sources.payload_codec import avro_available

    return avro_available()


records = st.lists(
    st.tuples(
        st.integers(-(2**40), 2**40),
        st.text(max_size=20),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.one_of(st.none(), st.text(max_size=8)),
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=records)
def test_python_encode_matches_spark_avro_decode(spark, rows):
    """Bytes produced by the pure-Python encoder must decode identically
    through spark-avro's from_avro and through decode_record."""
    if not _jar_present(spark):
        pytest.skip("spark-avro jar not on classpath (expected in this image)")
    from pyspark.sql.avro.functions import from_avro

    payloads = [
        (encode_record({"id": i, "name": n, "score": s, "tag": t}, WRITER),)
        for i, n, s, t in rows
    ]
    df = spark.createDataFrame(payloads, "payload BINARY")
    via_spark = [
        r["rec"].asDict()
        for r in df.select(from_avro(F.col("payload"), WRITER_JSON).alias("rec")).collect()
    ]
    via_python = [decode_record(p[0], WRITER, WRITER) for p in payloads]
    assert via_spark == via_python


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=records)
def test_spark_avro_encode_matches_python_decode(spark, rows):
    """Bytes produced by to_avro must decode identically through the
    pure-Python decoder (round-trip ground truth in the other direction)."""
    if not _jar_present(spark):
        pytest.skip("spark-avro jar not on classpath (expected in this image)")
    from pyspark.sql.avro.functions import to_avro

    df = spark.createDataFrame(
        [(i, n, s, t) for i, n, s, t in rows], READER_DDL
    ).select(to_avro(F.struct("id", "name", "score", "tag")).alias("payload"))
    blobs = [bytes(r["payload"]) for r in df.collect()]
    # to_avro writes every Spark field as nullable-union; mirror that shape
    spark_writer = {
        "type": "record",
        "name": "Evt",
        "fields": [
            {"name": "id", "type": ["null", "long"]},
            {"name": "name", "type": ["null", "string"]},
            {"name": "score", "type": ["null", "double"]},
            {"name": "tag", "type": ["null", "string"]},
        ],
    }
    via_python = [decode_record(b, spark_writer, spark_writer) for b in blobs]
    expect = [
        {"id": i, "name": n, "score": s, "tag": t} for i, n, s, t in rows
    ]
    assert via_python == expect


def test_avro_decode_quarantine_contract_under_fuzz():
    """Every torn/corrupt buffer fails as ValueError (fuzz caught
    struct.error and IndexError escapes — an executor-task crash class,
    not a quarantined row)."""
    import random

    from databus_spark.functions.avro_codec import decode_record, encode_record

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": ["null", "double"]},
        ],
    }
    good = encode_record({"a": 42, "b": "hello", "c": 1.5}, schema)
    rng = random.Random(11)
    escapes = []
    for _ in range(4000):
        b = bytearray(good)
        for _m in range(rng.randint(1, 5)):
            op = rng.random()
            if op < 0.4 and len(b) > 0:
                b[rng.randrange(len(b))] = rng.randrange(256)
            elif op < 0.7 and len(b) > 1:
                b = bytearray(b[: rng.randrange(1, len(b))])
            else:
                b += bytes(rng.randrange(6))
        try:
            decode_record(bytes(b), schema, schema)
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001 — the assertion target
            escapes.append((type(e).__name__, str(e)[:80]))
    assert not escapes, escapes[:5]
