"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference capability. Images/audio/video travel as `binary`
columns with a typed metadata struct; decode / feature-extract run as
Arrow-batched Pandas functions over mapInPandas — the Spark-side
plumbing (schema, batching, partition flow) is real and tested; the
actual codec call is stubbed because no image/audio libraries ship in
this container.

Design for 100 TB: binary payloads stay opaque end-to-end (no JVM<->
Python round trip until the extract stage), rows flow through
mapInPandas in Arrow record batches, and the output schema is fixed so
the optimizer can prune. The reference's analogous stance: relays move
raw payload bytes without deserializing (DbusEventBuffer streamEvents,
core/DbusEventBuffer.java:2235-2560).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Flip to a real decoder (PIL/libsndfile/ffmpeg) when available.
_REAL_CODECS_AVAILABLE = False

MEDIA_SCHEMA = (
    "doc_id BIGINT, media BINARY, "
    "meta STRUCT<mime: STRING, n_bytes: BIGINT, checksum: STRING>"
)

FEATURE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, first_byte INT, last_byte INT, byte_sum BIGINT"
)


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap each document's text bytes as an opaque media payload with
    typed metadata — the engine's canonical multimodal row shape."""
    media = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(media).cast("long").alias("n_bytes"),
            F.md5(F.col(text_col)).alias("checksum"),
        ).alias("meta"),
    )


def decode_media(payload: bytes) -> object:
    """Decode an image/audio payload. STUB: codec libs are not in this
    container; the real implementation plugs in here unchanged."""
    if not _REAL_CODECS_AVAILABLE:
        raise NotImplementedError(
            "media codecs unavailable in this environment; "
            "extract_features uses the deterministic byte-level fallback"
        )


def extract_features(media_df: DataFrame) -> DataFrame:
    """Feature extraction over Arrow batches (mapInPandas).

    With real codecs this would decode and embed; the deterministic
    fallback computes byte-level features so the distributed plumbing
    (batch shape, schema, partition flow) is fully exercised and
    oracle-checkable.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1).astype("int32"),
                    "byte_sum": payloads.map(lambda b: int(sum(b))).astype("int64"),
                }
            )

    return media_df.mapInPandas(batches, FEATURE_SCHEMA)


MEDIA_FEATURES_SQL = """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
           CAST(ascii(substr(text, length(text), 1)) AS INT) AS last_byte,
           CAST(list_sum(list_transform(range(1, length(text)+1),
                i -> ascii(substr(text, i, 1)))) AS BIGINT) AS byte_sum
    FROM documents
"""


def frame_sample(media_df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' shape: emit one row per sampled offset of each
    payload (what video frame extraction looks like as a plan) — pure
    DataFrame ops, the payload slice stays JVM-side."""
    n = F.col("meta.n_bytes")
    offsets = F.sequence(F.lit(0), F.greatest((n - 1) / every_n_bytes, F.lit(0)).cast("long"))
    return media_df.select(
        "doc_id",
        F.explode(offsets).alias("frame_idx"),
    ).withColumn("byte_offset", F.col("frame_idx") * every_n_bytes)
