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

# Pixel/sample DECODE for compressed formats (JPEG bitplanes, video)
# still needs external libs (PIL/ffmpeg) and stays stubbed; header-level
# METADATA decode below is real, pure stdlib.
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
    """Decode an image/audio payload to pixels/samples. STUB: pixel-level
    codec libs are not in this container; the real implementation plugs
    in here unchanged. Header-level metadata decode (parse_media_meta)
    is REAL — pure stdlib — and does not come through here."""
    if not _REAL_CODECS_AVAILABLE:
        raise NotImplementedError(
            "pixel/sample codecs unavailable in this environment; "
            "parse_media_meta decodes real format metadata, "
            "extract_features uses the deterministic byte-level fallback"
        )


# -- REAL metadata codecs (pure stdlib, no external libs) --------------------

MEDIA_META_SCHEMA = (
    "doc_id BIGINT, mime STRING, width INT, height INT, "
    "n_channels INT, sample_rate_hz INT, duration_ms BIGINT, "
    "rms_energy BIGINT, n_bytes BIGINT"
)

_NO_META = {
    "mime": "application/octet-stream",
    "width": None,
    "height": None,
    "n_channels": None,
    "sample_rate_hz": None,
    "duration_ms": None,
    "rms_energy": None,
}


def parse_media_meta(payload: bytes) -> dict:
    """REAL format sniff + metadata decode for the container's
    libs-free environment: PNG/GIF/BMP/JPEG dimensions from their wire
    headers, WAV audio via the stdlib wave/audioop modules (channels,
    sample rate, duration, RMS energy). Unknown formats degrade to the
    opaque-bytes row, never an error — a corrupt header is data, not an
    ingest crash."""
    import io
    import struct

    out = dict(_NO_META)
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
            w, h = struct.unpack(">II", payload[16:24])
            out.update(mime="image/png", width=w, height=h)
        elif payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            out.update(mime="image/gif", width=w, height=h)
        elif payload[:2] == b"BM" and len(payload) >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            out.update(mime="image/bmp", width=w, height=abs(h))
        elif payload[:2] == b"\xff\xd8":
            # JPEG: walk segments to the first SOF frame header
            i = 2
            while i + 9 < len(payload):
                if payload[i] != 0xFF:
                    break
                marker = payload[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
                if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    out.update(mime="image/jpeg", width=w, height=h)
                    break
                i += 2 + seg_len
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            import audioop
            import wave

            with wave.open(io.BytesIO(payload)) as wf:
                rate = wf.getframerate()
                frames = wf.getnframes()
                width = wf.getsampwidth()
                out.update(
                    mime="audio/wav",
                    n_channels=wf.getnchannels(),
                    sample_rate_hz=rate,
                    duration_ms=int(frames * 1000 / rate) if rate else None,
                    rms_energy=audioop.rms(wf.readframes(frames), width)
                    if frames
                    else 0,
                )
    except Exception:
        return dict(_NO_META)  # torn/corrupt header -> opaque bytes
    return out


def media_meta_probe(media_df: DataFrame) -> DataFrame:
    """Arrow-batched REAL metadata extraction over the opaque media
    column — the decode stage a 100 TB multimodal pipeline runs before
    routing payloads to modality-specific feature extractors. Output
    schema is fixed (prunable); payloads only cross to Python here."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [parse_media_meta(bytes(b)) for b in pdf["media"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out["n_bytes"] = pdf["media"].map(len).astype("int64")
            yield out

    return media_df.mapInPandas(batches, MEDIA_META_SCHEMA)


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


def synth_wav_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic WAV payload per document (FIXTURE for the codec
    path): mono 8 kHz, 16-bit, constant amplitude 500 + doc_id % 1000,
    100 + n_chars % 500 frames — every metadata field the probe decodes
    is a closed-form function of (doc_id, n_chars), so a SQL oracle can
    check the REAL wave/audioop decode end-to-end. Arrow-batched
    synthesis; payload bytes never leave the executors."""
    import io
    import struct
    import wave
    from collections.abc import Iterator as _Iterator

    def batches(it: _Iterator[pd.DataFrame]) -> _Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                amp = 500 + int(doc_id) % 1000
                frames = 100 + int(n_chars) % 500
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(struct.pack("<h", amp) * frames)
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": blobs})

    return docs.select("doc_id", "n_chars").mapInPandas(
        batches, "doc_id BIGINT, media BINARY"
    )


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
