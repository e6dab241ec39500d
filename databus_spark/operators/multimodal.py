"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference capability. Images/audio/video travel as `binary`
columns with a typed metadata struct; decode / feature-extract run as
Arrow-batched Pandas functions over mapInPandas. REAL, stdlib-only
codecs cover: header metadata for PNG/GIF/BMP/JPEG, full WAV decode
(wave + audioop RMS), and full PNG pixel decode (zlib inflate + all
five scanline filters, png_decode below) — each driven through the
oracle gate by a synthesized corpus with closed-form expected values.
Only entropy-coded pixel data (JPEG, video) remains stubbed: those
genuinely need libjpeg/ffmpeg, which this container does not ship.

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
    """Decode an image/audio payload to pixels/samples. PNG and WAV are
    REAL (png_decode, parse_media_meta); entropy-coded formats (JPEG,
    video) still need libjpeg/ffmpeg and stay stubbed here."""
    if payload[:8] == _PNG_SIG:
        return png_decode(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(payload)) as wf:
            return wf.readframes(wf.getnframes())
    if not _REAL_CODECS_AVAILABLE:
        raise NotImplementedError(
            "entropy-coded pixel/sample codecs (JPEG, video) unavailable "
            "in this environment; PNG and WAV decode are real"
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


# -- REAL PNG pixel codec (pure stdlib zlib + numpy defiltering) -------------
# Pixel-level decode for PNG needs no external imaging lib: IDAT is zlib
# (RFC 1950) and scanline defiltering is five integer filters (PNG spec
# §9). Implemented here so the "decode" stage of the multimodal pipeline
# is REAL for PNG the way wave/audioop made it real for WAV; JPEG/video
# remain the honest stub in decode_media (their entropy coders genuinely
# need libjpeg/ffmpeg).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def png_encode(pixels, filter_mode: str = "cycle") -> bytes:
    """Minimal PNG writer for 8-bit grayscale/RGB numpy arrays (shape
    (h, w) or (h, w, 3)). filter_mode 'cycle' applies filter r % 5 to
    scanline r — deliberately exercising every PNG filter type so a
    decoder round-trip proves real defiltering, not just inflate."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    ch = 1 if px.ndim == 2 else px.shape[2]
    color_type = {1: 0, 3: 2}[ch]
    raw = px.reshape(h, w * ch).astype(np.int32)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    lines = bytearray()
    prior = np.zeros(w * ch, dtype=np.int32)
    for r in range(h):
        cur = raw[r]
        f = r % 5 if filter_mode == "cycle" else 0
        left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
        pleft = np.concatenate([np.zeros(ch, dtype=np.int32), prior[:-ch]])
        if f == 0:
            out = cur
        elif f == 1:
            out = cur - left
        elif f == 2:
            out = cur - prior
        elif f == 3:
            out = cur - (left + prior) // 2
        else:  # Paeth
            p = left + prior - pleft
            pa, pb, pc = abs(p - left), abs(p - prior), abs(p - pleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, pleft))
            out = cur - pred
        lines.append(f)
        lines.extend((out % 256).astype(np.uint8).tobytes())
        prior = cur

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def png_decode(payload: bytes):
    """REAL PNG pixel decode, stdlib-only: chunk walk, zlib inflate,
    full five-filter scanline defiltering (PNG spec §9: None/Sub/Up/
    Average/Paeth). Supports 8-bit depth, color types 0/2/4/6,
    non-interlaced. Returns an (h, w, channels) uint8 array; raises
    ValueError on anything else (caller quarantines)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i, idat, meta = 8, bytearray(), None
    while i + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[i : i + 4])
        tag = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            if len(body) < 13:  # short body is DATA -> ValueError, per contract
                raise ValueError("truncated IHDR")
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            if depth != 8 or color_type not in _PNG_CHANNELS or interlace:
                raise ValueError("unsupported PNG variant")
            meta = (w, h, _PNG_CHANNELS[color_type])
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        i += 12 + length
    if meta is None:
        raise ValueError("missing IHDR")
    w, h, ch = meta
    stride = w * ch
    try:
        data = zlib.decompress(bytes(idat))
    except zlib.error as e:  # torn/corrupt stream is DATA, not a crash
        raise ValueError(f"corrupt IDAT: {e}") from e
    if len(data) != h * (stride + 1):
        raise ValueError("truncated IDAT")
    out = np.zeros((h, stride), dtype=np.int32)
    prior = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = data[r * (stride + 1)]
        line = np.frombuffer(
            data, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:
            cur = (line + prior) % 256
        else:
            # Sub/Average/Paeth need the reconstructed left neighbor:
            # sequential per pixel within the scanline (scanlines are
            # short; payload-level parallelism comes from Arrow batches)
            cur = np.zeros(stride, dtype=np.int32)
            for j in range(stride):
                left = cur[j - ch] if j >= ch else 0
                up = prior[j]
                upleft = prior[j - ch] if j >= ch else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                elif f == 4:
                    p = left + up - upleft
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else upleft)
                else:
                    raise ValueError(f"bad filter {f}")
                cur[j] = (line[j] + pred) % 256
        out[r] = cur
        prior = cur
    return out.astype(np.uint8).reshape(h, w, ch)


PNG_PIXEL_SCHEMA = (
    "doc_id BIGINT, width INT, height INT, n_channels INT, "
    "pixel_sum BIGINT, px_min INT, px_max INT"
)


def synth_png_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic 8x8 grayscale PNG per document (FIXTURE for the
    codec path): pixel[r, c] = (doc_id * 7 + r * 8 + c) % 256, encoded
    with the filter-cycling writer so decode exercises all five PNG
    filters. Every probe output is a closed-form function of doc_id, so
    a SQL oracle checks the REAL inflate + defilter end-to-end."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = np.arange(64, dtype=np.int64).reshape(8, 8)
        for pdf in it:
            blobs = [
                png_encode(((int(d) * 7 + base) % 256).astype("uint8"))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": blobs})

    return docs.select("doc_id").mapInPandas(batches, "doc_id BIGINT, media BINARY")


def media_png_probe(media_df: DataFrame) -> DataFrame:
    """Arrow-batched REAL PNG pixel decode over the opaque media column:
    dimensions + integer pixel statistics (exact, oracle-checkable).
    Undecodable payloads are dropped here; production keeps them in a
    quarantine leg like the JSONL source does."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                try:
                    px = png_decode(bytes(blob))
                except ValueError:
                    continue
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "n_channels": px.shape[2],
                        "pixel_sum": int(px.astype("int64").sum()),
                        "px_min": int(px.min()),
                        "px_max": int(px.max()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_channels",
                    "pixel_sum", "px_min", "px_max",
                ],
            )

    return media_df.mapInPandas(batches, PNG_PIXEL_SCHEMA)


PNG_RESIZE_SCHEMA = (
    "doc_id BIGINT, out_width INT, out_height INT, "
    "ds_pixel_sum BIGINT, ds_min INT, ds_max INT"
)


def png_resize_probe(media_df: DataFrame, factor: int = 2) -> DataFrame:
    """The multimodal RESIZE step on REAL pixels: decode the PNG, box-
    average factor x factor blocks with integer floor division (exact,
    no float resampling ambiguity), report the downsampled image's
    stats. Same Arrow-batched mapInPandas shape as the probe — payload
    opaque until this step, dims/stats prunable columns after; at scale
    the thumbnail bytes would be re-encoded into a new binary column in
    the same pass. Undecodable or non-divisible images are dropped
    (quarantine leg in production)."""
    from collections.abc import Iterator as _Iterator

    def batches(it: _Iterator[pd.DataFrame]) -> _Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                try:
                    px = png_decode(bytes(blob))
                except ValueError:
                    continue
                h, w, ch = px.shape
                if h % factor or w % factor:
                    continue
                ds = (
                    px.astype("int64")
                    .reshape(h // factor, factor, w // factor, factor, ch)
                    .sum(axis=(1, 3))
                    // (factor * factor)
                )
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "out_width": w // factor,
                        "out_height": h // factor,
                        "ds_pixel_sum": int(ds.sum()),
                        "ds_min": int(ds.min()),
                        "ds_max": int(ds.max()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "out_width", "out_height",
                    "ds_pixel_sum", "ds_min", "ds_max",
                ],
            )

    return media_df.mapInPandas(batches, PNG_RESIZE_SCHEMA)
