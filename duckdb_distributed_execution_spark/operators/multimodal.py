"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Two decode paths:

- REAL (``decode_media_info`` / ``decode_stub=False``): dependency-free
  byte-level header parsing for five real container formats — PNG
  (IHDR), JPEG (SOF marker scan), GIF (logical screen descriptor),
  BMP (BITMAPINFOHEADER), WAV (RIFF fmt/data chunks) — exactly the
  fields a metadata pass over a media lake extracts (dimensions,
  channels, bit depth, sample rate, duration). Payload builders
  (``png_bytes`` …) emit format-conformant bytes (PNG chunk CRCs are
  real zlib.crc32; WAV files are fully valid PCM) so the parser can be
  oracle-checked end-to-end by round-trip: synthesize from parameters,
  decode, compare against the same parameters recomputed in SQL.
- STUB (``decode_stub=True``): deterministic md5-seeded fake feature
  vector, kept for payloads that are NOT media bytes (e.g. UTF-8 text
  standing in for a payload column) and for pixel-level decode, which
  genuinely needs image/audio libraries this container lacks.

At 100 TB: binary payloads ride in parquet row groups; mapInPandas
processes one Arrow batch at a time (bounded executor memory —
``spark.sql.execution.arrow.maxRecordsPerBatch`` controls peak), and
nothing ever collects to the driver.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("crc32", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(df: DataFrame, src_col: str, id_col: str) -> DataFrame:
    """Model a multimodal table: (media_id, payload binary, meta...).
    Here the payload is the UTF-8 bytes of a text column — the schema
    and partitioning are exactly what real image bytes would use."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(src_col).cast("binary").alias("payload"),
    )


def extract_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata over binary payloads — pure column functions
    (no Python): byte length, head bytes hex, crc32, md5."""
    return media.select(
        "media_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.upper(F.substring(F.hex("payload"), 1, 8)).alias("head_hex"),
        F.crc32("payload").cast("long").alias("crc32"),
        F.md5("payload").alias("content_md5"),
    )


_FMT_CODES = {"png": 1, "jpeg": 2, "gif": 3, "bmp": 4, "wav": 5, "unknown": 0}


def _decode_one(payload: bytes, dim: int, stub: bool) -> list[float]:
    if not stub:
        # REAL decode: byte-level header parsing (parse_media_header
        # below) -> typed-metadata feature vector. All components are
        # integer-valued, hence float32-exact and oracle-checkable.
        # Pixel/sample-level embeddings would need image/audio libs
        # this container lacks; header fields are the honest subset.
        info = parse_media_header(payload)
        feats = [
            float(_FMT_CODES[info["format"]]),
            *(float(info[k] or 0) for k in (
                "width", "height", "channels", "bit_depth",
                "sample_rate", "n_samples")),
            float(len(payload)),
        ]
        return (feats + [0.0] * dim)[:dim]
    # Deterministic fake: md5-seeded byte folding — stable feature
    # vector with the same shape a real encoder would emit. Values are
    # integer-valued (0..255) so they are exact in float32, which lets
    # the DuckDB oracle verify the Arrow/mapInPandas plumbing
    # bit-exactly (queries/llm.py multimodal_features).
    h = hashlib.md5(payload).digest()
    return [float((h[i % 16] * 31 + 7 * i) % 256) for i in range(dim)]


def extract_features(
    media: DataFrame, dim: int = 16, decode_stub: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.
    mapInPandas: one pandas batch in, one out — never row-at-a-time."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL/NaN payloads quarantine to the empty-bytes feature
            # like corrupt bytes do — bytes(None) would raise and fail
            # the whole task (same guard as decode_media_info).
            feats = [
                _decode_one(bytes(p), dim, decode_stub)
                if isinstance(p, (bytes, bytearray, memoryview))
                else _decode_one(b"", dim, decode_stub)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats}
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Real media bytes: format-conformant builders + header parsers
# ---------------------------------------------------------------------------

MEDIA_INFO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("bit_depth", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_bytes(width: int, height: int, bit_depth: int = 8,
              color_type: int = 2) -> bytes:
    """Structurally valid PNG: signature, IHDR (real CRC), a real zlib
    IDAT raster, IEND. color_type 2 = truecolor (3 channels).

    The raster is a deterministic gradient over a capped
    min(width,8) x min(height,8) grid (capping keeps synthetic
    payloads tiny at any declared dimensions): pixel channel value =
    7*x + 13*y + 31*c, filter type 0 per scanline. Every value stays
    < 256 at the 8x8 cap, so content stats (sum/min/max over the
    decompressed stream) have an exact closed form the DuckDB oracle
    recomputes from (width, height) alone — which is what lets
    decode_media_content be hash-checked end-to-end through a REAL
    zlib inflate."""
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    rw, rh = min(width, 8), min(height, 8)
    raster = b"".join(
        b"\x00"  # filter type 0
        + bytes(7 * x + 13 * y + 31 * c for x in range(rw) for c in range(3))
        for y in range(rh)
    )
    idat = zlib.compress(raster)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def jpeg_bytes(width: int, height: int, n_components: int = 3) -> bytes:
    """JPEG with SOI, JFIF APP0, a COM segment (so the SOF scan must
    actually walk markers), SOF0 baseline frame header, EOI."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    com = b"synthetic"
    comps = b"".join(
        struct.pack("BBB", i + 1, 0x11, 0) for i in range(n_components)
    )
    sof0 = struct.pack(">BHHB", 8, height, width, n_components) + comps
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xfe" + struct.pack(">H", 2 + len(com)) + com
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0
        + b"\xff\xd9"
    )


def gif_bytes(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer."""
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + b"\x70\x00\x00"  # no global color table, 8-bit color resolution
        + b"\x3b"
    )


def bmp_bytes(width: int, height: int, bits: int = 24) -> bytes:
    """BMP with BITMAPFILEHEADER + BITMAPINFOHEADER, no pixel data
    beyond a single padded row."""
    row = (width * (bits // 8) + 3) // 4 * 4
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bits, 0,
                       row * abs(height), 2835, 2835, 0, 0)
    off = 14 + 40
    return (
        b"BM" + struct.pack("<IHHI", off + row, 0, 0, off)
        + info + b"\x00" * row
    )


def wav_bytes(sample_rate: int, n_samples: int, channels: int = 1,
              bits: int = 16) -> bytes:
    """Fully valid PCM WAV: RIFF/WAVE, fmt chunk, data chunk whose
    payload is a deterministic sawtooth."""
    block = channels * bits // 8
    data = b"".join(
        struct.pack("<h", (i * 257) % 32768 - 16384) * channels
        for i in range(n_samples)
    )
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
     0xCD, 0xCE, 0xCF]
)


def parse_media_header(b: bytes) -> dict:
    """Sniff the container format from magic bytes and parse the real
    header fields. Returns format plus whichever of width/height/
    channels/bit_depth/sample_rate/n_samples the format carries (the
    rest None). Unknown/corrupt payloads -> format='unknown', no
    raise: a 100 TB media lake always contains garbage rows and a
    decode pass must quarantine, not die."""
    none = {"width": None, "height": None, "channels": None,
            "bit_depth": None, "sample_rate": None, "n_samples": None}
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", b[16:26])
            nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
            return {"format": "png", **none, "width": w, "height": h,
                    "channels": nch, "bit_depth": depth}
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker == 0xD9:  # EOI
                    break
                if marker in _SOF_MARKERS:
                    depth, h, w, nc = struct.unpack(">BHHB", b[i + 4:i + 10])
                    return {"format": "jpeg", **none, "width": w,
                            "height": h, "channels": nc, "bit_depth": depth}
                seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
                i += 2 + seglen
            return {"format": "jpeg", **none}
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            return {"format": "gif", **none, "width": w, "height": h}
        if b[:2] == b"BM" and len(b) >= 30:
            w, h = struct.unpack("<ii", b[18:26])
            bits = struct.unpack("<H", b[28:30])[0]
            return {"format": "bmp", **none, "width": w, "height": abs(h),
                    "channels": bits // 8, "bit_depth": 8}
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i, rate, nch, bits, nsamp = 12, None, None, None, None
            while i + 8 <= len(b):
                tag = b[i:i + 4]
                size = struct.unpack("<I", b[i + 4:i + 8])[0]
                if tag == b"fmt ":
                    _, nch, rate, _, block, bits = struct.unpack(
                        "<HHIIHH", b[i + 8:i + 24]
                    )
                elif tag == b"data" and nch:
                    nsamp = size // (nch * bits // 8)
                i += 8 + size + (size & 1)
            return {"format": "wav", **none, "channels": nch,
                    "bit_depth": bits, "sample_rate": rate,
                    "n_samples": nsamp}
    except (struct.error, IndexError):
        pass
    return {"format": "unknown", **none}


def decode_media_info(media: DataFrame, payload_col: str = "payload",
                      id_col: str = "media_id") -> DataFrame:
    """REAL media decode over binary payloads: one Arrow batch at a
    time through mapInPandas, byte-level header parsing per row (no
    stub, no external libraries). North-star operator — the reference
    engine has no multimodal surface."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        unknown = parse_media_header(b"")
        for pdf in batches:
            # NULL/NaN payloads quarantine to 'unknown' like corrupt
            # bytes do — bytes(None) would raise and fail the task.
            rows = [
                parse_media_header(bytes(p)) if isinstance(p, (bytes, bytearray, memoryview)) else dict(unknown)
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf[id_col].values)
            yield out.astype(object).where(out.notna(), None)

    return media.mapInPandas(run, schema=MEDIA_INFO_SCHEMA)


MEDIA_CONTENT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_values", T.LongType()),
        T.StructField("value_sum", T.LongType()),
        T.StructField("value_min", T.LongType()),
        T.StructField("value_max", T.LongType()),
    ]
)


def parse_media_content(b: bytes) -> dict:
    """CONTENT-level decode (round-3 'What's missing' #3) — beyond the
    header fields, actually decode the payload data:

    - PNG: concatenate IDAT chunk bodies, zlib-INFLATE them (real
      decompression, stdlib zlib — no image libs needed), and report
      byte stats over the decompressed scanline stream (filter bytes
      included; they are part of the raw raster stream).
    - WAV: walk RIFF chunks to the data chunk and decode the PCM
      payload as little-endian int16 samples; report sample stats.
    - BMP: byte stats over the pixel array after the declared data
      offset.
    - JPEG/GIF (no payload data in the synthetic corpus) and anything
      unparseable: n_values = 0, null stats — quarantine, not die.

    Returned stats are integers (exact cross-engine compare)."""
    none = {"n_values": 0, "value_sum": None, "value_min": None,
            "value_max": None}
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            i, idat = 8, []
            while i + 8 <= len(b):
                (size,) = struct.unpack(">I", b[i:i + 4])
                tag = b[i + 4:i + 8]
                if tag == b"IDAT":
                    idat.append(b[i + 8:i + 8 + size])
                if tag == b"IEND":
                    break
                i += 12 + size
            raw = zlib.decompress(b"".join(idat))
            vals = list(raw)
            return {"format": "png", "n_values": len(vals),
                    "value_sum": sum(vals), "value_min": min(vals),
                    "value_max": max(vals)}
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            while i + 8 <= len(b):
                tag = b[i:i + 4]
                (size,) = struct.unpack("<I", b[i + 4:i + 8])
                if tag == b"data":
                    n = size // 2
                    vals = struct.unpack(f"<{n}h", b[i + 8:i + 8 + n * 2])
                    return {"format": "wav", "n_values": n,
                            "value_sum": sum(vals), "value_min": min(vals),
                            "value_max": max(vals)}
                i += 8 + size + (size & 1)
        if b[:2] == b"BM" and len(b) >= 14:
            (off,) = struct.unpack("<I", b[10:14])
            vals = list(b[off:])
            if vals:
                return {"format": "bmp", "n_values": len(vals),
                        "value_sum": sum(vals), "value_min": min(vals),
                        "value_max": max(vals)}
            return {"format": "bmp", **none}
        if b[:2] == b"\xff\xd8":
            return {"format": "jpeg", **none}
        if b[:6] in (b"GIF87a", b"GIF89a"):
            return {"format": "gif", **none}
    except (struct.error, IndexError, ValueError, zlib.error):
        pass
    return {"format": "unknown", **none}


def decode_media_content(media: DataFrame, payload_col: str = "payload",
                         id_col: str = "media_id") -> DataFrame:
    """Arrow-batched content decode: real zlib inflate for PNG rasters,
    int16 PCM decode for WAV — see parse_media_content."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        unknown = parse_media_content(b"")
        for pdf in batches:
            rows = [
                parse_media_content(bytes(p))
                if isinstance(p, (bytes, bytearray, memoryview))
                else dict(unknown)
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf[id_col].values)
            yield out.astype(object).where(out.notna(), None)

    return media.mapInPandas(run, schema=MEDIA_CONTENT_SCHEMA)


_SYNTH_KINDS = ("png", "jpeg", "gif", "bmp", "wav")


def synth_media_payload(media_id: int) -> bytes:
    """Deterministic format-conformant payload for a media id: format
    cycles png/jpeg/gif/bmp/wav; dimensions / rates derive from the id
    with plain integer arithmetic so an oracle can recompute the
    expected decoded fields without touching bytes."""
    kind = _SYNTH_KINDS[media_id % 5]
    w = 1 + media_id % 640
    h = 1 + media_id % 480
    if kind == "png":
        return png_bytes(w, h)
    if kind == "jpeg":
        return jpeg_bytes(w, h)
    if kind == "gif":
        return gif_bytes(w, h)
    if kind == "bmp":
        return bmp_bytes(w, h)
    return wav_bytes(8000 + (media_id % 8) * 1000, 8 + media_id % 32)


def synth_media(df: DataFrame, id_col: str) -> DataFrame:
    """(media_id, payload) with real synthesized media bytes, built
    partition-parallel in Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"media_id": ids,
                 "payload": [synth_media_payload(int(i)) for i in ids]}
            )

    return df.select(F.col(id_col)).mapInPandas(
        run,
        schema=T.StructType(
            [T.StructField("media_id", T.LongType()),
             T.StructField("payload", T.BinaryType())]
        ),
    )
