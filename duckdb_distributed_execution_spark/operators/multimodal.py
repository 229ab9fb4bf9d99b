"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema, partition-parallel batching, UDF
signatures — is real and tested. The actual media decode is STUBBED
(this container has no image/audio libraries): ``decode_stub=True``
produces a deterministic fake feature vector from the bytes, and
``decode_stub=False`` raises NotImplementedError where a real
PIL/ffmpeg call would go. Swapping in a real decoder changes only the
body of ``_decode_one``.

At 100 TB: binary payloads ride in parquet row groups; mapInPandas
processes one Arrow batch at a time (bounded executor memory —
``spark.sql.execution.arrow.maxRecordsPerBatch`` controls peak), and
nothing ever collects to the driver.
"""

from __future__ import annotations

import hashlib
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


def _decode_one(payload: bytes, dim: int, stub: bool) -> list[float]:
    if not stub:
        # Real decode goes here (PIL.Image.open / torchaudio / ffmpeg
        # frame sampling). Not available in this container.
        raise NotImplementedError(
            "media decode requires image/audio libraries not present; "
            "run with decode_stub=True for the deterministic fake"
        )
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
            feats = [
                _decode_one(bytes(p), dim, decode_stub) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats}
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
