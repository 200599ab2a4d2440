"""Multimodal column conventions + processing plumbing.

Images/audio/video ride through the engine as opaque ``binary``
columns with a typed metadata struct alongside. The Spark-side
plumbing — schema convention, Arrow-batched ``mapInPandas`` transform
shape, partition sizing — is real and tested; the codec step itself is
STUBBED (this container ships no image/audio libraries): decode either
raises NotImplementedError (strict mode) or produces a deterministic
fake (plumbing-test mode).

Scale notes:
- binary payloads make rows wide: size partitions by bytes, not rows
  (``repartition_by_bytes``), or the Arrow batches blow executor
  memory. maxRecordsPerBatch is the second guard.
- metadata lives in a sibling struct column so filters (mime, width,
  duration) push down without touching payload bytes — parquet reads
  the binary column only for surviving rows.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "media_table_schema",
    "attach_media_metadata",
    "decode_image_batch",
    "extract_image_features",
    "resize_images",
    "sample_video_frames",
    "repartition_by_bytes",
]

#: Metadata struct carried next to every binary payload column.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def media_table_schema(id_type: T.DataType = T.LongType()) -> T.StructType:
    """Canonical multimodal table: (media_id, payload, meta)."""
    return T.StructType(
        [
            T.StructField("media_id", id_type),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_SCHEMA),
        ]
    )


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Compute payload-derived metadata JVM-side (no decode needed):
    byte length + sha256. Decode-derived fields (width/height) stay
    NULL until a decode pass fills them."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.sha2(F.col(payload_col), 256).alias("sha256"),
        ),
    )


_FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real image-feature extractor: 8
    floats derived from the sha256 digest. Same plumbing shape (bytes →
    fixed-dim vector) as a real model."""
    digest = hashlib.sha256(payload).digest()
    # doubles, exactly representable (numerator < 2^32): the SQL oracle
    # reproduces these bit-for-bit from sha256 hex substrings
    return [int.from_bytes(digest[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(_FEATURE_DIM)]


def decode_image_batch(payload: bytes) -> object:
    """STUB: real decode needs PIL/libvips, absent in this container."""
    raise NotImplementedError(
        "image decode requires an image library (PIL/pyvips); "
        "this environment ships none — use extract_image_features(fake=True) "
        "for plumbing tests"
    )


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas: executor-side, one pandas batch at a time — the real
    model would run exactly here, on the same batch shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                decode_image_batch(b"")  # raises NotImplementedError
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len),
                    "features": pdf[payload_col].map(_fake_features),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURES_SCHEMA)


def repartition_by_bytes(
    df: DataFrame, payload_col: str = "payload", target_partition_bytes: int = 128 << 20
) -> DataFrame:
    """Repartition a binary-payload table so each partition holds about
    ``target_partition_bytes`` of payload (rows are a bad proxy when
    payloads span 1 KB–100 MB)."""
    total = df.agg(F.sum(F.length(F.col(payload_col)))).collect()[0][0] or 0
    n = max(1, int(total / target_partition_bytes) + 1)
    return df.repartition(n)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Resize pass: binary in → binary out with target dims recorded.
    Real plumbing (Arrow batches, binary-safe round-trip, dims in
    output schema so downstream filters never decode); stubbed codec —
    fake mode emits a deterministic truncated/padded payload of
    width*height bytes, a real impl swaps `_fake_resize` for
    PIL/libvips on the same batch shape."""

    def _fake_resize(payload: bytes) -> bytes:
        target = width * height
        return (payload * (target // max(len(payload), 1) + 1))[:target]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                decode_image_batch(b"")
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": pdf[payload_col].map(_fake_resize),
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Frame sampling: one input row fans out to <= max_frames rows
    (media_id, frame_no, frame). The 1→N explode INSIDE mapInPandas is
    the part that matters at scale: output batches are built per input
    batch, so a 4 GB video never materializes all its frames at once.
    Fake mode slices the payload deterministically; a real impl swaps
    in pyav/ffmpeg keyframe extraction on the same contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                decode_image_batch(b"")
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                chunk = max(len(payload) // max(every_n, 1), 1)
                for i in range(min(max_frames, max(len(payload) // chunk, 1))):
                    ids.append(mid)
                    nos.append(i)
                    frames.append(bytes(payload[i * chunk : (i + 1) * chunk]))
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(run, FRAMES_SCHEMA)
