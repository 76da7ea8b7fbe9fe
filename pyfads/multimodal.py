"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED: this container has no image/audio libraries, so
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless the
library import succeeds, and :func:`fake_decode_features` provides a
deterministic stand-in (byte stats + header-derived fake dimensions) so the
Spark-side plumbing — schema, batching, partitioning, UDF signatures — is
real and tested end-to-end.

Scale: mapInPandas streams Arrow batches; media bytes never leave the
executor, metadata-only projections prune the binary column entirely
(columnar parquet reads skip the blob pages), and per-file row groups keep
task sizes bounded via ``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "MEDIA_FEATURE_SCHEMA",
    "as_media",
    "decode_image",
    "fake_decode_features",
    "extract_media_features",
    "resize_media",
    "sample_frames",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("header_hash", T.StringType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
    ]
)


def as_media(df: DataFrame, id_col: str, bytes_col: "F.Column", fmt: str, source_col: str) -> DataFrame:
    """Wrap arbitrary bytes as the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        bytes_col.alias("content"),
        F.struct(
            F.lit(fmt).alias("format"),
            F.length(bytes_col).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def decode_image(content: bytes):
    """Real image decode — STUB: requires an image library not present in
    this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires PIL/pillow, not available in this environment; "
            "use fake_decode_features for plumbing tests"
        ) from e
    import io

    return Image.open(io.BytesIO(content))  # pragma: no cover


def fake_decode_features(content: bytes) -> tuple[str, int, int, float]:
    """Deterministic stand-in for a decoder: md5 of the first 16 header
    bytes, 'dimensions' read from the header bytes, mean byte value."""
    import hashlib

    if content is None or len(content) == 0:
        return ("", 0, 0, 0.0)
    header = content[:16]
    hh = hashlib.md5(header).hexdigest()
    w = 1 + (header[0] if len(header) > 0 else 0)
    h = 1 + (header[-1] if len(header) > 0 else 0)
    mean = float(sum(content)) / len(content)
    return (hh, int(w), int(h), mean)


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over media batches (Arrow transfer,
    never row-at-a-time)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode_features(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "header_hash": [f[0] for f in feats],
                    "fake_width": pd.array([f[1] for f in feats], dtype="int32"),
                    "fake_height": pd.array([f[2] for f in feats], dtype="int32"),
                    "byte_mean": [f[3] for f in feats],
                }
            )

    return media.mapInPandas(fn, MEDIA_FEATURE_SCHEMA)


def resize_media(media: DataFrame, target_w: int = 32, target_h: int = 32) -> DataFrame:
    """'Resize' plumbing: deterministic fake resample (a real decoder would
    decode → resample → re-encode; the Spark shape — mapInPandas over the
    canonical media schema, binary out, typed target dims — is identical).

    The fake keeps every ``stride``-th byte so output size tracks the
    target-pixel-count ratio, making size assertions meaningful in tests."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("target_w", T.IntegerType(), False),
            T.StructField("target_h", T.IntegerType(), False),
            T.StructField("n_bytes", T.LongType(), True),
        ]
    )
    target = max(target_w * target_h, 1)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes = []
            for content in pdf["content"]:
                if content is None or len(content) == 0:
                    out_bytes.append(b"")
                    continue
                stride = max(len(content) // target, 1)
                out_bytes.append(bytes(content[::stride][:target]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": out_bytes,
                    "target_w": pd.array([target_w] * len(pdf), dtype="int32"),
                    "target_h": pd.array([target_h] * len(pdf), dtype="int32"),
                    "n_bytes": [len(b) for b in out_bytes],
                }
            )

    return media.mapInPandas(fn, schema)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing: one row per sampled offset with a fixed
    byte window (a real video decoder would yield frames; shape identical)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                for j in range(min(max_frames, max(1, len(content) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(j)
                    frames.append(bytes(content[j * every_n_bytes : (j + 1) * every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame_bytes": frames}
            )

    return media.mapInPandas(fn, schema)
