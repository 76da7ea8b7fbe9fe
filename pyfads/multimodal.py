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
    "real_decode_features",
    "extract_media_features",
    "resize_media",
    "sample_frames",
    "image_dhash",
    "image_ahash",
    "image_neardup_pairs",
    "audio_fingerprint",
    "audio_neardup_pairs",
    "video_frame_neardup",
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


def _has_pil() -> bool:
    try:
        from PIL import Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(content: bytes):
    """Real image decode — gated on PIL being installed (it is not in this
    container; the deterministic fake keeps plumbing testable)."""
    if not _has_pil():
        raise NotImplementedError(
            "image decoding requires PIL/pillow, not available in this environment; "
            "use fake_decode_features for plumbing tests"
        )
    import io

    from PIL import Image

    return Image.open(io.BytesIO(content))  # pragma: no cover


def real_decode_features(content: bytes) -> tuple[str, int, int, float]:
    """PIL-backed twin of :func:`fake_decode_features`: same output shape
    (header md5, width, height, mean), real pixel values."""
    import hashlib

    import numpy as np

    if content is None or len(content) == 0:
        return ("", 0, 0, 0.0)
    img = decode_image(content)
    arr = np.asarray(img.convert("L"), dtype=np.float64)
    return (
        hashlib.md5(content[:16]).hexdigest(),
        int(img.width),
        int(img.height),
        float(arr.mean()) if arr.size else 0.0,
    )


def _pick_decoder(decoder: str):
    """'fake' (default — deterministic, oracle-stable), 'real' (PIL,
    raises here if absent), or 'auto' (real when PIL exists, else fake).
    Resolved lazily inside the executor closure so only the mode string is
    pickled, and each worker probes its own environment."""
    if decoder not in ("fake", "real", "auto"):
        raise ValueError(f"decoder must be fake|real|auto, got {decoder!r}")
    if decoder == "real" and not _has_pil():
        raise NotImplementedError("decoder='real' requires PIL/pillow")

    def resolve():
        if decoder == "fake" or (decoder == "auto" and not _has_pil()):
            return fake_decode_features
        return real_decode_features

    return resolve


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


def extract_media_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """mapInPandas feature extraction over media batches (Arrow transfer,
    never row-at-a-time).  ``decoder``: see :func:`_pick_decoder` — the
    registered CORRECTNESS query pins 'fake' so the oracle stays
    deterministic whether or not PIL is installed."""
    resolve = _pick_decoder(decoder)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = resolve()
        for pdf in batches:
            feats = [decode(c) for c in pdf["content"]]
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


def resize_media(
    media: DataFrame, target_w: int = 32, target_h: int = 32, decoder: str = "fake"
) -> DataFrame:
    """Resize: with ``decoder='real'``/'auto'+PIL, decode → LANCZOS resample
    → PNG re-encode; the default fake resample keeps every ``stride``-th
    byte so output size tracks the target-pixel-count ratio (deterministic,
    oracle-stable, same Spark shape — mapInPandas over the canonical media
    schema, binary out, typed target dims)."""
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
    resolve = _pick_decoder(decoder)

    def _fake_resize(content: bytes) -> bytes:
        stride = max(len(content) // target, 1)
        return bytes(content[::stride][:target])

    def _real_resize(content: bytes) -> bytes:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(content))
        out = io.BytesIO()
        img.resize((target_w, target_h), Image.LANCZOS).save(out, format="PNG")
        return out.getvalue()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resize = _fake_resize if resolve() is fake_decode_features else _real_resize
        for pdf in batches:
            out_bytes = []
            for content in pdf["content"]:
                if content is None or len(content) == 0:
                    out_bytes.append(b"")
                    continue
                out_bytes.append(resize(content))
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


_DHASH_W, _DHASH_H = 9, 8  # 9x8 grayscale -> 8x8 horizontal gradients = 64 bits
_DHASH_PIXELS = _DHASH_W * _DHASH_H
_DHASH_BANDS = 4  # 4 x 16-bit bands for the LSH-style candidate join


def _dhash_bands_from_pixels(px) -> "tuple[int, int, int, int]":
    """64 dHash gradient bits (row-major: bit r*8+c set iff
    px[r][c] > px[r][c+1]) packed into four 16-bit band values.  Bands
    instead of one 64-bit int: band equality is the banding join key, and
    bit 63 would overflow a signed BIGINT's positive range."""
    bands = [0, 0, 0, 0]
    for idx in range(64):
        r, c = divmod(idx, 8)
        if px[r * _DHASH_W + c] > px[r * _DHASH_W + c + 1]:
            bands[idx // 16] |= 1 << (idx % 16)
    return tuple(bands)


def _fake_gray_pixels(content: bytes) -> "list[int]":
    """Deterministic stand-in for decode+resize to 9x8 grayscale: every
    ``stride``-th byte (the :func:`resize_media` fake-resample rule),
    zero-padded — oracle-stable (DuckDB replays it with ord/substr)."""
    stride = max(len(content) // _DHASH_PIXELS, 1)
    px = list(content[::stride][:_DHASH_PIXELS])
    return px + [0] * (_DHASH_PIXELS - len(px))


def image_dhash(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Perceptual dHash signature per media row (the image twin of
    SimHash): decode -> 9x8 grayscale -> 64 horizontal-gradient bits,
    packed as four 16-bit bands ``(media_id, b0, b1, b2, b3)``.

    dHash is robust to re-encode/resize/brightness shifts because it keeps
    only the SIGN of adjacent-pixel gradients.  With ``decoder='real'``
    (PIL) the 9x8 comes from convert('L') + LANCZOS resize; the default
    deterministic fake (this container has no image codecs) stride-samples
    the bytes like :func:`resize_media`, keeping the Spark plumbing and
    the banding math identical and oracle-checkable.

    Scale shape: one Arrow-batched ``mapInPandas`` pass, bytes never leave
    the executor; the output is 4 ints + an id per image.
    """
    schema = T.StructType(
        [T.StructField("media_id", T.LongType(), False)]
        + [T.StructField(f"b{i}", T.IntegerType(), False) for i in range(_DHASH_BANDS)]
    )
    resolve = _pick_decoder(decoder)

    def _real_pixels(content: bytes) -> "list[int]":
        import io

        import numpy as np
        from PIL import Image

        img = Image.open(io.BytesIO(content)).convert("L")
        arr = np.asarray(
            img.resize((_DHASH_W, _DHASH_H), Image.LANCZOS), dtype=np.int64
        )
        return [int(x) for x in arr.reshape(-1)]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pixels = (
            _fake_gray_pixels if resolve() is fake_decode_features else _real_pixels
        )
        for pdf in batches:
            out = {"media_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) == 0:
                    bands = (0, 0, 0, 0)
                else:
                    bands = _dhash_bands_from_pixels(pixels(bytes(content)))
                out["media_id"].append(mid)
                for i in range(_DHASH_BANDS):
                    out[f"b{i}"].append(bands[i])
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    **{
                        f"b{i}": pd.array(out[f"b{i}"], dtype="int32")
                        for i in range(_DHASH_BANDS)
                    },
                }
            )

    return media.mapInPandas(fn, schema)


def _ahash_bands_from_pixels(px) -> "tuple[int, int, int, int]":
    """64 aHash bits over an 8x8 pixel block (bit i set iff
    px[i] * 64 > sum(px) — the strict integer form of 'pixel above the
    block mean', no division so the comparison is exact) packed into four
    16-bit bands like the dHash packing."""
    px64 = px[:64]
    total = sum(px64)
    bands = [0, 0, 0, 0]
    for i in range(64):
        if px64[i] * 64 > total:
            bands[i // 16] |= 1 << (i % 16)
    return tuple(bands)


def image_ahash(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Perceptual aHash (average hash) signature per media row: decode ->
    8x8 grayscale -> bit per pixel above the block mean, packed as four
    16-bit bands ``(media_id, b0..b3)``.

    aHash complements :func:`image_dhash` the way SimHash complements
    MinHash: dHash keys on local gradients (robust to global brightness),
    aHash on global structure (robust to local noise); perceptual-dedup
    pipelines run both and union the candidate pairs.  The mean test is
    the integer cross-multiplication ``px*64 > sum`` so both engines
    compare exactly; the 8x8 block is the first 64 of the same 72
    stride-sampled 'pixels' the dHash fake path uses (real-PIL path
    resizes to 8x8 directly).
    """
    schema = T.StructType(
        [T.StructField("media_id", T.LongType(), False)]
        + [T.StructField(f"b{i}", T.IntegerType(), False) for i in range(_DHASH_BANDS)]
    )
    resolve = _pick_decoder(decoder)

    def _real_pixels(content: bytes) -> "list[int]":
        import io

        import numpy as np
        from PIL import Image

        img = Image.open(io.BytesIO(content)).convert("L")
        arr = np.asarray(img.resize((8, 8), Image.LANCZOS), dtype=np.int64)
        return [int(x) for x in arr.reshape(-1)]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pixels = (
            _fake_gray_pixels if resolve() is fake_decode_features else _real_pixels
        )
        for pdf in batches:
            out = {"media_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) == 0:
                    bands = (0, 0, 0, 0)
                else:
                    bands = _ahash_bands_from_pixels(pixels(bytes(content)))
                out["media_id"].append(mid)
                for i in range(_DHASH_BANDS):
                    out[f"b{i}"].append(bands[i])
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    **{
                        f"b{i}": pd.array(out[f"b{i}"], dtype="int32")
                        for i in range(_DHASH_BANDS)
                    },
                }
            )

    return media.mapInPandas(fn, schema)


def _banded_hamming_pairs(
    sigs: DataFrame,
    max_hamming: int,
    max_bucket: "int | None",
    id_col: str = "media_id",
) -> DataFrame:
    """Shared banding join for the 4x16-bit perceptual signatures
    (image dHash, audio fingerprint): explode the 4 bands, salt-cap hot
    buckets, self-join on (band_idx, band_value), verify exact Hamming.
    By pigeonhole the banding has perfect recall at ``max_hamming`` < 4
    (one fix lands in every modality — code-review r8 #7)."""
    if max_hamming >= _DHASH_BANDS:
        raise ValueError("banding guarantees recall only for max_hamming < 4 bands")
    from pyfads.dedup import _salt_cap

    banded = sigs.select(
        id_col,
        *[f"b{i}" for i in range(_DHASH_BANDS)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.col(f"b{i}").cast("string").alias("band_key"),
                    )
                    for i in range(_DHASH_BANDS)
                ]
            )
        ).alias("__b"),
    ).select(
        id_col,
        *[f"b{i}" for i in range(_DHASH_BANDS)],
        "__b.band_idx",
        "__b.band_key",
    )
    if max_bucket is not None:
        banded = _salt_cap(banded, id_col, "band_key", max_bucket, "band_idx")
    a = banded.select(
        F.col(id_col).alias("a_id"),
        *[F.col(f"b{i}").alias(f"__a{i}") for i in range(_DHASH_BANDS)],
        "band_idx",
        "band_key",
    )
    b = banded.select(
        F.col(id_col).alias("b_id"),
        *[F.col(f"b{i}").alias(f"__b{i}") for i in range(_DHASH_BANDS)],
        "band_idx",
        "band_key",
    )
    hamming = sum(
        F.bit_count(F.col(f"__a{i}").bitwiseXOR(F.col(f"__b{i}")))
        for i in range(_DHASH_BANDS)
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def image_neardup_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    max_bucket: "int | None" = 64,
    decoder: str = "fake",
) -> DataFrame:
    """Perceptual image near-dup pairs: dHash signatures, banded candidate
    join, exact Hamming verify — the multimodal member of the near-dup
    family (MinHash for token sets, SimHash for term vectors, dHash for
    pixels).

    By pigeonhole, Hamming distance <= ``max_hamming`` < 4 bands forces
    exact agreement on at least one 16-bit band, so banding has perfect
    recall at the default ``max_hamming=3``; the join is an equi-join on
    (band_idx, band_value) — never all-pairs — with the same hot-bucket
    salt cap as every near-dup pipeline here (flat images collide on band
    values far more than md5 keys do).  Verify is
    ``sum(bit_count(a.b_i XOR b.b_i)) <= max_hamming``.
    """
    return _banded_hamming_pairs(image_dhash(media, decoder), max_hamming, max_bucket)


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


def video_frame_neardup(
    media: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    min_shared: int = 2,
) -> DataFrame:
    """Video near-dup pairs by shared-frame fingerprints (the shot-hash
    method: sample frames, hash each, match videos on common shot
    hashes): two media rows pair when they share at least ``min_shared``
    distinct sampled-frame hashes.  Returns ``(a_id, b_id,
    shared_frames)``.

    Completes the near-dup family's third modality (image: dHash bands,
    audio: energy-delta fingerprint, video: frame-set overlap).  This is
    the exact-aligned variant — frames are fixed windows from the clip
    start, so content shared at DIFFERENT offsets needs the CDC treatment
    (:func:`pyfads.dedup.cdc_duplicate_pairs` shows that shape); real
    video frames are decode-anchored, making alignment a non-issue there.

    Scale: frames explode bounded at ``max_frames`` per clip; the pair
    join is an equi-join on the 16-byte frame hash (the CDC-pairs shape,
    never all-pairs); the per-pair count is a map-side-combinable agg.
    """
    frames = sample_frames(media, every_n_bytes, max_frames)
    fh = frames.select(
        "media_id", F.md5("frame_bytes").alias("fh")
    ).distinct()
    a = fh.select(F.col("media_id").alias("a_id"), "fh")
    b = fh.select(F.col("media_id").alias("b_id"), "fh")
    return (
        a.join(b, "fh")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_frames"))
        .filter(F.col("shared_frames") >= min_shared)
    )


# --------------------------------------------------------------------------
# Audio: REAL decode for PCM WAV — RIFF/PCM needs only stdlib `wave` +
# numpy, so unlike images this path is fully functional in this container
# (no codec libraries involved).
# --------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
    ]
)


def decode_wav(content: bytes):
    """Decode PCM WAV bytes -> (sample_rate, n_channels, samples float64).

    8-bit WAV is unsigned (re-centered to 0), 16/32-bit signed; samples are
    interleaved when multi-channel.  Raises ``wave.Error`` on non-PCM or
    malformed RIFF — callers surface that per row rather than failing the
    task (see :func:`audio_features`)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(content)) as w:
        raw = w.readframes(w.getnframes())
        width = w.getsampwidth()
        dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}[width]
        samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
        if width == 1:
            samples = samples - 128.0
        return w.getframerate(), w.getnchannels(), samples


def audio_features(media: DataFrame) -> DataFrame:
    """Per-media audio features via real WAV decode inside ``mapInPandas``:
    (sample_rate, channels, frames, duration, rms, peak).  Undecodable or
    empty content yields a zero row (sample_rate=0 marks it) instead of
    failing the task — the 100 TB posture for dirty corpora.  Bytes stay
    executor-side; the Arrow batch carries only the feature columns back.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = [f.name for f in AUDIO_FEATURE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    if content is None or len(content) == 0:
                        raise ValueError("empty")
                    sr, nch, s = decode_wav(bytes(content))
                    frames = len(s) // max(nch, 1)
                    rms = float(np.sqrt((s**2).mean())) if s.size else 0.0
                    peak = float(np.abs(s).max()) if s.size else 0.0
                    rows.append(
                        (mid, sr, nch, frames, frames / sr if sr else 0.0, rms, peak)
                    )
                except Exception:
                    rows.append((mid, 0, 0, 0, 0.0, 0.0, 0.0))
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "content").mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def text_to_wav(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rate: int = 8000,
) -> DataFrame:
    """Deterministic text -> PCM-WAV encoding for decode-pipeline tests and
    oracles: each byte b becomes one mono 16-bit sample ``(b-64)*256``
    (ASCII 32..126 maps well inside int16).  Because the sample stream is a
    pure function of the text bytes, an engine with no audio stack (DuckDB)
    can recompute every downstream feature analytically — which is what
    makes :func:`audio_features` oracle-checkable end-to-end.

    CONTRACT: text must be ASCII — enforced with a loud UnicodeEncodeError
    rather than assumed (ADVICE r5): under UTF-8 a non-ASCII char is
    multiple bytes >= 0xC2, so (b-64)*256 would wrap int16 on the Spark
    side while a per-codepoint SQL oracle sees one sample per CHAR —
    silent parity drift.  Callers feeding arbitrary corpora filter first
    (``octet_length(text) = length(text)`` selects exactly the ASCII
    rows in both Spark and DuckDB — see llm_queries.media_audio_q)."""

    @F.pandas_udf(T.BinaryType())
    def enc(texts: pd.Series) -> pd.Series:
        import io
        import wave

        import numpy as np

        out = []
        for t in texts:
            b = np.frombuffer(t.encode("ascii"), dtype=np.uint8).astype(np.int64)
            samples = ((b - 64) * 256).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(rate)
                w.writeframes(samples.tobytes())
            out.append(buf.getvalue())
        return pd.Series(out)

    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        enc(F.col(text_col)).alias("content"),
    )


_AFP_FRAMES = 65  # 65 energies -> 64 delta bits -> 4 x 16-bit bands


def _delta_bands(vals) -> "tuple[int, int, int, int]":
    """64 delta-sign bits (bit i set iff vals[i] > vals[i+1]) packed into
    four 16-bit bands — the 1-D audio analogue of the dHash packing."""
    bands = [0, 0, 0, 0]
    for i in range(64):
        if vals[i] > vals[i + 1]:
            bands[i // 16] |= 1 << (i % 16)
    return tuple(bands)


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Perceptual audio fingerprint over PCM WAV bytes, REAL decode (the
    chromaprint/Shazam shape reduced to its portable core): decode ->
    65 fixed frames -> per-frame energy -> 64 energy-delta sign bits as
    four 16-bit bands ``(media_id, b0..b3, n_frames)``.

    Delta SIGNS survive gain changes and re-encoding (the same reason
    dHash keeps gradient signs); frame energies are INTEGER sums of
    squared int16 samples (exact in int64), so the fingerprint is
    bit-reproducible and the DuckDB oracle recomputes it analytically
    from the text_to_wav contract.  Multi-channel clips are mixed down
    to mono by integer channel sum before framing (gain-irrelevant under
    delta signs).  Frame length is ``max(n//65, 1)`` samples; frames
    past the signal contribute zero energy, trailing remainder samples
    are ignored (documented framing, not a bug).

    Undecodable/empty content yields the all-zero fingerprint with
    ``n_frames = -1`` marking the failure — per-row surfacing, never a
    task failure (the dirty-corpus posture of :func:`audio_features`).

    Scale: one Arrow-batched ``mapInPandas`` pass; bytes stay
    executor-side, 4 ints + 2 longs come back per clip.
    """
    schema = T.StructType(
        [T.StructField("media_id", T.LongType(), False)]
        + [T.StructField(f"b{i}", T.IntegerType(), False) for i in range(4)]
        + [T.StructField("n_frames", T.LongType(), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"media_id": [], "b0": [], "b1": [], "b2": [], "b3": [], "n_frames": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    if content is None or len(content) == 0:
                        raise ValueError("empty")
                    _, nch, s = decode_wav(bytes(content))
                    s = s.astype(np.int64)
                    # decode_wav returns INTERLEAVED samples: mix down to
                    # mono (integer channel sum — exact, and a no-op for
                    # mono) BEFORE framing, so multi-channel clips frame
                    # the full duration instead of the first 1/nch with
                    # channel-mixed windows (code-review r8 #2)
                    nch = max(nch, 1)
                    if nch > 1:
                        s = s[: (len(s) // nch) * nch].reshape(-1, nch).sum(axis=1)
                    n = len(s)
                    L = max(n // _AFP_FRAMES, 1)
                    e = [
                        int((s[j * L : (j + 1) * L] ** 2).sum())
                        for j in range(_AFP_FRAMES)
                    ]
                    bands = _delta_bands(e)
                except Exception:
                    bands, n = (0, 0, 0, 0), -1
                out["media_id"].append(mid)
                for i in range(4):
                    out[f"b{i}"].append(bands[i])
                out["n_frames"].append(n)
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    **{f"b{i}": pd.array(out[f"b{i}"], dtype="int32") for i in range(4)},
                    "n_frames": pd.array(out["n_frames"], dtype="int64"),
                }
            )

    return media.mapInPandas(run, schema)


def audio_neardup_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    max_bucket: "int | None" = 64,
) -> DataFrame:
    """Audio near-dup pairs over :func:`audio_fingerprint` signatures:
    banded candidate equi-join (pigeonhole-perfect recall at
    ``max_hamming`` < 4 bands) + exact Hamming verify — the audio member
    of the near-dup family (MinHash: token sets, SimHash: term vectors,
    dHash: pixels, this: PCM energy envelopes).  Failed decodes
    (n_frames = -1) are excluded before banding so the all-zero failure
    fingerprint never forms a giant bucket of mutual 'duplicates'."""
    return _banded_hamming_pairs(
        audio_fingerprint(media).filter(F.col("n_frames") >= 0), max_hamming, max_bucket
    )
