"""Binary media columns with typed metadata + Pandas-UDF processing.

Design for 100 TB of media: the payload is an opaque ``binary`` column
living next to a typed metadata struct (mime, width/height, duration,
sample rate). All pipeline plumbing — schema, partitioning, Arrow batch
shape through ``mapInPandas`` — is real; only the codec step is stubbed
(image/audio libraries are not in this environment), clearly marked and
swappable: ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic byte-statistics "decode"
stands in so the distributed plumbing is testable end-to-end.

Why mapInPandas: media decode is per-row Python-library work, so the
Arrow-batched iterator path is the right boundary — one python worker
per partition, zero JVM round-trips per row, and the batch size knob
(``spark.sql.execution.arrow.maxRecordsPerBatch``) bounds memory for
large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata carried beside every media payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def media_struct(
    mime: str,
    width: int | None = None,
    height: int | None = None,
    duration_ms: int | None = None,
    sample_rate: int | None = None,
):
    """Literal metadata struct column."""
    return F.struct(
        F.lit(mime).alias("mime"),
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        F.lit(duration_ms).cast("bigint").alias("duration_ms"),
        F.lit(sample_rate).cast("int").alias("sample_rate"),
    )


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary payload + metadata from a text column.

    Test/demo helper: encodes the text as bytes (a stand-in for image
    data) and stamps synthetic metadata, so multimodal plumbing can be
    exercised on the documents table without real media files.
    """
    payload = F.encode(F.col(text_col), "utf-8").cast("binary")
    return df.withColumn("media", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            (F.length(payload) % 1024).cast("int").alias("width"),
            ((F.length(payload) * 7) % 768).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def decode_image(data: bytes, fake: bool = False) -> dict:
    """Decode an image payload to pixel statistics.

    PNG payloads decode for REAL via the built-in pure-stdlib codec
    (multimodal/png.py): actual de-filtered pixels out of actual zlib
    bytes. Baseline JPEG payloads decode for REAL too, via the
    pure-numpy codec (multimodal/jpeg.py): Huffman + dequant + IDCT +
    chroma upsample, grayscale and YCbCr up to 2x2 subsampling, restart
    intervals. Progressive JPEG, other formats (WebP, GIF, ...), and
    SIMD-speed decoding still want the PIL/cv2 swap-in here. With
    ``fake=True`` returns deterministic byte statistics with the same
    output contract, so the surrounding Spark plumbing stays testable
    for undecodable media.
    """
    if not fake:
        from .png import _SIGNATURE, decode_png

        if data.startswith(_SIGNATURE):
            width, height, channels, pixels = decode_png(data)
        elif data[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg

            width, height, channels, pixels = decode_jpeg(data)
        else:
            raise NotImplementedError(
                "only PNG and baseline JPEG decode without an image "
                "library; swap in PIL/cv2 here (decode_image) for real "
                "deployments"
            )
        n = max(len(pixels), 1)
        # numpy sum: a 12 MP decode is tens of MB of samples, and a
        # pure-Python byte loop here would dominate the whole batch
        total = int(np.frombuffer(pixels, dtype=np.uint8).sum(dtype=np.int64))
        # 'orientation' is present in EVERY return path (None when the
        # codec has no EXIF concept) so consumers building frames from
        # these dicts (pd.DataFrame(feats)) get a stable column set
        # regardless of the payload mix in a batch.
        out = {
            "n_bytes": len(pixels),
            "mean_byte": float(total / n),
            "hash_hi": int.from_bytes(hashlib.md5(pixels).digest()[:4], "big"),
            "width": width,
            "height": height,
            "channels": channels,
            "orientation": None,
        }
        if data[:2] == b"\xff\xd8":
            # Web corpora carry camera rotation as EXIF metadata, not
            # rotated pixels; surface it so pipelines can upright via
            # jpeg.apply_orientation before training (None = untagged).
            from .jpeg import exif_orientation

            out["orientation"] = exif_orientation(data)
        return out
    digest = hashlib.md5(data).digest()
    n = max(len(data), 1)
    total = int(np.frombuffer(data, dtype=np.uint8).sum(dtype=np.int64))
    return {
        "n_bytes": len(data),
        "mean_byte": float(total / n),
        "hash_hi": int.from_bytes(digest[:4], "big"),
        "orientation": None,
    }


def decode_audio(data: bytes, fake: bool = False) -> dict:
    """Decode an audio payload to duration/energy statistics.

    WAV (RIFF PCM16) payloads decode for REAL via the built-in
    pure-stdlib codec (multimodal/wav.py): actual interleaved samples
    out of actual container bytes. Compressed formats (MP3/AAC) raise
    ``NotImplementedError`` — swap pyav/ffmpeg into this function for
    real deployments. With ``fake=True`` returns deterministic byte
    statistics under the same contract so non-WAV plumbing stays
    testable.
    """
    if not fake:
        from .wav import audio_features

        if not data.startswith(b"RIFF"):
            raise NotImplementedError(
                "only WAV decodes without an audio library; "
                "swap in pyav/ffmpeg here (decode_audio) for real deployments"
            )
        return audio_features(data)
    digest = hashlib.md5(data).digest()
    n = max(len(data), 1)
    return {
        "sample_rate": 8000,
        "channels": 1,
        "n_frames": len(data) // 2,
        "duration_ms": (len(data) // 2) * 1000 // 8000,
        "sample_sum": int(np.frombuffer(data, dtype=np.uint8).sum(dtype=np.int64))
        - 127 * n,
        "abs_sum": int(
            np.abs(np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 127).sum()
        ),
        "peak": int.from_bytes(digest[:1], "big"),
    }


def resize_image(data: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """Resize an image payload to ``width``x``height``.

    PNG and baseline JPEG payloads resize for REAL: decode →
    nearest-neighbor resample → re-encode in the SAME format (the
    nearest-neighbor kernel in png.py is pixel-format-agnostic; JPEG
    re-encodes at quality 85). Other formats raise; with ``fake=True``
    produces a deterministic payload of exactly ``width*height`` bytes
    (md5-keyed byte stretch) so downstream size/metadata contracts are
    exercised for undecodable media. Swap PIL's ``Image.resize`` in
    here for real deployments.
    """
    if not fake:
        from .png import _SIGNATURE, decode_png, encode_png, resize_nearest

        if data.startswith(_SIGNATURE):
            w, h, ch, pixels = decode_png(data)
            return encode_png(
                width, height, ch, resize_nearest(pixels, w, h, ch, width, height)
            )
        if data[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg, encode_jpeg

            w, h, ch, pixels = decode_jpeg(data)
            return encode_jpeg(
                width, height, ch, resize_nearest(pixels, w, h, ch, width, height)
            )
        raise NotImplementedError(
            "only PNG and baseline JPEG resize without an image library; "
            "swap in PIL/cv2 here (resize_image) for real deployments"
        )
    seed = hashlib.md5(data).digest()
    n = width * height
    return (seed * (n // len(seed) + 1))[:n]


def sample_frames(data: bytes, n_frames: int, fake: bool = False) -> list[bytes]:
    """Sample ``n_frames`` evenly-spaced frames from a video payload.

    PNGV payloads (multimodal/video.py — length-prefixed real PNG
    frames) sample for REAL: exact integer-spaced indices into actual
    decoded container framing. Other containers (mp4 etc.) raise
    ``NotImplementedError`` — swap pyav/ffmpeg into this function for
    real deployments. With ``fake=True`` each frame is a deterministic
    md5-derived slice keyed by (payload, frame index) so non-PNGV
    plumbing stays testable.
    """
    if not fake:
        from .video import MAGIC, sample_pngv

        if data.startswith(MAGIC):
            return [png for _, png in sample_pngv(data, n_frames)]
        raise NotImplementedError(
            "only PNGV containers decode without a video library; "
            "swap in pyav/ffmpeg here (sample_frames) for real deployments"
        )
    return [
        hashlib.md5(data + i.to_bytes(4, "big")).digest() for i in range(n_frames)
    ]


def transform_media(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Batch media resize via mapInPandas: (id, media, media_meta).

    The output metadata struct reflects the new dimensions — the
    contract a downstream training-data loader reads instead of
    re-decoding the payload.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("media_meta", MEDIA_SCHEMA),
        ]
    )
    # the real path re-encodes in the INPUT's format, so the stamped
    # mime must track the payload — a mime-dispatching loader cannot
    # decode "image/unknown"
    def _mime(payload: bytes | None) -> str:
        if fake:
            return "application/x-fake"
        return "image/jpeg" if payload[:2] == b"\xff\xd8" else "image/png"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payload -> NULL media + NULL meta (not a job abort)
            resized = [
                resize_image(b, width, height, fake=fake) if b is not None else None
                for b in pdf[media_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "media": resized,
                    "media_meta": [
                        {
                            "mime": _mime(r),
                            "width": width,
                            "height": height,
                            "duration_ms": None,
                            "sample_rate": None,
                        }
                        if r is not None
                        else None
                        for r in resized
                    ],
                }
            )

    return df.select(id_col, media_col).mapInPandas(batches, out_schema)


def explode_frames(
    df: DataFrame,
    n_frames: int,
    media_col: str = "media",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Frame sampling as a one-to-many mapInPandas: (id, frame_idx, frame).

    Each input payload yields ``n_frames`` rows — the fan-out shape of
    a video-to-training-frames pipeline. Row multiplication happens
    inside the Arrow batch (no join, no explode shuffle); downstream
    repartitioning is the caller's choice.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for rid, data in zip(pdf[id_col].astype("int64"), pdf[media_col]):
                if data is None:
                    continue  # NULL payload: zero frames, not a job abort
                for i, frame in enumerate(sample_frames(data, n_frames, fake=fake)):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(frame)
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, media_col).mapInPandas(batches, out_schema)


def extract_media_features(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Per-payload feature extraction via Arrow-batched mapInPandas.

    Output: (id, n_bytes, mean_byte, hash_hi, orientation). The UDF
    sees pandas batches, not rows — the decode loop is pure Python per
    batch but crosses the JVM/Python boundary once per Arrow batch
    only. ``orientation`` is the EXIF rotation tag for JPEG payloads
    and NULL otherwise (decode_image returns the key on every path, so
    the column is schema-stable across mixed-codec batches).
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("mean_byte", T.DoubleType()),
            T.StructField("hash_hi", T.LongType()),
            T.StructField("orientation", T.IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payloads yield NULL features instead of a TypeError
            # that aborts the whole job (round-7 review): missing blobs
            # are a data condition, not a pipeline bug
            feats = [
                decode_image(b, fake=fake) if b is not None else None
                for b in pdf[media_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": [f["n_bytes"] if f else None for f in feats],
                    "mean_byte": [f["mean_byte"] if f else None for f in feats],
                    "hash_hi": [f["hash_hi"] if f else None for f in feats],
                    "orientation": pd.array(
                        [f["orientation"] if f else None for f in feats],
                        dtype="Int32",
                    ),
                }
            )

    return df.select(id_col, media_col).mapInPandas(batches, out_schema)
