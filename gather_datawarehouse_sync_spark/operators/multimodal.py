"""Multimodal column plumbing (driver extension surface, SURVEY §2.14).

Images/audio/video travel as opaque ``binary`` columns beside a typed
metadata struct — the reference's inventory rows (path + md5 + size,
``src/DataWarehouse.js:48-56``) generalized to payload-carrying records.
All Spark-side plumbing is real and tested: schemas, Arrow batch
iteration (``mapInPandas``), partition sizing for large blobs.  Only the
*codec* step is stubbed: the container ships no image/audio libraries,
so decoding is a deterministic fake behind ``decoder=`` injection — a
real deployment passes ``decoder=pillow_decode`` with the same
``bytes -> (width, height, channels, pixels)`` contract.

At 100 TB the shape matters more than the codec: blobs stay in
executors end-to-end (binaryFile scan → Arrow batches → feature
columns), metadata-only queries never touch payload bytes (column
pruning drops ``content`` at the scan), and per-batch memory is bounded
by ``maxRecordsPerBatch`` rather than file count.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media row = opaque payload + typed metadata (never a parsed struct of
#: the payload itself — decoding is an operator, not a schema)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("path", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("size", T.LongType(), True),
                    T.StructField("md5", T.StringType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, channels int, mean_luma double"
)


def media_from_files(files: DataFrame, kind_from_ext: bool = True) -> DataFrame:
    """Lift a binaryFile scan (``path/length/content``) into the media
    shape: payload untouched, metadata derived where the bytes live."""
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind = (
        F.when(ext.isin("png", "jpg", "jpeg", "gif", "bmp"), "image")
        .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
        .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
        .otherwise("binary")
    )
    return files.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        "path",
        (kind if kind_from_ext else F.lit("binary")).alias("kind"),
        "content",
        F.struct(
            F.col("length").alias("size"),
            F.md5(F.col("content")).alias("md5"),
            F.concat(F.lit("application/"), ext).alias("mime"),
        ).alias("meta"),
    )


def fake_image_decode(content: bytes) -> dict[str, Any]:
    """Deterministic stand-in for an image codec (STUB — see module
    docstring).  Derives stable pseudo-dimensions and a pseudo-luma from
    the payload hash so tests exercise the full plumbing with exact
    expected values and zero native dependencies."""
    if content is None or len(content) == 0:
        raise ValueError("empty payload")
    h = hashlib.sha256(content).digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "channels": 1 + h[2] % 4,
        "mean_luma": round(h[3] / 255.0, 6),
    }


def real_image_decode(content: bytes) -> dict[str, Any]:  # pragma: no cover
    """The production codec slot.  Pillow isn't shipped in this
    container; the contract is identical to :func:`fake_image_decode`."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires pillow; inject decoder=fake_image_decode "
            "or install PIL"
        ) from exc
    img = Image.open(io.BytesIO(content))
    w, h = img.size
    channels = len(img.getbands())
    gray = img.convert("L")
    hist = gray.histogram()
    total = sum(hist) or 1
    mean = sum(i * c for i, c in enumerate(hist)) / (255.0 * total)
    return {"width": w, "height": h, "channels": channels, "mean_luma": round(mean, 6)}


def extract_image_features(
    media: DataFrame,
    decoder: Callable[[bytes], dict[str, Any]] = fake_image_decode,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode image payloads to feature columns via ``mapInPandas``.

    Arrow streams each partition through Python in bounded batches, so
    executor memory holds ``maxRecordsPerBatch`` blobs at a time — not
    the partition's worth.  Rows whose payload fails to decode are
    dropped (a 100 TB corpus always contains corrupt files; dying on
    them is not an option); swap the except for a collect-to-quarantine
    column when auditing.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    feats = decoder(bytes(content) if content is not None else b"")
                except Exception:
                    continue
                out.append(
                    {
                        "media_id": media_id,
                        "width": feats["width"],
                        "height": feats["height"],
                        "channels": feats["channels"],
                        "mean_luma": feats["mean_luma"],
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "channels", "mean_luma"],
            )

    src = media.filter(F.col("kind") == "image").select("media_id", "content")
    return src.mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, duration_ms long, sample_rate int, channels int, rms double"
)


def fake_audio_decode(content: bytes) -> dict[str, Any]:
    """Deterministic stand-in for an audio codec (STUB, same contract
    pattern as :func:`fake_image_decode`): pseudo duration/rate/rms from
    the payload hash so plumbing tests have exact expected values."""
    if content is None or len(content) == 0:
        raise ValueError("empty payload")
    h = hashlib.sha256(content).digest()
    return {
        "duration_ms": 100 + int.from_bytes(h[0:2], "big"),
        "sample_rate": (8000, 16000, 22050, 44100)[h[2] % 4],
        "channels": 1 + h[3] % 2,
        "rms": round(h[4] / 255.0, 6),
    }


def extract_audio_features(
    media: DataFrame,
    decoder: Callable[[bytes], dict[str, Any]] = fake_audio_decode,
) -> DataFrame:
    """Audio twin of :func:`extract_image_features`: Arrow-batched
    ``mapInPandas`` decode to (duration, rate, channels, rms); corrupt
    payloads dropped, same quarantine caveat."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    feats = decoder(bytes(content) if content is not None else b"")
                except Exception:
                    continue
                out.append({"media_id": media_id, **feats})
            yield pd.DataFrame(
                out,
                columns=["media_id", "duration_ms", "sample_rate", "channels", "rms"],
            )

    src = media.filter(F.col("kind") == "audio").select("media_id", "content")
    return src.mapInPandas(decode, AUDIO_FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling *plumbing*: one output row per sampled frame.

    A real video pipeline samples keyframes via a codec; the stub
    slices the payload at fixed offsets (deterministic, dependency-free)
    while keeping the real shape: a generator-style expansion (1 video →
    N frame rows) executed JVM-side with ``posexplode`` over byte
    slices — no Python in the expansion itself.
    """
    if every_n_bytes <= 0 or max_frames <= 0:
        # max_frames == 0 would make sequence(0, n_frames-1) DESCEND
        # (Spark's sequence never yields empty) and emit phantom frames
        raise ValueError("sample_frames: every_n_bytes and max_frames must be positive")
    n_frames = F.least(
        F.lit(max_frames),
        F.greatest((F.length("content") / every_n_bytes).cast("int"), F.lit(1)),
    )
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.substring(
            F.col("content"), i * every_n_bytes + 1, every_n_bytes
        ),
    )
    # NULL/empty payloads emit NO frames: `greatest` SKIPS nulls (it
    # returns null only when every operand is null), so a null content
    # would otherwise get n_frames = greatest(null, 1) = 1 and emit a
    # phantom frame row with a null payload slice — same for zero-byte
    # payloads, whose single "frame" would be the empty slice
    return (
        media.filter(
            (F.col("kind") == "video")
            & F.col("content").isNotNull()
            & (F.length("content") > 0)
        )
        .select("media_id", F.posexplode(frames).alias("frame_idx", "frame"))
        .select("media_id", "frame_idx", F.md5("frame").alias("frame_md5"),
                F.length("frame").alias("frame_size"))
    )


def resize_stub(
    media: DataFrame,
    width: int,
    height: int,
) -> DataFrame:
    """Resize plumbing: passes payloads through ``mapInPandas`` with the
    output schema of a resize (payload bytes + new dims).  The transform
    itself is identity (STUB — a real pipeline calls the codec); the
    test surface is batch shape and schema stability."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["content"],
                    "width": width,
                    "height": height,
                }
            )

    return media.select("media_id", "content").mapInPandas(
        resize, "media_id long, content binary, width int, height int"
    )
