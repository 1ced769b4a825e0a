"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step itself is STUBBED (PIL/librosa/av are not in this
container): ``_decode_image_bytes`` raises NotImplementedError unless a
decoder is importable, and the pipeline uses a deterministic fake
(md5-derived dimensions) so the Spark-side plumbing — schema, batch
iteration, partitioning — is real and testable. Swap ``_FAKE_DECODE``
off in a container with the real libs.

Scale notes: mapInPandas streams Arrow record batches, so peak memory is
one batch (spark.sql.execution.arrow.maxRecordsPerBatch), not one
partition; binary payloads never materialize as Python row objects.
Partition sizing should target ~64-128 MB of payload per task via
spark.sql.files.maxPartitionBytes on read.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoder, when the environment has one
    from PIL import Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

_FAKE_DECODE = not _HAVE_PIL

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)


def _decode_image_bytes(data: bytes) -> tuple[int, int, str]:
    """Return (width, height, format). Real decode requires PIL."""
    if _FAKE_DECODE:
        # Deterministic fake: dimensions derived from the content digest.
        # Replaces actual pixel decode in lib-less environments; keeps
        # every downstream shape (schema, batching) identical.
        h = hashlib.md5(data).hexdigest()
        return int(h[:4], 16) % 1024 + 1, int(h[4:8], 16) % 1024 + 1, "fake"
    raise NotImplementedError("real image decode requires PIL")  # pragma: no cover


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test-data adapter: treat a text column's UTF-8 bytes as an opaque
    binary payload (the testdata tables carry no real media)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8").cast(BinaryType()))


def image_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode/feature-extract binary payloads via mapInPandas.

    Arrow delivers the binary column as zero-copy byte buffers per batch;
    output is a narrow typed frame (no payload), so the expensive bytes
    are dropped before any downstream shuffle.
    """
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf[payload_col]
            dims = [_decode_image_bytes(bytes(b)) for b in data]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": data.map(len).astype("int64"),
                    "content_md5": data.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "format": [d[2] for d in dims],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        extract, IMAGE_FEATURES_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_w", IntegerType()),
        StructField("resized_h", IntegerType()),
        StructField("resized_bytes", LongType()),
    ]
)


def resize_images(
    df: DataFrame, box: int = 256, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Fit-into-box resize plumbing via mapInPandas. The pixel resample is
    the stubbed step (PIL absent) — dimensions derive from the content
    digest exactly like image_features, and the aspect-ratio-preserving
    target box math plus the Arrow batch plumbing are real. resized_bytes
    models the RGB buffer the real kernel would emit."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "resized_w", "resized_h", "resized_bytes")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, _fmt = _decode_image_bytes(bytes(payload))
                m = max(w, h)
                rw, rh = (w, h) if m <= box else (
                    max(1, int(w * box / m)), max(1, int(h * box / m))
                )
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["resized_w"].append(rw)
                out["resized_h"].append(rh)
                out["resized_bytes"].append(rw * rh * 3)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        resize, RESIZE_SCHEMA
    )


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_us", LongType()),  # integer µs — exact
        StructField("est_loudness", IntegerType()),
    ]
)


def audio_features(
    df: DataFrame,
    sample_rate: int = 16_000,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Audio feature plumbing: payload as 16-bit mono PCM at a declared
    sample rate. Real decode (librosa/soundfile) is absent, so loudness
    is an md5-derived deterministic fake; sample count and duration
    are honest byte math. Duration is integer microseconds — exact, so
    the oracle comparison never rides on float division."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf[payload_col]
            n = data.map(lambda b: len(bytes(b)) // 2)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_samples": n.astype("int64"),
                    "duration_us": (n * 1_000_000 // sample_rate).astype("int64"),
                    "est_loudness": [
                        int(hashlib.md5(bytes(b)).hexdigest()[8:12], 16) % 1000
                        for b in data
                    ],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        extract, AUDIO_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emit (doc_id,
    frame_no) rows for every n-th 'frame', where the stubbed frame count
    derives from payload length. Real frame extraction would replace the
    count with the container's metadata."""
    frames = (F.octet_length("payload") / F.lit(100)).cast("int") + 1
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), frames - 1, F.lit(every_n))).alias("frame_no"),
    )


SCENE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("n_scenes", LongType()),
        StructField("first_boundary_frame", LongType()),
    ]
)


def video_scene_detect(
    df: DataFrame,
    frame_bytes: int = 100,
    cut_threshold: int = 500,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Scene-cut detection plumbing for video-like payloads: the payload
    is windowed into fixed-size 'frames' (every real pipeline's frame
    iterator), each frame gets a deterministic md5-derived signature in
    [0, 1000), and a scene boundary is declared where consecutive
    signatures jump by >= cut_threshold — the stub analog of a
    frame-difference shot detector. Real decode (PyAV/ffmpeg) is absent
    in this environment; the Spark-side plumbing (Arrow batches, schema,
    per-row frame loop bounded by payload size) is real and the
    signature math is engine-portable, so the report is value-hash
    verified against a SQL oracle computing the same windows.
    """
    import hashlib as _hl

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "n_scenes": [], "first_boundary_frame": []}
            for did, raw in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(raw)
                n_frames = len(b) // frame_bytes + 1
                prev = None
                n_scenes = 1
                first = None
                for i in range(n_frames):
                    frame = b[i * frame_bytes : (i + 1) * frame_bytes]
                    sig = int(_hl.md5(frame).hexdigest()[:4], 16) % 1000
                    if prev is not None and abs(sig - prev) >= cut_threshold:
                        n_scenes += 1
                        if first is None:
                            first = i
                    prev = sig
                out["doc_id"].append(int(did))
                out["n_frames"].append(n_frames)
                out["n_scenes"].append(n_scenes)
                out["first_boundary_frame"].append(first)
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "n_frames": "int64", "n_scenes": "int64"}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        detect, SCENE_SCHEMA
    )
