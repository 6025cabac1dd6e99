"""Multimodal-column operators: opaque binary payloads + typed metadata.

Design (BASELINE.json extension surface): media travels as a ``binary``
column plus a metadata struct; all per-item compute is Arrow-batched
``mapInPandas`` so the decode libraries (PIL/ffmpeg/torchaudio — NOT
installed in this environment) see contiguous byte buffers and the Spark
plumbing (schema, partitioning, batch shape) is real and tested.

The decode kernels themselves are STUBBED behind ``NotImplementedError``
with a deterministic fake (``fake=True``) used by tests: the fake derives
"features" from the payload bytes (length, checksum-seeded values), so
pipelines are runnable end-to-end without media libs, and swapping in a
real kernel changes one function.

Partitioning note for 100 TB of media: repartition by a size-balanced key
(e.g. ``hash(item_id)``) BEFORE mapInPandas so one huge video can't skew a
task; cap ``spark.sql.files.maxPartitionBytes`` so scans don't build
multi-GB Arrow batches.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURES_SCHEMA = (
    "item_id bigint, payload_bytes bigint, width int, height int, "
    "n_channels int, mean_luma double"
)

AUDIO_FEATURES_SCHEMA = (
    "item_id bigint, payload_bytes bigint, duration_sec double, "
    "sample_rate int, rms double"
)

FRAME_SAMPLE_SCHEMA = (
    "item_id bigint, frame_idx int, frame_md5 string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapter for the test corpus: treat a text column as an opaque binary
    payload with typed metadata — the schema real media would use."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("item_id"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.md5(F.col(text_col)).alias("digest"),
        ).alias("meta"),
    )


def _decode_image_real(payload: bytes) -> tuple[int, int, int, float]:
    raise NotImplementedError(
        "image decode requires PIL/opencv, not available in this "
        "environment; pass fake=True for the deterministic stub"
    )


def _decode_image_fake(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic pseudo-decode: dimensions/luma derived from a crc of
    the payload — stable across engines/runs, no media libs."""
    crc = zlib.crc32(payload)
    width = 64 + (crc % 512)
    height = 64 + ((crc >> 9) % 512)
    return width, height, 3, (crc % 10_000) / 10_000.0


def image_features(
    df: DataFrame, fake: bool = False, batch_limit: int = 1024
) -> DataFrame:
    """Extract image features per item via Arrow-batched mapInPandas.
    ``df`` must have columns (item_id, payload)."""
    decode = _decode_image_fake if fake else _decode_image_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                data = bytes(payload)
                w, h, c, luma = decode(data)
                out.append((int(item_id), len(data), w, h, c, luma))
                if len(out) >= batch_limit:
                    yield pd.DataFrame(
                        out, columns=["item_id", "payload_bytes", "width",
                                      "height", "n_channels", "mean_luma"]
                    )
                    out = []
            if out:
                yield pd.DataFrame(
                    out, columns=["item_id", "payload_bytes", "width",
                                  "height", "n_channels", "mean_luma"]
                )

    return df.select("item_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample(df: DataFrame, n_frames: int = 4, fake: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.  The fake
    kernel slices the payload into n_frames chunks and fingerprints each —
    the row-explosion plumbing (1 item → N frames) is the real contract."""
    if not fake:
        raise NotImplementedError(
            "video decode requires ffmpeg, not available in this environment"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                data = bytes(payload)
                step = max(1, len(data) // n_frames)
                for idx in range(n_frames):
                    chunk = data[idx * step : (idx + 1) * step]
                    out.append(
                        (int(item_id), idx, hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(out, columns=["item_id", "frame_idx", "frame_md5"])

    return df.select("item_id", "payload").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )


RESIZE_SCHEMA = (
    "item_id bigint, payload binary, width int, height int, "
    "src_bytes bigint, dst_bytes bigint"
)


def image_resize(
    df: DataFrame, width: int = 224, height: int = 224, fake: bool = False
) -> DataFrame:
    """Resize kernel: payload in, (resized payload, target dims) out — the
    binary-in/binary-out plumbing a preprocessing pipeline needs (resize →
    re-encode → downstream feature extraction reads the NEW payload).

    The real kernel needs PIL/opencv (absent here); the fake deterministic
    kernel re-chunks the payload to a size proportional to the pixel-count
    ratio and tags it with an md5 header — stable bytes, so the
    byte-for-byte contract (including the binary output column) is
    testable end-to-end.  At scale this is map-only: no shuffle, Arrow
    batches both directions, output parquet can be written directly.
    """
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL/opencv, not available in this "
            "environment; pass fake=True for the deterministic stub"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                data = bytes(payload)
                w0, h0, _, _ = _decode_image_fake(data)
                ratio = (width * height) / float(w0 * h0)
                dst_len = max(16, int(len(data) * min(ratio, 1.0)))
                header = hashlib.md5(data).digest()
                resized = (header + data)[:dst_len]
                out.append(
                    (int(item_id), resized, width, height, len(data), len(resized))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "payload", "width", "height",
                    "src_bytes", "dst_bytes",
                ],
            )

    return df.select("item_id", "payload").mapInPandas(run, schema=RESIZE_SCHEMA)


def _decode_audio_real(payload: bytes) -> tuple[float, int, float]:
    raise NotImplementedError(
        "audio decode requires torchaudio/soundfile, not available in this "
        "environment; pass fake=True for the deterministic stub"
    )


def _decode_audio_fake(payload: bytes) -> tuple[float, int, float]:
    """Deterministic pseudo-decode: duration/rate/rms derived from a crc of
    the payload — stable across engines/runs, no audio libs."""
    crc = zlib.crc32(payload)
    duration = 0.5 + (crc % 6000) / 100.0
    sample_rate = (8000, 16000, 22050, 44100)[crc % 4]
    rms = ((crc >> 2) % 10_000) / 10_000.0
    return duration, sample_rate, rms


def audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Extract audio features per item via Arrow-batched mapInPandas.
    ``df`` must have columns (item_id, payload)."""
    decode = _decode_audio_fake if fake else _decode_audio_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                data = bytes(payload)
                duration, rate, rms = decode(data)
                out.append((int(item_id), len(data), duration, rate, rms))
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "payload_bytes", "duration_sec",
                    "sample_rate", "rms",
                ],
            )

    return df.select("item_id", "payload").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )
