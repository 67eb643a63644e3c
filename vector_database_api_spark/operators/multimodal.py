"""Multimodal (image/audio/video) column operators.

Beyond the reference's text-only surface: a 100 TB training-data pipeline
carries media as opaque ``BINARY`` columns plus typed metadata, processed
by Arrow-batched Python stages (``mapInPandas``) because media codecs live
in Python/native libraries, not SQL.

The Spark-side plumbing here is real and tested — schemas, partitioning
behavior, batch iteration shape, output contracts.  The codec calls
themselves are STUBS (this container ships no image/audio libraries):
``decode_image`` raises ``NotImplementedError`` unless given the
deterministic fake codec, which tests use.  Swapping in Pillow/librosa is
a one-line change at the marked seam.

Media schema convention:

    media(id STRING, modality STRING, content BINARY,
          meta MAP<STRING, STRING>)

At scale the table is partitioned by ``modality`` (and bucketed or
range-partitioned by id) so per-modality stages prune; ``content`` stays
opaque to Catalyst, and every transform below is a narrow per-partition
map — no shuffles.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id string, modality string, content binary, meta map<string,string>"
)

FEATURE_SCHEMA = "id string, modality string, feature array<float>"
FRAME_SCHEMA = "id string, frame_idx int, frame binary"


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the driver ``documents``
    table: UTF-8 text bytes as the opaque ``content`` BLOB, modality
    assigned by ``doc_id % 3`` (0=image, 1=audio, 2=video), document
    attributes as typed metadata.  Gives the multimodal operators a
    reproducible corpus that the DuckDB oracle can reason about
    (octet_length of the same text)."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("id"),
        modality.alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def fake_decode(content: bytes) -> np.ndarray:
    """Deterministic fake codec: derives a fixed-shape 'decoded' array from
    the bytes' sha256.  Stands in for PIL.Image.open/librosa.load so the
    pipeline shape is testable without media libraries."""
    seed = int.from_bytes(hashlib.sha256(content).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(32).astype(np.float32)


def decode_image(content: bytes) -> np.ndarray:
    """REAL-CODEC SEAM: replace the body with e.g.
    ``np.asarray(PIL.Image.open(io.BytesIO(content)))``."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use codec=fake_decode or install a real decoder"
    )


def extract_features(
    media: DataFrame,
    codec: Callable[[bytes], np.ndarray] = fake_decode,
) -> DataFrame:
    """Decode + feature-extract each media row via mapInPandas (Arrow
    batches; one Python worker per partition, zero shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                codec(bytes(c)).astype(np.float32).tolist() for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits one output row per
    sampled 'frame' (here: fixed-stride byte windows standing in for
    decoded frames — the real decoder plugs into the same iterator).
    Demonstrates the 1-to-N mapInPandas expansion contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for _, row in pdf.iterrows():
                content = bytes(row["content"])
                for j in range(min(max_frames, max(len(content) // every_n_bytes, 1))):
                    out_ids.append(row["id"])
                    out_idx.append(j)
                    out_frames.append(
                        content[j * every_n_bytes : (j + 1) * every_n_bytes]
                    )
            yield pd.DataFrame(
                {"id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return media.filter("modality = 'video'").mapInPandas(run, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# RAW-GRAY: a fully-specified in-repo media format, so decode/resize are
# REAL code (header parse + numpy), not stubs — only external codecs
# (JPEG/PNG/WAV) stay behind the decode_image seam above.
#
#   content = uint16_be height | uint16_be width | height*width pixel bytes
# ---------------------------------------------------------------------------

RAW_GRAY_HEADER = 4


def encode_raw_gray(arr: np.ndarray) -> bytes:
    """Serialize a (h, w) uint8 array into the RAW-GRAY byte format."""
    import struct

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    return struct.pack(">HH", h, w) + a.tobytes()


def decode_raw_gray(content: bytes) -> np.ndarray:
    """Parse RAW-GRAY bytes back to the (h, w) uint8 array.  Truncated
    payloads raise — corrupt rows should fail loudly, not yield garbage."""
    import struct

    if len(content) < RAW_GRAY_HEADER:
        raise ValueError("RAW-GRAY: missing header")
    h, w = struct.unpack(">HH", content[:RAW_GRAY_HEADER])
    body = content[RAW_GRAY_HEADER:]
    if len(body) != h * w:
        raise ValueError(f"RAW-GRAY: expected {h * w} pixels, got {len(body)}")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w)


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather (the real arithmetic a
    media pipeline runs after decode; no interpolation libraries)."""
    h, w = arr.shape
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[rows[:, None], cols[None, :]]


def media_raw_gray_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic RAW-GRAY media table from the driver documents:
    pixel bytes are the UTF-8 text tiled to h*w, dimensions derived from
    doc attributes — every byte reproducible from the parquet inputs."""
    from pyspark.sql.types import BinaryType

    @F.udf(BinaryType())
    def to_raw_gray(doc_id: int, text: str) -> bytes:
        h = 8 + int(doc_id) % 9
        w = 8 + len(text) % 9
        pix = np.frombuffer(
            (text.encode("utf-8") * (h * w // max(len(text), 1) + 1))[: h * w],
            dtype=np.uint8,
        ).reshape(h, w)
        return encode_raw_gray(pix)

    return docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.lit("image").alias("modality"),
        to_raw_gray("doc_id", "text").alias("content"),
        F.create_map(F.lit("format"), F.lit("raw-gray")).alias("meta"),
    )


RAW_FEATURE_SCHEMA = (
    "id string, h int, w int, mean_px double, std_px double, p50_px double"
)


def raw_gray_features(
    media: DataFrame, resize_to: tuple[int, int] = (16, 16)
) -> DataFrame:
    """decode -> resize -> stats, one Arrow batch at a time (mapInPandas,
    zero shuffle): the real multimodal feature-extraction shape with the
    real RAW-GRAY codec."""
    out_h, out_w = resize_to

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, content in zip(pdf["id"], pdf["content"]):
                img = decode_raw_gray(bytes(content))
                small = resize_nearest(img, out_h, out_w).astype(np.float64)
                rows.append(
                    (
                        rid,
                        img.shape[0],
                        img.shape[1],
                        float(small.mean()),
                        float(small.std()),
                        float(np.median(small)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["id", "h", "w", "mean_px", "std_px", "p50_px"]
            )

    return media.mapInPandas(run, RAW_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# RAW-PCM16: the audio twin of RAW-GRAY — a fully-specified in-repo format
# so audio decode + feature extraction are REAL code (header parse + numpy
# int16 arithmetic), not stubs.  Only external codecs (WAV/MP3/FLAC) stay
# behind a seam.
#
#   content = uint16_be sample_rate | uint16_be n_samples
#           | n_samples * int16_be PCM samples
# ---------------------------------------------------------------------------

RAW_PCM_HEADER = 4


def encode_raw_pcm16(sample_rate: int, samples: np.ndarray) -> bytes:
    """Serialize int16 PCM samples into the RAW-PCM16 byte format."""
    import struct

    s = np.asarray(samples, dtype=">i2")
    return struct.pack(">HH", sample_rate, len(s)) + s.tobytes()


def decode_raw_pcm16(content: bytes) -> tuple[int, np.ndarray]:
    """Parse RAW-PCM16 bytes back to (sample_rate, int16 array).
    Truncated payloads raise — corrupt rows fail loudly."""
    import struct

    if len(content) < RAW_PCM_HEADER:
        raise ValueError("RAW-PCM16: missing header")
    sr, n = struct.unpack(">HH", content[:RAW_PCM_HEADER])
    body = content[RAW_PCM_HEADER:]
    if len(body) != 2 * n:
        raise ValueError(f"RAW-PCM16: expected {2 * n} sample bytes, got {len(body)}")
    return sr, np.frombuffer(body, dtype=">i2").astype(np.int16)


def media_raw_pcm16_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic RAW-PCM16 media table from the driver documents:
    sample i is (byte[i mod L] - 97) * 256 of the UTF-8 text (ASCII
    corpus, so characters == bytes), sample rate derived from doc_id —
    every byte reproducible from the parquet inputs, which is what lets
    the DuckDB oracle replay decode + features symbolically."""
    from pyspark.sql.types import BinaryType

    @F.udf(BinaryType())
    def to_raw_pcm(doc_id: int, text: str) -> bytes:
        sr = 8000 + int(doc_id) % 8 * 1000
        b = text.encode("utf-8")
        n = min(len(b), 512)
        idx = np.arange(n) % max(len(b), 1)
        samples = (
            np.frombuffer(b, dtype=np.uint8)[idx].astype(np.int32) - 97
        ) * 256
        return encode_raw_pcm16(sr, samples.astype(np.int16))

    return docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.lit("audio").alias("modality"),
        to_raw_pcm("doc_id", "text").alias("content"),
        F.create_map(F.lit("format"), F.lit("raw-pcm16")).alias("meta"),
    )


PCM_FEATURE_SCHEMA = (
    "id string, sample_rate int, n_samples int, duration_ms double, "
    "rms double, peak int, n_zero_cross bigint"
)


def raw_pcm_features(media: DataFrame) -> DataFrame:
    """decode -> audio features, one Arrow batch at a time (mapInPandas,
    zero shuffle): duration, RMS energy, peak amplitude, zero-crossing
    count — the standard first-pass audio screen (silence/clipping/
    energy filters) with the real RAW-PCM16 codec.

    Exactness (mirrors _RAW_GRAY_ORACLE's argument): samples and their
    squares are integers whose sums stay far below 2^53, so float64
    accumulation is exact in any order; rms = sqrt(sum(s^2)/n) and
    duration = n*1000/sr are evaluated in the same operation order as
    the DuckDB oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, content in zip(pdf["id"], pdf["content"]):
                sr, s = decode_raw_pcm16(bytes(content))
                x = s.astype(np.float64)
                n = len(s)
                rms = float(np.sqrt(np.sum(x * x) / n)) if n else 0.0
                peak = int(np.max(np.abs(x))) if n else 0
                nonneg = x >= 0
                zc = int(np.sum(nonneg[1:] != nonneg[:-1])) if n > 1 else 0
                rows.append(
                    (rid, sr, n, n * 1000.0 / sr, rms, peak, zc)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "sample_rate", "n_samples", "duration_ms",
                    "rms", "peak", "n_zero_cross",
                ],
            )

    return media.mapInPandas(run, PCM_FEATURE_SCHEMA)


FRAME_FEATURE_SCHEMA = (
    "id string, frame_idx int, n_bytes int, sum_bytes bigint, mean_byte double"
)


def frame_byte_features(frames: DataFrame) -> DataFrame:
    """Per-frame byte statistics for sampled frames (mapInPandas, zero
    shuffle): byte count, exact integer byte sum, and mean.  Downstream
    pooling stays JVM-side (groupBy over these scalars); the corpus-wide
    mean is re-derived from the exact sums so cross-engine float
    aggregation order cannot matter."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, idx, frame in zip(
                pdf["id"], pdf["frame_idx"], pdf["frame"]
            ):
                b = np.frombuffer(bytes(frame), dtype=np.uint8)
                total = int(b.sum())
                rows.append(
                    (
                        rid,
                        int(idx),
                        len(b),
                        total,
                        total / len(b) if len(b) else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "frame_idx", "n_bytes", "sum_bytes", "mean_byte"],
            )

    return frames.mapInPandas(run, FRAME_FEATURE_SCHEMA)
