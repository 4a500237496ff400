"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery here is real and tested: schemas, batch
iteration, partitioning behavior. The actual media decode is STUBBED —
the image/audio libraries are not in this container — behind
`decode_stub`, which produces deterministic fake features from the raw
bytes so pipelines are end-to-end testable. Swap `_decode_image_real`
(raises NotImplementedError) for a Pillow/ffmpeg call in a real
deployment; nothing else changes.

Scale: mapInPandas streams Arrow record batches through Python — the one
place Python is unavoidable (media codecs). Batches are bounded by
spark.sql.execution.arrow.maxRecordsPerBatch; the operator is map-only
(no shuffle), so it scales linearly with executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, media binary, media_type string, width int, height int, "
    "duration_ms long"
)

FEATURE_SCHEMA = "media_id long, n_bytes long, digest string, feature array<float>"


def _decode_image_real(raw: bytes):
    raise NotImplementedError(
        "real media decode requires Pillow/ffmpeg — not available in this "
        "container; use decode_stub (deterministic fake) instead"
    )


def decode_stub(raw: bytes, n_features: int = 8) -> list[float]:
    """Deterministic fake 'decoder': derives n_features floats in [0, 1)
    from the md5 digest of the bytes. Stands in for decode→embed."""
    if raw is None:
        raw = b""
    d = hashlib.md5(raw).digest()
    return [d[i] / 255.0 for i in range(n_features)]


def extract_features(df: DataFrame, media_col: str = "media",
                     id_col: str = "media_id", n_features: int = 8) -> DataFrame:
    """Binary column → (id, n_bytes, md5 digest, stub feature vector) via
    Arrow-batched mapInPandas. The digest matches SQL md5() over the same
    bytes, so the plumbing has an exact oracle even though the decoder is
    a stub."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raw = pdf[media_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": raw.map(lambda b: len(b) if b is not None else 0),
                    "digest": raw.map(
                        lambda b: hashlib.md5(b if b is not None else b"").hexdigest()
                    ),
                    "feature": raw.map(lambda b: decode_stub(b, n_features)),
                }
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(batches, FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int,
                media_col: str = "media", id_col: str = "media_id") -> DataFrame:
    """Resize pipeline plumbing: passes bytes through mapInPandas and tags
    the target geometry (a real impl would re-encode). Output schema
    (media_id, media, width, height) is the contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "media": pdf[media_col],
                    "width": width,
                    "height": height,
                }
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        batches, "media_id long, media binary, width int, height int"
    )


def frame_sample_stub(df: DataFrame, every_ms: int = 1000,
                      media_col: str = "media", id_col: str = "media_id",
                      duration_col: str = "duration_ms") -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (media_id, frame_ts_ms, frame binary). Frame extraction is stubbed as
    a byte-slice; the explode-shaped output schema and batch iteration are
    the real contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_ts, out_frames = [], [], []
            for _, row in pdf.iterrows():
                dur = int(row[duration_col] or 0)
                raw = row[media_col] or b""
                for ts in range(0, max(dur, 1), every_ms):
                    out_ids.append(row[id_col])
                    out_ts.append(ts)
                    frac = ts / max(dur, 1)
                    pos = int(frac * max(len(raw) - 16, 0))
                    out_frames.append(raw[pos:pos + 16])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_ts_ms": out_ts, "frame": out_frames}
            )

    return df.select(F.col(id_col), F.col(media_col), F.col(duration_col)).mapInPandas(
        batches, "media_id long, frame_ts_ms long, frame binary"
    )
