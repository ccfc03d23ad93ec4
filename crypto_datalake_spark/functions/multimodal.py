"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data lake carries image/audio/video as ``binary`` columns
next to typed metadata. The Spark-side plumbing here is real — schema,
Arrow batch transfer, ``mapInPandas`` signature, per-batch vectorization —
while the actual media decode is stubbed (the decode libraries are not in
this container): ``decode_media`` raises ``NotImplementedError`` and
``extract_media_features`` computes deterministic byte-level features
instead, so the pipeline shape is testable end-to-end.

Scale notes: mapInPandas streams Arrow batches — one Python worker per
task, no per-row overhead; payloads never pass through the driver. For
real decode (PIL/ffmpeg), only the ``_decode_one`` body changes; batch
size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
(set it low, e.g. 64, for multi-MB payloads to cap worker memory).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def decode_media(payload: bytes, media_type: str):
    """Real media decode — image/audio/video libraries are not available in
    this environment; the deterministic feature path below stands in."""
    raise NotImplementedError(
        f"no decoder for {media_type!r}: image/audio libs not installed"
    )


def extract_media_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    media_type_col: str = "media_type",
) -> DataFrame:
    """Binary payload → typed feature row via Arrow-batched mapInPandas.

    Features are deterministic byte-level stand-ins for decoded dimensions
    (width/height from byte length) so the plumbing is exactly what a real
    decoder would use — swap ``_features`` for ``decode_media`` when the
    codec libraries exist.
    """

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads yield null features (nullable Int64), not a
            # len(None) TypeError that kills the whole job for one row
            n_bytes = pd.array(
                [None if b is None else len(b) for b in pdf[payload_col]],
                dtype="Int64",
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": pdf[media_type_col],
                    "n_bytes": n_bytes,
                    "width": n_bytes % 640,
                    "height": n_bytes % 480,
                }
            )

    cols = [id_col, payload_col, media_type_col]
    return df.select(*cols).mapInPandas(_features, MEDIA_FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Batch image resize: binary in → binary out with the target
    dimensions.  The Spark shape is the entire point — a bijective
    mapInPandas over Arrow batches whose output payload column is again
    ``binary`` (resized bytes), so resize stages compose with decode /
    feature-extract stages without leaving the lake's column model.

    DETERMINISTIC STAND-IN: no image codec exists in this container, so
    the "resized" payload is the input truncated-or-cycled to the target
    pixel budget (``target_w*target_h`` bytes) — size-correct, content-
    deterministic, engine-agnostic.  A real implementation replaces only
    the body of ``_resize_batch`` with PIL/opencv calls.
    """
    budget = int(target_w) * int(target_h)

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fit(b: bytes | None) -> bytes | None:
                if b is None:
                    return None  # null in → null out, never len(None)
                if len(b) >= budget:
                    return bytes(b[:budget])
                reps = -(-budget // max(len(b), 1))
                return bytes((b * reps)[:budget])

            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": pdf[payload_col].map(fit),
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_resize_batch, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    frame_bytes: int = 1024,
    every_nth: int = 1,
    frame_interval_ms: int = 40,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame sampling: ONE row in → MANY frame rows out — the
    row-expanding mapInPandas shape (an Arrow-batched flatMap).  Output
    carries (doc_id, frame_idx, frame_ts_ms, frame bytes), ready for a
    downstream per-frame decode/embed stage; ``every_nth`` is the
    sampling stride (keep every Nth frame).

    DETERMINISTIC STAND-IN: frames are fixed-size slices of the payload
    (``frame_bytes`` each) at ``frame_interval_ms`` spacing — the real
    implementation swaps the slicer for an ffmpeg demux, everything else
    (schema, expansion, batch memory shape) is what production runs.
    Worker memory is bounded by input batch size
    (``spark.sql.execution.arrow.maxRecordsPerBatch``) times the
    expansion factor — size it for video rows.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, payloads = [], [], [], []
            for doc_id, payload in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                n_frames = max(len(payload) // frame_bytes, 1)
                for i in range(0, n_frames, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * frame_interval_ms)
                    payloads.append(
                        bytes(payload[i * frame_bytes : (i + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_payload": payloads,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_frames, FRAME_SCHEMA)
