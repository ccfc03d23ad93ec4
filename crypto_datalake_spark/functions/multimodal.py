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
from pyspark.sql.types import LongType, StringType, StructField, StructType

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
            n_bytes = pdf[payload_col].map(len).astype("int64")
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
