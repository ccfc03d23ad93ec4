"""Multimodal plumbing (functions/multimodal.py): feature extraction,
resize, and frame sampling over binary columns — schema, batch shape, and
expansion semantics, with deterministic stand-in codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_datalake_spark.functions.multimodal import (
    decode_media,
    extract_media_features,
    resize_images,
    sample_video_frames,
)


def _media(spark):
    return spark.createDataFrame(
        [
            (1, b"x" * 100, "image"),
            (2, b"y" * 5000, "video"),
            (3, b"z", "audio"),
        ],
        "doc_id long, payload binary, media_type string",
    )


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError, match="image"):
        decode_media(b"\x00", "image/png")


def test_extract_features_schema_and_values(spark):
    rows = {r["doc_id"]: r for r in extract_media_features(_media(spark)).collect()}
    assert rows[1]["n_bytes"] == 100 and rows[1]["width"] == 100 % 640
    assert rows[2]["n_bytes"] == 5000


def test_resize_is_size_exact_and_binary_out(spark):
    out = resize_images(_media(spark), 8, 4)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert dict(out.dtypes)["payload"] == "binary"
    for r in rows.values():
        assert len(r["payload"]) == 32  # truncation AND cycling both hit 8*4
        assert (r["width"], r["height"]) == (8, 4)
    # deterministic: same input -> same bytes
    again = {r["doc_id"]: r["payload"] for r in resize_images(_media(spark), 8, 4).collect()}
    assert {k: v["payload"] for k, v in rows.items()} == again


def test_frame_sampling_expands_rows(spark):
    out = sample_video_frames(_media(spark), frame_bytes=1000, every_nth=2)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 2: 5000 bytes -> 5 frames -> stride 2 keeps idx 0,2,4
    assert sorted(r["frame_idx"] for r in by_doc[2]) == [0, 2, 4]
    assert [r["frame_ts_ms"] for r in sorted(by_doc[2], key=lambda r: r["frame_idx"])] == [0, 80, 160]
    # short payloads still emit one frame (never silently dropped)
    assert len(by_doc[1]) == 1 and len(by_doc[3]) == 1
    # frames carry the actual byte slices
    f0 = next(r for r in by_doc[2] if r["frame_idx"] == 0)
    assert bytes(f0["frame_payload"]) == b"y" * 1000


def test_frame_sampling_composes_with_features(spark):
    # frame-sample -> per-frame "decode" (feature extract) — two chained
    # mapInPandas stages over binary columns, the production composition
    frames = sample_video_frames(_media(spark), frame_bytes=1000).select(
        F.col("frame_idx").alias("doc_id"),
        F.col("frame_payload").alias("payload"),
        F.lit("frame").alias("media_type"),
    )
    feats = extract_media_features(frames)
    assert feats.count() == frames.count()
    assert {r["n_bytes"] for r in feats.collect()} <= {1000, 100, 1}
