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
    # JPEG stays env-gated (no codec in the container); PNG/BMP/WAV are
    # real decoders now and raise ValueError on garbage instead
    with pytest.raises(NotImplementedError, match="image"):
        decode_media(b"\x00", "image/jpeg")


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


# -------------------------------------------- REAL codecs (wav / bmp)

def test_wav_roundtrip_known_values():
    import numpy as np
    from crypto_datalake_spark.functions.multimodal import (
        decode_media,
        encode_wav_pcm16,
    )

    samples = np.array([0, 100, -700, 32767, -32768], dtype="<i2")
    b = encode_wav_pcm16(samples, 16000)
    assert len(b) == 44 + 2 * 5                  # canonical PCM header
    f = decode_media(b, "audio/wav")
    assert f["n_channels"] == 1 and f["sample_rate"] == 16000
    assert f["n_samples"] == 5
    assert f["duration_ms"] == 5 * 1000 // 16000
    assert f["peak_amp"] == 32768                # |-32768|, int32-safe abs


def test_bmp_roundtrip_padding_and_checksum():
    import numpy as np
    from crypto_datalake_spark.functions.multimodal import (
        decode_media,
        encode_bmp24,
    )

    # w=3 -> row 9 bytes -> 3 pad bytes; known pixel values
    px = np.arange(3 * 2 * 3, dtype=np.uint8).reshape(2, 3, 3)
    b = encode_bmp24(px)
    assert len(b) == 54 + 2 * 12                 # stride 12 = 9 + 3 pad
    f = decode_media(b, "image/bmp")
    assert (f["width"], f["height"]) == (3, 2)
    assert f["blue_sum"] == int(px[:, :, 2].sum())
    # a 4-aligned width hits the zero-pad path
    px4 = np.zeros((1, 4, 3), dtype=np.uint8)
    px4[0, :, 2] = [1, 2, 3, 4]
    f4 = decode_media(encode_bmp24(px4), "image/bmp")
    assert (f4["width"], f4["height"], f4["blue_sum"]) == (4, 1, 10)


def test_bmp_topdown_negative_height_orientation():
    """Negative biHeight = top-down row order: the decoder must NOT
    apply the bottom-up flip to it (ADVICE r8) — both orientations of
    the same image decode to the identical top-down raster array."""
    import struct

    import numpy as np
    from crypto_datalake_spark.functions.multimodal import (
        decode_bmp24_pixels,
        decode_media,
        encode_bmp24,
    )

    px = np.arange(3 * 2 * 3, dtype=np.uint8).reshape(2, 3, 3)
    bottom_up = encode_bmp24(px)

    # hand-build the top-down twin: same header with h -> -h, pixel
    # rows in raster (top-down) order instead of bottom-up
    row, pad = 3 * 3, (-(3 * 3)) % 4
    data = b"".join(
        px[y, :, ::-1].tobytes() + b"\x00" * pad for y in range(2)
    )
    top_down = (
        bottom_up[:14]
        + struct.pack(
            "<IiiHHIIiiII", 40, 3, -2, 1, 24, 0, len(data), 2835, 2835, 0, 0
        )
        + data
    )
    got_bu = decode_bmp24_pixels(bottom_up)
    got_td = decode_bmp24_pixels(top_down)
    assert np.array_equal(got_bu, px)
    assert np.array_equal(got_td, px)  # pre-fix this came out row-flipped
    f = decode_media(top_down, "image/bmp")
    assert (f["width"], f["height"]) == (3, 2)
    assert f["blue_sum"] == int(px[:, :, 2].sum())


def test_decode_media_rejects_garbage_and_compressed_formats():
    import pytest as _pytest
    from crypto_datalake_spark.functions.multimodal import decode_media

    with _pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image/jpeg")   # still env-gated
    with _pytest.raises(ValueError):
        decode_media(b"XXnot a bmp at all" + b"\x00" * 60, "image/bmp")
    with _pytest.raises(Exception):
        decode_media(b"RIFFgarbage", "audio/wav")


def test_decode_media_features_null_payload(spark):
    from crypto_datalake_spark.functions.multimodal import (
        decode_media_features,
    )

    df = spark.createDataFrame(
        [(1, None, "audio/wav")],
        "doc_id long, payload binary, media_type string",
    )
    (row,) = decode_media_features(df).collect()
    assert row["n_bytes"] is None and row["width"] is None
    assert row["sample_rate"] is None            # null in -> null out


def test_png_roundtrip_and_size():
    import numpy as np
    from crypto_datalake_spark.functions.multimodal import (
        decode_media,
        encode_png_rgb,
    )

    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    b = encode_png_rgb(px)
    raw = 3 * (1 + 3 * 4)
    assert len(b) == raw + 68                    # stored-block analytic size
    f = decode_media(b, "image/png")
    assert (f["width"], f["height"]) == (4, 3)
    assert f["blue_sum"] == int(px[:, :, 2].sum())
    # stdlib zlib agrees it is a valid stream end-to-end by construction;
    # corrupt magic must be rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_media(b"\x89PNX" + b[4:], "image/png")


def test_png_unfilter_inverts_all_five_filters():
    """The decoder must invert every PNG row filter, not just the
    filter-0 rows our encoder emits: apply each forward filter to known
    pixels per the spec, then _png_unfilter must recover them exactly."""
    import numpy as np
    from crypto_datalake_spark.functions.multimodal import _png_unfilter

    rng = np.random.RandomState(7)
    w, h, bpp = 5, 5, 3
    px = rng.randint(0, 256, size=(h, w * bpp), dtype=np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        ftype = y % 5            # one row per filter type
        raw.append(ftype)
        cur = px[y]
        for x in range(w * bpp):
            left = cur[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            pred = {0: 0, 1: left, 2: up,
                    3: (left + up) >> 1, 4: paeth(left, up, ul)}[ftype]
            raw.append((int(cur[x]) - pred) & 0xFF)
        prev = cur
    got = _png_unfilter(bytes(raw), w, h, bpp)
    assert (got.reshape(h, w * bpp).astype(np.int32) == px).all()


def test_png_rgba_decode():
    """The decoder accepts color type 6 (RGBA): hand-assemble a 2x2
    RGBA PNG (filter-0 rows, stored deflate) and verify dims + the
    blue channel lands at index 2 of 4."""
    import struct
    import zlib

    from crypto_datalake_spark.functions.multimodal import decode_media

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    w = h = 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)  # RGBA
    # rows: pixel = (r,g,b,a); blue values 10,20 / 30,40
    rows = (b"\x00" + bytes([1, 2, 10, 255, 3, 4, 20, 255])
            + b"\x00" + bytes([5, 6, 30, 255, 7, 8, 40, 255]))
    b = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
         + chunk(b"IDAT", zlib.compress(rows, 0)) + chunk(b"IEND", b""))
    f = decode_media(b, "image/png")
    assert (f["width"], f["height"]) == (2, 2)
    assert f["blue_sum"] == 10 + 20 + 30 + 40


def test_codec_roundtrip_property():
    """Fuzz the hand-rolled codecs across random shapes and content:
    WAV at random sample counts/rates, BMP at every width mod-4 class
    (the row-padding classes) and both orientations via the encoder,
    PNG at random dims — decode features must equal numpy ground truth
    exactly.  Generalizes the directed known-value roundtrips the same
    way the r10 fold/cache/txn property sweeps generalize theirs."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crypto_datalake_spark.functions.multimodal import (
        decode_media,
        encode_bmp24,
        encode_png_rgb,
        encode_wav_pcm16,
    )

    @settings(deadline=None, max_examples=120)
    @given(
        kind=st.sampled_from(["wav", "bmp", "png"]),
        w=st.integers(1, 9),
        h=st.integers(1, 6),
        seed=st.integers(0, 2**31 - 1),
        rate=st.sampled_from([8000, 16000, 44100]),
    )
    def run(kind, w, h, seed, rate):
        rng = np.random.RandomState(seed)
        if kind == "wav":
            n = w * h
            samples = rng.randint(-32768, 32768, size=n).astype("<i2")
            f = decode_media(encode_wav_pcm16(samples, rate), "audio/wav")
            assert f["n_samples"] == n
            assert f["sample_rate"] == rate
            assert f["duration_ms"] == n * 1000 // rate
            assert f["peak_amp"] == int(
                np.abs(samples.astype(np.int32)).max()
            )
            return
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        if kind == "bmp":
            f = decode_media(encode_bmp24(px), "image/bmp")
        else:
            f = decode_media(encode_png_rgb(px), "image/png")
        assert (f["width"], f["height"]) == (w, h)
        assert f["blue_sum"] == int(px[:, :, 2].astype("int64").sum())

    run()
