"""Baseline-JPEG codec (functions/jpeg.py): coefficient round-trips
through real byte streams (Huffman, zigzag, DC prediction, ZRL runs,
0xFF byte stuffing), honest rejections, YCbCr color, the Spark decode
operator, and the oracle's FLOOR-boundary design guard."""

import numpy as np
import pytest

from medcat_spark.functions.jpeg import (fixture_blocks,
                                         fixture_boundary_distance,
                                         fixture_quant, idct_8x8,
                                         jpeg_decode_pixels,
                                         jpeg_encode_coefficients,
                                         media_jpeg_stats,
                                         synth_jpeg_column, zigzag_order,
                                         _descale)


def test_zigzag_is_the_spec_order():
    zz = zigzag_order()
    assert len(zz) == 64 and len(set(zz)) == 64
    assert zz[:10] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2),
                       (0, 3), (1, 2), (2, 1), (3, 0)]
    # spec tail (indices 61-63 of the canonical zigzag index matrix)
    assert zz[-3:] == [(6, 7), (7, 6), (7, 7)]
    # spot-check against the published index matrix: index 12 at (2,2),
    # index 35 at (7,0), index 42 at (1,6)
    assert zz[12] == (2, 2) and zz[35] == (7, 0) and zz[42] == (1, 7)


def test_gray_roundtrip_random_blocks_with_stuffing():
    rng = np.random.RandomState(42)
    q = fixture_quant()
    saw_stuffing = False
    for trial in range(30):
        blocks = []
        for _ in range(4):
            c = np.zeros((8, 8), dtype=np.int64)
            for _ in range(rng.randint(1, 8)):
                r_, c_ = rng.randint(0, 8, 2)
                c[r_, c_] = rng.randint(-80, 81)
            blocks.append(c)
        blob = jpeg_encode_coefficients(blocks, 16, 16, q)
        saw_stuffing |= b"\xff\x00" in blob.split(b"\xff\xda")[1]
        px = jpeg_decode_pixels(blob)
        for b, blk in enumerate(blocks):
            y, x = (b // 2) * 8, (b % 2) * 8
            want = _descale(idct_8x8(blk * q))
            assert (px[y:y + 8, x:x + 8] == want).all(), (trial, b)
    assert saw_stuffing    # the 0xFF00 path was actually exercised


def test_non_multiple_of_8_dims_cropped():
    q = np.ones((8, 8), dtype=np.int64)
    c = np.zeros((8, 8), dtype=np.int64)
    c[0, 0] = 24
    blob = jpeg_encode_coefficients([c], 5, 3, q)
    px = jpeg_decode_pixels(blob)
    assert px.shape == (3, 5)
    assert (px == 131).all()        # 24/8 + 128.5 floored


def test_color_ycbcr_to_rgb():
    q = np.ones((8, 8), dtype=np.int64)
    blocks = []
    dcs = [(16, -24, 40)]           # one MCU: Y, Cb, Cr DC-only
    for trip in dcs:
        for dc in trip:
            c = np.zeros((8, 8), dtype=np.int64)
            c[0, 0] = dc
            blocks.append(c)
    px = jpeg_decode_pixels(
        jpeg_encode_coefficients(blocks, 8, 8, q, n_components=3))
    y, cb, cr = 16 / 8 + 128, -24 / 8 + 128, 40 / 8 + 128
    want = [int(np.floor(v + 0.5)) for v in
            (y + 1.402 * (cr - 128),
             y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
             y + 1.772 * (cb - 128))]
    assert px.shape == (8, 8, 3)
    assert [int(px[0, 0, i]) for i in range(3)] == want


def test_honest_rejections():
    q = np.ones((8, 8), dtype=np.int64)
    c = np.zeros((8, 8), dtype=np.int64)
    blob = bytearray(jpeg_encode_coefficients([c], 8, 8, q))
    with pytest.raises(ValueError):
        jpeg_decode_pixels(b"PNG nope")
    i = bytes(blob).index(b"\xff\xc0")
    prog = blob.copy()
    prog[i + 1] = 0xC2              # progressive SOF2
    with pytest.raises(NotImplementedError):
        jpeg_decode_pixels(bytes(prog))
    sub = blob.copy()
    sub[i + 11] = 0x22              # 2x2 sampling factor
    with pytest.raises(NotImplementedError):
        jpeg_decode_pixels(bytes(sub))
    with pytest.raises(ValueError):
        jpeg_decode_pixels(bytes(blob[:i + 12]))  # truncated


def test_oracle_boundary_guard():
    # every pre-floor pixel across the sf-range fixture space sits far
    # from an integer boundary, so FLOOR agrees between numpy's 64-term
    # matmul IDCT and the oracle's 4-term closed form
    assert fixture_boundary_distance(1000) > 1e-6


def test_media_jpeg_stats_spark(spark):
    docs = spark.createDataFrame([(i,) for i in (0, 7, 123)], "doc_id long")
    rows = {r["doc_id"]: r
            for r in media_jpeg_stats(synth_jpeg_column(docs)).collect()}
    q = fixture_quant()
    for i in (0, 7, 123):
        want = 0
        for blk in fixture_blocks(i):
            want += int(_descale(idct_8x8(blk * q)).astype("int64").sum())
        r = rows[str(i)]
        assert (r["width"], r["height"]) == (16, 16)
        assert r["px_sum"] == want
        assert r["mean_px"] == want / 256
