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
    sub[i + 11] = 0x33              # 3x3 sampling: beyond the 1-2 range
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


def test_decode_hand_assembled_bitstream():
    """Decodes a JPEG whose entropy segment is written BIT BY BIT here,
    independently of the module's encoder — kills the mirrored-bug risk
    for the Huffman/receive-extend layer.

    DHT (hand-chosen): DC table {cat0: '00', cat2: '01'}, AC table
    {EOB: '00', (run0,size1): '01'}.  Block: DC diff = -2 (cat 2, bits
    '01' = one's complement of 2), then AC (0,1) value +1 ('1'), EOB.
    Coefficients: DC=-2, AC@zigzag[1]=(0,1)=+1.
    """
    import struct

    import numpy as np

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    # canonical tables: 2 symbols of length 2 each
    dc_bits = [0] * 16
    dc_bits[1] = 2
    ac_bits = [0] * 16
    ac_bits[1] = 2
    blob = bytearray(b"\xff\xd8")
    zz_q = bytes([1] * 64)
    blob += seg(0xDB, b"\x00" + zz_q)
    blob += seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    blob += seg(0xC4, b"\x00" + bytes(dc_bits) + bytes([0, 2]))  # DC cats
    blob += seg(0xC4, b"\x10" + bytes(ac_bits) + bytes([0x00, 0x01]))
    blob += seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    # entropy bits: DC huff '01' (cat2) + '01' (diff=-2) +
    #               AC huff '01' ((0,1)) + '1' (value +1) +
    #               AC huff '00' (EOB) + pad '1111111'
    # = 01 01 01 1 00 1111111 -> 01010110 01111111 = 0x56 0x7F
    blob += bytes([0x56, 0x7F])
    blob += b"\xff\xd9"

    px = jpeg_decode_pixels(bytes(blob))
    coef = np.zeros((8, 8), dtype=np.int64)
    coef[0, 0] = -2
    coef[0, 1] = 1
    want = _descale(idct_8x8(coef))
    assert (px == want).all()


def test_png_paeth_filter_hand_computed():
    """Decodes a PNG whose Paeth-filtered row bytes are computed by
    hand here, independent of the module's encoder."""
    import struct
    import zlib

    import numpy as np

    from medcat_spark.functions.media import png_decode_pixels

    # 3x3 gray image; row0 stored with filter 0; rows 1-2 with Paeth.
    img = np.array([[10, 20, 30],
                    [15, 25, 200],
                    [90, 80, 70]], dtype=np.int64)
    raw = bytearray()
    raw.append(0)
    raw.extend(img[0].astype(np.uint8).tobytes())
    for y in (1, 2):
        raw.append(4)
        for x in range(3):
            a = img[y][x - 1] if x else 0          # left
            b = img[y - 1][x]                      # up
            c = img[y - 1][x - 1] if x else 0      # upper-left
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            raw.append(int((img[y][x] - pred) % 256))

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))
    got = png_decode_pixels(blob)
    assert (got == img.astype(np.uint8)).all()


def test_420_subsampling_roundtrip():
    """4:2:0 (the ubiquitous web/camera layout): 1 MCU = 4 Y blocks +
    Cb + Cr, chroma upsampled 2x nearest-neighbor."""
    q = np.ones((8, 8), dtype=np.int64)

    def blk(dc, ac=0):
        c = np.zeros((8, 8), dtype=np.int64)
        c[0, 0] = dc
        if ac:
            c[1, 1] = ac
        return c

    yblocks = [blk(8 * i, 2) for i in range(4)]
    cbb, crb = blk(-16), blk(24)
    px = jpeg_decode_pixels(jpeg_encode_coefficients(
        yblocks + [cbb, crb], 16, 16, q, n_components=3,
        sampling=[(2, 2), (1, 1), (1, 1)]))
    yp = np.zeros((16, 16))
    for i, b in enumerate(yblocks):
        y0, x0 = (i // 2) * 8, (i % 2) * 8
        yp[y0:y0 + 8, x0:x0 + 8] = idct_8x8(b * q)
    cb = np.repeat(np.repeat(idct_8x8(cbb * q), 2, 0), 2, 1) + 128
    cr = np.repeat(np.repeat(idct_8x8(crb * q), 2, 0), 2, 1) + 128
    yv = yp + 128
    want = np.stack(
        [np.clip(np.floor(p + 0.5), 0, 255) for p in
         (yv + 1.402 * (cr - 128),
          yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
          yv + 1.772 * (cb - 128))], axis=-1).astype(np.uint8)
    assert px.shape == (16, 16, 3)
    assert (px == want).all()


def test_restart_intervals_reset_predictors():
    rng = np.random.RandomState(3)
    q = fixture_quant()
    blocks = []
    for _ in range(6):                  # 6 MCUs of one block (8x48 image)
        c = np.zeros((8, 8), dtype=np.int64)
        c[0, 0] = rng.randint(-90, 91)
        c[3, 1] = rng.randint(-6, 7)
        blocks.append(c)
    blob = jpeg_encode_coefficients(blocks, 48, 8, q, restart_interval=2)
    assert any(bytes([0xFF, 0xD0 + m]) in blob for m in range(8))
    px = jpeg_decode_pixels(blob)
    for i, b in enumerate(blocks):
        want = _descale(idct_8x8(b * q))
        assert (px[:, i * 8:(i + 1) * 8] == want).all(), i
