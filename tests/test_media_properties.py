"""Property-based certification of the pure-stdlib media codecs:
any uint8 image round-trips PNG through every row filter; any int16
signal round-trips WAV; any palette-index animation round-trips GIF
through the LZW layer.  Complements the hand-built-stream tests in
test_functions.py (interlace, transparency, sub-rects, table reset)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays
from struct import error as struct_error

from medcat_spark.functions.media import (gif_decode_frames, gif_encode,
                                          lzw_decode, lzw_encode,
                                          png_decode_pixels, png_encode,
                                          wav_decode, wav_encode)


@settings(max_examples=40, deadline=None)
@given(
    px=arrays(np.uint8,
              st.tuples(st.integers(1, 12), st.integers(1, 12),
                        st.sampled_from([1, 3, 4]))),
    ft=st.integers(0, 4),
)
def test_png_roundtrip_any_image_any_filter(px, ft):
    if px.shape[2] == 1:
        px = px[:, :, 0]
    back = png_decode_pixels(png_encode(px, filter_type=ft))
    assert back.shape == px.shape
    assert (back == px).all()


@settings(max_examples=40, deadline=None)
@given(
    smp=arrays(np.int16,
               st.tuples(st.integers(1, 2000), st.integers(1, 2))),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_any_signal(smp, rate):
    back, got_rate = wav_decode(wav_encode(smp, rate))
    assert got_rate == rate
    assert (back == smp).all()


@settings(max_examples=40, deadline=None)
@given(
    seq=st.lists(st.integers(0, 255), min_size=0, max_size=4000),
    mcs=st.integers(8, 8),
)
def test_lzw_roundtrip_any_bytes(seq, mcs):
    assert lzw_decode(lzw_encode(seq, mcs), mcs) == seq


@settings(max_examples=25, deadline=None)
@given(
    frames=st.lists(
        arrays(np.uint8, (5, 7), elements=st.integers(0, 3)),
        min_size=1, max_size=4),
    delays=st.lists(st.integers(0, 500), min_size=4, max_size=4),
)
def test_gif_roundtrip_any_animation(frames, delays):
    pal = [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)]
    # GIF delay unit is 10 ms: quantize expectations like the encoder
    delays = [d // 10 * 10 for d in delays[:len(frames)]]
    blob = gif_encode(frames, pal, delays_ms=delays)
    dec = gif_decode_frames(blob)
    assert len(dec) == len(frames)
    for want_idx, d, want_delay in zip(frames, dec, delays):
        want = np.stack([want_idx.astype(np.uint8) * 85] * 3, axis=-1)
        assert (d["pixels"] == want).all()
        assert d["delay_ms"] == want_delay


def test_png_palette_decode_hand_built():
    """8-bit paletted PNG assembled by hand (PLTE + index rows) decodes
    to the palette's RGB values; out-of-range indices raise."""
    import struct
    import zlib

    from medcat_spark.functions.media import png_decode_pixels

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    idx = [[0, 1, 2], [3, 2, 1]]
    raw = bytearray()
    for row in idx:
        raw.append(0)
        raw.extend(row)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    def build(palette):
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3,
                                             0, 0, 0))
                + chunk(b"PLTE", bytes(v for c in palette for v in c))
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    px = png_decode_pixels(build(pal))
    assert px.shape == (2, 3, 3)
    for y, row in enumerate(idx):
        for x, k in enumerate(row):
            assert tuple(int(v) for v in px[y, x]) == pal[k]

    import pytest as _pt
    with _pt.raises(ValueError):
        png_decode_pixels(build(pal[:2]))    # index 3 out of range


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_codecs_reject_garbage_cleanly(data):
    """Random bytes must raise ValueError/NotImplementedError (or
    IndexError-free truncation errors) — never hang or segfault."""
    import zlib

    from medcat_spark.functions.jpeg import jpeg_decode_pixels
    from medcat_spark.functions.media import (gif_decode_frames,
                                              png_decode_pixels,
                                              wav_decode)
    for fn in (png_decode_pixels, wav_decode, gif_decode_frames,
               jpeg_decode_pixels):
        try:
            fn(data)
        except (ValueError, NotImplementedError, IndexError,
                zlib.error, EOFError, struct_error):
            pass


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_codecs_reject_garbage_after_valid_header(data):
    """Valid magic + garbage body: the deep parse paths must also fail
    cleanly."""
    import struct
    import zlib

    from medcat_spark.functions.jpeg import jpeg_decode_pixels
    from medcat_spark.functions.media import (gif_decode_frames,
                                              png_decode_pixels,
                                              wav_decode)
    seeded = [
        (png_decode_pixels, b"\x89PNG\r\n\x1a\n" + data),
        (wav_decode, b"RIFF" + struct.pack("<I", len(data) + 4)
         + b"WAVE" + data),
        (gif_decode_frames, b"GIF89a" + data),
        (jpeg_decode_pixels, b"\xff\xd8" + data),
    ]
    for fn, blob in seeded:
        try:
            fn(blob)
        except (ValueError, NotImplementedError, IndexError, KeyError,
                zlib.error, EOFError, struct_error):
            pass


def _png_chunk(tag, data):
    import struct
    import zlib
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data)))


def _png_build(w, h, bitd, color, rows, plte=None):
    import struct
    import zlib
    out = (b"\x89PNG\r\n\x1a\n"
           + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, bitd,
                                             color, 0, 0, 0)))
    if plte is not None:
        out += _png_chunk(b"PLTE", bytes(v for c in plte for v in c))
    raw = bytearray()
    for r in rows:
        raw.append(0)
        raw.extend(r)
    import zlib as z
    return (out + _png_chunk(b"IDAT", z.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def test_png_16bit_and_extra_color_types():
    import struct

    import numpy as np

    from medcat_spark.functions.media import png_decode_pixels

    px = png_decode_pixels(_png_build(
        2, 2, 16, 0, [struct.pack(">HH", 0x0102, 0x0FFF),
                      struct.pack(">HH", 0xABCD, 0)]))
    assert px.dtype == np.uint16
    assert px.tolist() == [[0x0102, 0x0FFF], [0xABCD, 0]]
    px = png_decode_pixels(_png_build(
        1, 1, 16, 2, [struct.pack(">HHH", 1, 2, 65535)]))
    assert px.tolist() == [[[1, 2, 65535]]]
    px = png_decode_pixels(_png_build(          # gray+alpha
        2, 1, 8, 4, [bytes([10, 255, 20, 128])]))
    assert px.tolist() == [[[10, 255], [20, 128]]]


def test_png_sub8bit_unpacking():
    from medcat_spark.functions.media import png_decode_pixels

    # 2-bit gray 5x2, MSB-first with row padding
    px = png_decode_pixels(_png_build(
        5, 2, 2, 0, [bytes([0b00011011, 0]), bytes([0b11100100, 0x80])]))
    assert px.tolist() == [[0, 1, 2, 3, 0], [3, 2, 1, 0, 2]]
    # 4-bit palette 3x1
    pal = [(9, 9, 9), (1, 2, 3), (4, 5, 6)]
    px = png_decode_pixels(_png_build(
        3, 1, 4, 3, [bytes([0x10, 0x20])], plte=pal))
    assert px.tolist() == [[[1, 2, 3], [9, 9, 9], [4, 5, 6]]]


def test_gif_disposal_restore_previous():
    import struct

    import numpy as np

    from medcat_spark.functions.media import (gif_decode_frames,
                                              gif_encode, lzw_encode)

    pal = [(0, 0, 0), (255, 255, 255)]
    blob = bytearray(gif_encode([np.zeros((2, 2), np.uint8)], pal))
    gce = b"\x21\xf9\x04" + struct.pack("<BHB", 0x0C, 5, 0) + b"\x00"
    comp = lzw_encode([1, 1, 1, 1], 2)
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0) + bytes([2])
    body = bytes([len(comp)]) + comp + b"\x00"
    # disposal-3 white frame, then a plain frame painting index 0 at a
    # 1x1 sub-rect: it must composite onto the RESTORED (black) canvas
    sub = b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0) + bytes([2])
    sub_body = bytes([len(lzw_encode([0], 2))]) + lzw_encode([0], 2) \
        + b"\x00"
    blob = blob[:-1] + gce + desc + body + sub + sub_body + b"\x3b"
    frames = gif_decode_frames(bytes(blob))
    assert (frames[1]["pixels"] == 255).all()          # white shows
    assert (frames[2]["pixels"] == 0).all()            # restored black


def test_png_adam7_interlace_matches_progressive():
    import struct
    import zlib

    import numpy as np

    from medcat_spark.functions.media import png_decode_pixels

    _PASSES = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
               (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

    def build_interlaced(img, bitd, color, plte=None):
        h, w = img.shape[:2]
        ch = {0: 1, 2: 3, 3: 1}[color]
        raw = bytearray()
        for x0, y0, dx, dy in _PASSES:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            for row in sub.reshape(sub.shape[0], -1):
                raw.append(0)
                if bitd == 8:
                    raw.extend(row.astype(np.uint8).tobytes())
                else:                      # pack sub-8-bit MSB-first
                    bits = np.unpackbits(
                        row.astype(np.uint8)[:, None], axis=1,
                        count=8)[:, 8 - bitd:]
                    flat = bits.reshape(-1)
                    pad = (-len(flat)) % 8
                    flat = np.concatenate([flat,
                                           np.zeros(pad, np.uint8)])
                    raw.extend(np.packbits(flat).tobytes())
        out = (b"\x89PNG\r\n\x1a\n"
               + _png_chunk(b"IHDR", struct.pack(
                   ">IIBBBBB", w, h, bitd, color, 0, 0, 1)))
        if plte is not None:
            out += _png_chunk(b"PLTE",
                              bytes(v for c in plte for v in c))
        return (out + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _png_chunk(b"IEND", b""))

    rng = np.random.RandomState(6)
    # 8-bit gray, odd dims (exercises empty/ragged passes)
    img = rng.randint(0, 256, (7, 5)).astype(np.uint8)
    assert (png_decode_pixels(build_interlaced(img, 8, 0)) == img).all()
    # 8-bit RGB
    rgb = rng.randint(0, 256, (6, 9, 3)).astype(np.uint8)
    assert (png_decode_pixels(build_interlaced(rgb, 8, 2)) == rgb).all()
    # 2-bit palette
    pal = [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)]
    idx = rng.randint(0, 4, (5, 7)).astype(np.uint8)
    got = png_decode_pixels(build_interlaced(idx, 2, 3, plte=pal))
    want = np.array(pal, np.uint8)[idx]
    assert (got == want).all()
