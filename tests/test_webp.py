"""WebP (VP8L) codec tests: encoder/decoder round-trips over every
encoder feature, handcrafted bitstreams for the decoder-only paths
(predictor + cross-color transforms, color cache, LZ77 with the 2D
distance map, max_symbol shortcut), and a REAL libwebp-encoded stream:
the CPython test suite's python.webp (PSF-licensed test data) carries a
VP8L-compressed ALPH alpha plane — decoding it exercises the
color-indexing transform and full prefix-code machinery against bytes
this codebase did not produce."""

from __future__ import annotations

import base64
import struct

import numpy as np
import pytest

from aristoteles_spark.formats.webp import (
    WebpError,
    _BitWriter,
    _DIST_MAP,
    _write_image_stream,
    decode_alpha_plane,
    decode_webp,
    encode_webp,
    webp_meta,
)

# CPython Lib/test test data (python.webp, PSF license): VP8X + ALPH(VP8L) + VP8
_PYTHON_WEBP = base64.b64decode("UklGRqgBAABXRUJQVlA4WAoAAAAQAAAADwAADwAAQUxQSMMAAAABJ6KokSTleucYX+ffKpmImP90cY3gJjDi4Yt3MsjBEVyDKzDosHgVjnhRNcEIDAJPkqBqsFUZHNa2bUYvTsZ2PLbtd/uvKa4hov9J0f2PkPe6REkkGzolkTTzFG0Ox9PlFiD0CxS+kOGDtxoynjaCfx0pfk52CPuInrOR75lzRugygtv4zEiy90UwfSD9NheMITJWLaXWayO8XeOlWRXVnIGk2W6WdYoYMQ+KqixQNPowgt+6a1BSKbUtz+lUFAoBAAAAVlA4IL4AAACQAgCdASoQABAAAwA0JbACdDBPCIUMfAMdCCz96AD+/XSg/QKbH4r3Q3ycN/bSDK/T/zVo4u6nvclvG/SqxWOuup+XhN9BojvaW+Tv+MvxvX/hr/o/5Qns9LtmX/+qKdl/yWznhuasl7nkxvSTI4xf3Y85VSB/lU/8Ofj/b9JrA+ifvIOYZm2x1RP/dhfmsf5diuSfR7+z+r/+HR3zEo/+XM/B+vkYw73Pzx+ROaAB/ZoBSzEs3rzZe6qsAAAA")


@pytest.mark.parametrize("shape", [(13, 17, 3), (8, 9, 4), (1, 1, 3), (5, 1, 3), (1, 7, 4)])
def test_roundtrip_random(shape):
    rng = np.random.RandomState(sum(shape))
    img = rng.randint(0, 256, shape, dtype=np.uint8)
    out = decode_webp(encode_webp(img))
    if shape[2] == 4 and (img[:, :, 3] == 255).all():
        img = img[:, :, :3]
    assert np.array_equal(out, img)


def test_roundtrip_gray_and_meta():
    rng = np.random.RandomState(0)
    g = rng.randint(0, 256, (10, 12), dtype=np.uint8)
    wb = encode_webp(g)
    assert np.array_equal(decode_webp(wb), np.stack([g, g, g], -1))
    assert webp_meta(wb) == (12, 10, 3)


def test_roundtrip_subtract_green():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (6, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(img, subtract_green=True)), img)


@pytest.mark.parametrize("n_colors,xbits", [(2, 3), (4, 2), (16, 1), (200, 0)])
def test_roundtrip_palette(n_colors, xbits):
    rng = np.random.RandomState(n_colors)
    idx = rng.randint(0, n_colors, (9, 11), dtype=np.uint8)
    img = np.stack([idx * (255 // max(n_colors - 1, 1)), 255 - idx, idx], -1).astype(np.uint8)
    assert np.array_equal(decode_webp(encode_webp(img, palette=True)), img)


def test_real_libwebp_alpha_plane():
    """Decode the VP8L-compressed alpha plane of a real libwebp file:
    69-entry color-indexing transform + code-length-coded prefix codes.
    Verify structural facts that would break under any mis-decode."""
    d = _PYTHON_WEBP
    i = 12
    chunks = {}
    while i + 8 <= len(d):
        tag = d[i : i + 4]
        size = struct.unpack("<I", d[i + 4 : i + 8])[0]
        chunks[tag] = d[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)
    alpha = decode_alpha_plane(chunks[b"ALPH"], 16, 16)
    assert alpha.shape == (16, 16)
    assert len(np.unique(alpha)) == 69  # matches the stream's palette size
    assert alpha.mean() > 100  # a mostly-opaque logo, not noise/zeros
    # the logo body is opaque, all four corners transparent
    assert alpha[1, 6] == 255 and alpha[12, 6] == 255 and alpha[5, 1] == 255
    assert alpha[0, 0] == 0 and alpha[15, 15] == 0
    assert alpha[0, 15] == 0 and alpha[15, 0] == 0


def test_lossy_vp8_raises():
    with pytest.raises(WebpError, match="lossy"):
        decode_webp(_PYTHON_WEBP)
    assert webp_meta(_PYTHON_WEBP) == (16, 16, 4)  # VP8X header parse


def test_not_riff_raises():
    with pytest.raises(WebpError):
        decode_webp(b"JUNKJUNKJUNKJUNK")


def test_truncated_raises():
    wb = encode_webp(np.random.RandomState(3).randint(0, 256, (6, 6), dtype=np.uint8))
    with pytest.raises(WebpError):
        decode_webp(wb[:-6])


def _vp8l(bw: _BitWriter) -> bytes:
    payload = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _pk(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def test_handcrafted_predictor_transform():
    """Decoder-only path: PREDICTOR transform (mode 1 = left) on a 4x2
    image; residuals hand-computed, sub-image emitted as a 1x1 stream."""
    bw = _BitWriter()
    bw.write(3, 14)  # w-1
    bw.write(1, 14)  # h-1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # PREDICTOR
    bw.write(0, 3)  # size_bits = 2 -> block 4 -> 1x1 sub-image
    _write_image_stream(bw, [_pk(255, 0, 1, 0)], is_level0=False)  # mode 1
    bw.write(0, 1)  # end of transforms
    # actual image: all pixels (a=255, r=100, g=100, b=100)
    # residuals: (0,0) predicts 0xff000000 -> (0,100,100,100);
    # row 0 others predict L -> 0; (0,1) predicts T -> 0; rest mode1 -> 0
    res = [_pk(0, 100, 100, 100)] + [_pk(0, 0, 0, 0)] * 7
    _write_image_stream(bw, res, is_level0=True)
    out = decode_webp(_vp8l(bw))
    assert out.shape == (2, 4, 3)
    assert (out == 100).all()


def test_handcrafted_cross_color_transform():
    """Decoder-only path: cross-color transform with green_to_red=16:
    delta = (int8(16) * int8(g)) >> 5."""
    bw = _BitWriter()
    bw.write(1, 14)  # w = 2
    bw.write(0, 14)  # h = 1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR transform
    bw.write(0, 3)  # block 4 -> 1x1
    # cte: g2r in blue channel, g2b in green, r2b in red
    _write_image_stream(bw, [_pk(255, 0, 0, 16)], is_level0=False)
    bw.write(0, 1)
    # actual pixels: (255, 100, 64, 10) and (255, 30, 200, 7)
    # g=64: delta=(16*64)>>5=32 -> stored r = 100-32=68
    # g=200: int8(200)=-56: delta=(16*-56)>>5=-28 -> stored r=30+28=58
    res = [_pk(255, 68, 64, 10), _pk(255, 58, 200, 7)]
    _write_image_stream(bw, res, is_level0=True)
    out = decode_webp(_vp8l(bw))
    assert out.tolist() == [[[100, 64, 10], [30, 200, 7]]]


def test_handcrafted_lz77_and_cache():
    """Decoder-only paths: color cache, LZ77 with the 2D distance map,
    CL-coded lengths with the max_symbol shortcut."""
    bw = _BitWriter()
    w, h = 5, 1
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transform
    bw.write(1, 1)  # cache present
    cache_bits = 4
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta
    pixel = _pk(255, 50, 50, 50)
    idx = (0x1E35A7BD * pixel & 0xFFFFFFFF) >> (32 - cache_bits)
    cache_sym = 256 + 24 + idx
    # green code: {50: len1, 257: len2 (length prefix code 1 -> value 2),
    #              cache_sym: len2}; emitted via CL code + max_symbol
    bw.write(0, 1)  # not simple
    cl = {0: 2, 1: 2, 2: 2, 18: 2}
    order = [17, 18, 0, 1, 2]
    bw.write(len(order) - 4, 4)
    for s in order:
        bw.write(cl.get(s, 0), 3)
    codes = {0: (0b00, 2), 1: (0b01, 2), 2: (0b10, 2), 18: (0b11, 2)}
    bw.write(1, 1)  # use max_symbol
    bw.write(1, 3)  # nbits = 4
    bw.write(5, 4)  # max_symbol = 7 code reads

    def emit(sym, extra=None, ebits=0):
        c, l = codes[sym]
        bw.write_code(c, l)
        if ebits:
            bw.write(extra, ebits)

    emit(18, 50 - 11, 7)   # zeros 0..49
    emit(1)                # symbol 50 -> len 1
    emit(18, 138 - 11, 7)  # zeros 51..188
    emit(18, 68 - 11, 7)   # zeros 189..256
    emit(2)                # symbol 257 (length prefix code 1) -> len 2
    zeros = cache_sym - 258
    assert zeros >= 11
    emit(18, zeros - 11, 7)
    emit(2)                # cache_sym -> len 2
    g_codes = {50: (0b0, 1), 257: (0b10, 2), cache_sym: (0b11, 2)}
    # red/blue/alpha: single-symbol; distance: single symbol 1
    for sym in (50, 50, 255):
        bw.write(1, 1); bw.write(0, 1)
        bw.write(1, 1); bw.write(sym, 8)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(1, 1)  # dist: single sym 1
    # pixels: literal; LZ77 len=2 via dist map[1]=(1,0)->dist 1; cache x2
    bw.write_code(*g_codes[50])            # literal (r/b/a single: 0 bits)
    bw.write_code(*g_codes[257])           # length code 1 -> value 2
    assert _DIST_MAP[1] == (1, 0)          # dist symbol single -> 0 bits
    bw.write_code(*g_codes[cache_sym])     # cache hit
    bw.write_code(*g_codes[cache_sym])
    out = decode_webp(_vp8l(bw))
    assert out.shape == (1, 5, 3)
    assert (out == 50).all()


def test_distance_map_prefix():
    assert _DIST_MAP[:8] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2)]
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120


def test_imaging_dispatch():
    from aristoteles_spark.formats.imaging import decode, sniff

    wb = encode_webp(np.full((3, 3), 77, dtype=np.uint8))
    assert sniff(wb) == "webp"
    assert decode(wb).shape == (3, 3, 3)
