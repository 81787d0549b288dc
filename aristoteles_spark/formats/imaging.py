"""Pure-Python image codecs: PNG (zlib stdlib), BMP (BI_RGB), PPM/PGM.

Real encode/decode — no Pillow required. Formats are implemented from
their public specifications (PNG: RFC 2083 / W3C PNG spec; BMP:
BITMAPINFOHEADER; PPM/PGM: netpbm P5/P6). Scope is the subset a
training-data pipeline's feature-extraction stage needs: 8-bit
grayscale / RGB / RGBA, non-interlaced, single IDAT stream (decoder
accepts split IDATs), all five PNG row filters on decode.

Arrays are numpy uint8, shape (H, W) for grayscale or (H, W, C) for
multichannel. These kernels run inside ``mapInPandas`` batches
(multimodal/features.py) — per-image Python cost is amortized over
Arrow-batched transfer, and the surrounding plan never shuffles blobs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_COLOR_TYPE = {1: 0, 3: 2, 4: 6}          # channels -> PNG color type
_CHANNELS = {0: 1, 2: 3, 6: 4}            # PNG color type -> channels


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Apply PNG filter ``ftype`` to a raw row (encode direction)."""
    r = row.astype(np.int16)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int16)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - ((left + up) // 2)
    elif ftype == 4:
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
        out = r - pred
    else:
        raise ValueError(f"bad filter {ftype}")
    return (out % 256).astype(np.uint8)


def _unfilter_row(ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Invert PNG filter ``ftype`` in place-order (decode direction).
    Filters 1/3/4 depend on the already-reconstructed left pixel, so
    they run sequentially across the row (vector across channels)."""
    n = cur.shape[0]
    out = np.empty(n, dtype=np.uint8)
    if ftype == 0:
        return cur.copy()
    if ftype == 2:
        return ((cur.astype(np.int16) + prev) % 256).astype(np.uint8)
    prev16 = prev.astype(np.int16)
    cur16 = cur.astype(np.int16)
    for i in range(n):
        a = int(out[i - bpp]) if i >= bpp else 0          # left
        b = int(prev16[i])                                 # up
        c = int(prev16[i - bpp]) if i >= bpp else 0        # up-left
        if ftype == 1:
            pred = a
        elif ftype == 3:
            pred = (a + b) // 2
        else:  # 4 Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (cur16[i] + pred) % 256
    return out


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit non-interlaced PNG. ``filter_type`` selects the row filter
    (0..4) — useful for exercising every decoder unfilter path."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    flat = arr.reshape(h, w * ch)
    prev = np.zeros(w * ch, dtype=np.uint8)
    stream = bytearray()
    for y in range(h):
        stream.append(filter_type)
        stream += _filter_row(filter_type, flat[y], prev, ch).tobytes()
        prev = flat[y]
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(stream), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("bad PNG payload size")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        )
        out[y] = _unfilter_row(ftype, row, prev, ch)
        prev = out[y]
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def encode_bmp(arr: np.ndarray) -> bytes:
    """24-bit uncompressed BMP (BI_RGB), bottom-up, BGR byte order."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.shape[2] == 4:
        arr = arr[:, :, :3]
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = arr[y, :, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (row_bytes - len(row))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header) + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    hsize, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit BI_RGB BMP supported")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        start = offset + i * row_bytes
        row = np.frombuffer(data, dtype=np.uint8, count=w * 3, offset=start)
        y = (h - 1 - i) if flip else i
        out[y] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return out


def encode_ppm(arr: np.ndarray) -> bytes:
    """netpbm binary: P5 (grayscale) or P6 (RGB)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("PPM supports 1 or 3 channels")
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while data[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit netpbm supported")
    ch = 1 if data[:2] == b"P5" else 3
    img = np.frombuffer(data, dtype=np.uint8, count=w * h * ch, offset=pos)
    return img.reshape(h, w) if ch == 1 else img.reshape(h, w, ch)


def sniff(data: bytes) -> str | None:
    if data[:8] == PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] in (b"P5", b"P6"):
        return "ppm"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    return None


def decode(data: bytes) -> np.ndarray:
    fmt = sniff(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "jpeg":
        from aristoteles_spark.formats.jpeg import decode_jpeg

        return decode_jpeg(data)
    if fmt == "gif":
        from aristoteles_spark.formats.gif import decode_gif

        return decode_gif(data)
    if fmt == "tiff":
        from aristoteles_spark.formats.tiff import decode_tiff

        return decode_tiff(data)
    if fmt == "webp":
        from aristoteles_spark.formats.webp import decode_webp

        return decode_webp(data)
    raise ValueError("unrecognized image format")


def image_meta(data: bytes) -> tuple[int, int, int, float]:
    """(width, height, channels, mean_px in [0,1]) via a REAL decode."""
    img = decode(data)
    ch = 1 if img.ndim == 2 else img.shape[2]
    h, w = img.shape[:2]
    return w, h, ch, float(img.mean()) / 255.0


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    arr = np.asarray(arr)
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]


def resize_bilinear(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    arr = np.asarray(arr, dtype=np.float64)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    # align-corners=False sample grid (the common ML convention)
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    top = arr[y0][:, x0] * (1 - wx) + arr[y0][:, x1] * wx
    bot = arr[y1][:, x0] * (1 - wx) + arr[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out
