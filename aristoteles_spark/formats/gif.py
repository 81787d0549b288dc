"""Pure-Python GIF87a/89a encoder+decoder (LZW, palette images).

Covers the classic lossless palette format the multimodal suite was
missing: logical-screen/image descriptors, global color tables, the
variable-code-width LZW compressor/decompressor with CLEAR/EOI codes and
sub-block framing, interlace de-weaving, and Graphic Control Extension
skip-over. Grayscale-only convenience wrappers (palette = identity gray
ramp) keep round trips bit-exact, which is what lets decoded statistics
be stated by a SQL oracle.

All structure from the public GIF specification (GIF89a, CompuServe
1990) — no code derived from any GIF library.

Reference scope note: chime-experiment/aristoteles has no binary path
(aristoteles/aristoteles.py:32-49 is 16 float columns); this module
serves the engine's multimodal-column extension like formats/jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


# ------------------------------------------------------------------ LZW


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs codes LSB-first
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4097:  # table full -> reset
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise GifError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if not table:
            raise GifError("LZW data before CLEAR code")
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # 12-bit cap: encoders emitting
                # deferred clears keep coding with a full table — the
                # decoder must stop growing in lockstep
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError("LZW code out of range")
        out += entry
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry


# ---------------------------------------------------------------- encoder


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """GIF89a bytes for a (H,W) uint8 grayscale array (identity-gray
    256-entry global palette, single image, optional interlace)."""
    if arr.dtype != np.uint8 or arr.ndim != 2:
        raise GifError("need uint8 (H,W) array")
    h, w = arr.shape
    out = bytearray(b"GIF89a")
    # logical screen: global color table, 8 bits/channel, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):  # gray ramp palette
        out += bytes([i, i, i])
    out += b","  # image descriptor
    out += struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0x00)
    rows = arr
    if interlace:
        order = _interlace_order(h)
        rows = arr[order]
    out.append(8)  # LZW minimum code size
    lzw = _lzw_encode(rows.tobytes(), 8)
    for i in range(0, len(lzw), 255):  # sub-block framing
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out += b";"  # trailer
    return bytes(out)


def _interlace_order(h: int) -> list[int]:
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


# ---------------------------------------------------------------- decoder


def decode_gif(data: bytes) -> np.ndarray:
    """Decode a single-image GIF to uint8 (H,W) gray (when the palette
    is a gray ramp) or (H,W,3) RGB otherwise."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF")
    if len(data) < 13:
        raise GifError("truncated header")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if len(data) < pos + 3 * n:
            raise GifError("truncated global color table")
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while True:
        b = data[pos]
        pos += 1
        if b == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            x0, y0, iw, ih, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
            pos += 9
            pal = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise GifError("no color table")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(_lzw_decode(bytes(lzw), mcs), dtype=np.uint8)
            if len(idx) != iw * ih:
                raise GifError(
                    f"pixel count mismatch: {len(idx)} != {iw * ih}"
                )
            img = idx.reshape(ih, iw)
            if iflags & 0x40:  # interlaced: invert the weave
                order = _interlace_order(ih)
                out = np.empty_like(img)
                out[order] = img
                img = out
            rgb = pal[img]
            if (
                pal.shape[0] == 256
                and np.array_equal(pal[:, 0], np.arange(256))
                and np.array_equal(pal[:, 0], pal[:, 1])
                and np.array_equal(pal[:, 1], pal[:, 2])
            ):
                return img.copy()  # identity gray ramp -> (H,W)
            return rgb
        elif b == 0x3B:  # trailer
            raise GifError("no image data before trailer")
        else:
            raise GifError(f"unexpected block 0x{b:02x}")


def gif_meta(data: bytes) -> tuple[int, int]:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF")
    w, h = struct.unpack("<HH", data[6:10])
    return w, h
