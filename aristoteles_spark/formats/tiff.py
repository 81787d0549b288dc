"""Pure-Python baseline TIFF 6.0 encoder+decoder (uncompressed).

The last of the classic raster formats for the multimodal suite: II
(little-endian) byte order, a single IFD with the baseline required
tags, strip-based storage (the writer emits one strip; the reader
reassembles any strip layout), 8-bit grayscale (PhotometricInterpretation
1) and RGB (2). Compression 1 (none) only — LZW/JPEG-in-TIFF raise.

All structure from the public TIFF 6.0 specification (Adobe, 1992).

Reference scope note: as with formats/jpeg.py, this serves the engine's
multimodal-column extension (SURVEY.md §7.4); the reference itself has
no binary path (aristoteles/aristoteles.py:32-49).
"""

from __future__ import annotations

import struct

import numpy as np


class TiffError(ValueError):
    pass


_II = b"II"
_TYPE_SHORT = 3
_TYPE_LONG = 4

T_WIDTH = 256
T_LENGTH = 257
T_BITS = 258
T_COMPRESSION = 259
T_PHOTometric = 262
T_STRIP_OFFSETS = 273
T_SAMPLES = 277
T_ROWS_PER_STRIP = 278
T_STRIP_COUNTS = 279


def encode_tiff(arr: np.ndarray) -> bytes:
    """Uncompressed little-endian TIFF for uint8 (H,W) gray or (H,W,3)
    RGB; one strip."""
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise TiffError("need uint8 (H,W) or (H,W,3) array")
    h, w = arr.shape[:2]
    spp = 1 if arr.ndim == 2 else arr.shape[2]
    if spp not in (1, 3):
        raise TiffError("1 or 3 samples per pixel")
    data = arr.tobytes()

    entries = []  # (tag, type, count, value-or-bytes)
    extra = b""
    header_len = 8
    # layout: header | pixel data | [extra values] | IFD
    strip_off = header_len
    extra_off = strip_off + len(data)

    if spp == 3:
        bits_payload = struct.pack("<3H", 8, 8, 8)
        bits_val = extra_off + len(extra)
        extra += bits_payload
        entries_bits = (T_BITS, _TYPE_SHORT, 3, bits_val)
    else:
        entries_bits = (T_BITS, _TYPE_SHORT, 1, 8)

    entries = [
        (T_WIDTH, _TYPE_LONG, 1, w),
        (T_LENGTH, _TYPE_LONG, 1, h),
        entries_bits,
        (T_COMPRESSION, _TYPE_SHORT, 1, 1),
        (T_PHOTometric, _TYPE_SHORT, 1, 1 if spp == 1 else 2),
        (T_STRIP_OFFSETS, _TYPE_LONG, 1, strip_off),
        (T_SAMPLES, _TYPE_SHORT, 1, spp),
        (T_ROWS_PER_STRIP, _TYPE_LONG, 1, h),
        (T_STRIP_COUNTS, _TYPE_LONG, 1, len(data)),
    ]
    ifd_off = extra_off + len(extra)
    out = bytearray()
    out += _II + struct.pack("<HI", 42, ifd_off)
    out += data
    out += extra
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack("<HHI", tag, typ, cnt)
        if typ == _TYPE_SHORT and cnt == 1:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)


def _read_ifd(data: bytes):
    """Parse header + first IFD for either byte order; returns
    (endian_prefix, values(tag, default=None) accessor). Truncated or
    garbage input surfaces as TiffError, never a raw struct.error."""
    try:
        return _read_ifd_unchecked(data)
    except (struct.error, IndexError) as e:
        raise TiffError(f"truncated or corrupt TIFF: {e}") from e


def _read_ifd_unchecked(data: bytes):
    if data[:2] == b"II":
        en = "<"
    elif data[:2] == b"MM":
        en = ">"
    else:
        raise TiffError("not a TIFF (no II/MM byte-order mark)")
    if struct.unpack(en + "H", data[2:4])[0] != 42:
        raise TiffError("bad TIFF magic (42 expected)")
    (ifd_off,) = struct.unpack(en + "I", data[4:8])
    n = struct.unpack(en + "H", data[ifd_off : ifd_off + 2])[0]
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(en + "HHI", data[e : e + 8])
        (raw,) = struct.unpack(en + "I", data[e + 8 : e + 12])
        if typ == _TYPE_SHORT and cnt == 1:
            # a single SHORT sits in the FIRST two bytes of the value
            # field — which two bytes of the uint32 depends on order
            raw = (raw >> 16) if en == ">" else (raw & 0xFFFF)
        tags[tag] = (typ, cnt, raw)

    def values(tag, default=None):
        if tag not in tags:
            if default is not None:
                return default
            raise TiffError(f"missing tag {tag}")
        typ, cnt, raw = tags[tag]
        size = 2 if typ == _TYPE_SHORT else 4
        fmt = "H" if typ == _TYPE_SHORT else "I"
        if cnt * size <= 4:
            if cnt == 1:
                return [raw]
            # multiple short values packed inline, in file byte order
            packed = struct.pack(en + "I", raw)
            return list(struct.unpack(f"{en}{cnt}{fmt}", packed[: cnt * size]))
        return list(
            struct.unpack(f"{en}{cnt}{fmt}", data[raw : raw + cnt * size])
        )

    return en, values


def decode_tiff(data: bytes) -> np.ndarray:
    try:
        return _decode_tiff_unchecked(data)
    except (struct.error, IndexError) as e:
        raise TiffError(f"truncated or corrupt TIFF: {e}") from e


def _decode_tiff_unchecked(data: bytes) -> np.ndarray:
    en, values = _read_ifd(data)
    w = values(T_WIDTH)[0]
    h = values(T_LENGTH)[0]
    comp = values(T_COMPRESSION, [1])[0]
    if comp != 1:
        raise TiffError(f"compression {comp} not supported (uncompressed only)")
    spp = values(T_SAMPLES, [1])[0]
    photometric = values(T_PHOTometric, [1])[0]
    if photometric not in (0, 1, 2):
        raise TiffError(f"photometric {photometric} not supported")
    if photometric == 2 and spp < 3:
        raise TiffError("RGB photometric with <3 samples")
    bits = values(T_BITS, [8])
    if any(b != 8 for b in bits):
        raise TiffError("only 8 bits per sample supported")
    offsets = values(T_STRIP_OFFSETS)
    counts = values(T_STRIP_COUNTS)
    if len(offsets) != len(counts):
        raise TiffError("strip offsets/counts mismatch")
    raw = b"".join(data[o : o + c] for o, c in zip(offsets, counts))
    if len(raw) != w * h * spp:
        raise TiffError(f"pixel count mismatch: {len(raw)} != {w * h * spp}")
    arr = np.frombuffer(raw, dtype=np.uint8)
    arr = arr.reshape((h, w) if spp == 1 else (h, w, spp)).copy()
    if photometric == 0:  # WhiteIsZero: invert to the BlackIsZero scale
        arr = 255 - arr
    return arr


def tiff_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_channels) from the IFD alone — O(header), no
    pixel-data read (the strips are never touched)."""
    _, values = _read_ifd(data)
    w = values(T_WIDTH)[0]
    h = values(T_LENGTH)[0]
    spp = values(T_SAMPLES, [1])[0]
    return w, h, spp
