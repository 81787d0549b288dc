"""Pure-Python baseline JPEG (ITU-T T.81 / ISO 10918-1) encoder+decoder.

Closes the "compressed image formats need Pillow" gap for baseline
sequential DCT JPEGs: SOI/APP0/DQT/SOF0/DHT/SOS/EOI marker structure,
canonical Huffman entropy coding with byte stuffing and restart markers,
DPCM DC + run-length AC, dequantize → de-zigzag → 2-D IDCT, chroma
upsampling and JFIF YCbCr→RGB. The encoder emits grayscale or 4:4:4
color with the spec's Annex K quantization (libjpeg quality scaling) and
Huffman tables; the decoder accepts any baseline stream with sampling
factors ≤ 2 (4:4:4, 4:2:2, 4:2:0, grayscale), multiple DQT/DHT
segments, and DRI/RSTn restart intervals.

All table constants below are from the public JPEG specification
(Annex K) — no code derived from any JPEG library.

Reference scope note: chime-experiment/aristoteles has no binary-blob
path at all (its data is 16 float columns, aristoteles/aristoteles.py:
32-49); this module serves the engine's multimodal-column extension
(SURVEY.md §7.4) the same way formats/imaging.py serves PNG/BMP.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- spec constants

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

STD_LUM_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

STD_CHROM_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: dct2(B) = C @ B @ C.T, idct2 = C.T @ D @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


class JpegError(ValueError):
    pass


# ------------------------------------------------------------- bit plumbing


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            b = (self._acc >> self._nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0
        self.marker: int | None = None  # marker that ended the segment

    def _fill(self) -> None:
        d = self.data
        if self.marker is not None:
            # past end-of-segment: spec behavior is to feed 1-bits
            self._acc = (self._acc << 8) | 0xFF
            self._nbits += 8
            return
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:  # stuffed literal FF
                self.pos += 2
            else:
                self.marker = nxt
                self._acc = (self._acc << 8) | 0xFF
                self._nbits += 8
                return
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def read_bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Discard bits, consume the pending marker, return its code."""
        self._acc = 0
        self._nbits = 0
        if self.marker is None:
            # scan forward for the next marker byte pair
            d = self.data
            while d[self.pos] != 0xFF or d[self.pos + 1] == 0x00:
                self.pos += 1
            self.marker = d[self.pos + 1]
            # leave pos at the 0xFF
        m = self.marker
        self.pos = self.data.index(bytes([0xFF, m]), self.pos) + 2
        self.marker = None
        return m


# ---------------------------------------------------------------- huffman


def _canonical_codes(bits: list[int], vals: list[int]):
    """(value -> (code, length)) and (code,length) -> value maps from the
    spec's BITS/HUFFVAL canonical construction."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            dec[(code, length)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return enc, dec


def _decode_symbol(br: _BitReader, dec: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = dec.get((code, length))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _magnitude(v: int) -> tuple[int, int]:
    """(category, raw bits) for a DC difference / AC coefficient."""
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


# ---------------------------------------------------------------- encoder


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    lum = np.clip((STD_LUM_QT * scale + 50) // 100, 1, 255).astype(np.int32)
    chrom = np.clip((STD_CHROM_QT * scale + 50) // 100, 1, 255).astype(np.int32)
    return lum, chrom


def _encode_block(
    bw: _BitWriter, block: np.ndarray, qt: np.ndarray,
    dc_enc, ac_enc, pred: int,
) -> int:
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    q = np.rint(coef / qt).astype(np.int32).reshape(64)[ZIGZAG]
    # DC (DPCM)
    diff = int(q[0]) - pred
    t, bits = _magnitude(diff)
    code, length = dc_enc[t]
    bw.write(code, length)
    if t:
        bw.write(bits, t)
    # AC run-length
    run = 0
    last_nz = max(np.nonzero(q[1:])[0], default=-1)
    for i in range(1, 2 + last_nz):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_enc[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        t, bits = _magnitude(v)
        code, length = ac_enc[(run << 4) | t]
        bw.write(code, length)
        bw.write(bits, t)
        run = 0
    if last_nz < 62:  # not all 63 AC present -> EOB
        code, length = ac_enc[0x00]
        bw.write(code, length)
    return int(q[0])


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG bytes for a (H,W) grayscale or (H,W,3) RGB uint8
    array. Grayscale -> single component; RGB -> JFIF YCbCr, 4:4:4 or
    4:2:0 (2x2 box-averaged chroma). ``restart_interval`` > 0 emits a
    DRI segment and RSTn markers every that many MCUs."""
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise JpegError("need uint8 (H,W) or (H,W,3) array")
    if subsampling not in ("444", "420"):
        raise JpegError("subsampling must be '444' or '420'")
    h, w = arr.shape[:2]
    color = arr.ndim == 3
    lum_qt, chrom_qt = _quality_tables(quality)

    if color:
        f = arr.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [np.clip(np.rint(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)]
        qts = [lum_qt, chrom_qt, chrom_qt]
        if subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            sub = []
            for p in planes[1:]:
                # pad to even then 2x2 box average
                pp = np.pad(
                    p, ((0, h % 2), (0, w % 2)), mode="edge"
                ).astype(np.float64)
                ds = (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0
                sub.append(np.clip(np.rint(ds), 0, 255).astype(np.uint8))
            planes = [planes[0]] + sub
        else:
            samp = [(1, 1)] * 3
    else:
        planes = [arr]
        qts = [lum_qt]
        samp = [(1, 1)]

    ncomp = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    dc_lum = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)[0]
    ac_lum = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)[0]
    dc_chrom = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)[0]
    ac_chrom = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)[0]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, b"\x00" + bytes(lum_qt.reshape(64)[ZIGZAG].astype(np.uint8)))
    if color:
        out += _marker(
            0xDB, b"\x01" + bytes(chrom_qt.reshape(64)[ZIGZAG].astype(np.uint8))
        )
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1])
    out += _marker(0xC0, sof)
    out += _marker(0xC4, bytes([0x00] + DC_LUM_BITS + DC_LUM_VALS))
    out += _marker(0xC4, bytes([0x10] + AC_LUM_BITS + AC_LUM_VALS))
    if color:
        out += _marker(0xC4, bytes([0x01] + DC_CHROM_BITS + DC_CHROM_VALS))
        out += _marker(0xC4, bytes([0x11] + AC_CHROM_BITS + AC_CHROM_VALS))
    if restart_interval:
        out += _marker(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)

    # pad each component plane to its MCU grid via edge replication
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for (sh, sv), p in zip(samp, planes):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )

    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci in range(ncomp):
                dc_enc = dc_lum if ci == 0 else dc_chrom
                ac_enc = ac_lum if ci == 0 else ac_chrom
                sh, sv = samp[ci]
                for v in range(sv):
                    for hh in range(sh):
                        y0 = (my * sv + v) * 8
                        x0 = (mx * sh + hh) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, qts[ci], dc_enc, ac_enc, preds[ci]
                        )
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to uint8 (H,W) or (H,W,3)."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0

    while True:
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        m = data[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            raise JpegError("EOI before SOS")
        if m in (0x01,) or 0xD0 <= m <= 0xD7:  # standalone
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + seglen]
        if m == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise JpegError("16-bit quant tables not baseline")
                z = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(np.int32)
                qt = np.zeros(64, dtype=np.int32)
                qt[ZIGZAG] = z
                qtables[tq] = qt.reshape(8, 8)
                i += 65
        elif m == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                dec = _canonical_codes(bits, vals)[1]
                (huff_ac if tc else huff_dc)[th] = dec
                i += 17 + nv
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 (baseline/extended seq)
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif m == 0xC2:  # SOF2: progressive DCT — dedicated decoder
            from aristoteles_spark.formats.jpeg_progressive import (
                decode_jpeg_progressive,
            )

            return decode_jpeg_progressive(data)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("lossless/arithmetic JPEG not supported")
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif m == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            if ns < len(frame["comps"]):
                # non-interleaved multi-scan baseline (one SOS per
                # component): returning after the first scan would
                # silently yield just the Y plane — reject explicitly,
                # mirroring the progressive/arithmetic rejection above
                raise JpegError(
                    "non-interleaved multi-scan baseline not supported "
                    f"(SOS has {ns} of {len(frame['comps'])} components)"
                )
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            pos = pos + seglen
            return _decode_scan(
                data, pos, frame, scan, qtables, huff_dc, huff_ac, restart_interval
            )
        # APPn/COM/others: skip
        pos += seglen


def _decode_scan(data, pos, frame, scan, qtables, huff_dc, huff_ac, dri):
    h, w = frame["h"], frame["w"]
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise JpegError("sampling factors > 2 not supported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64))

    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                m = br.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise JpegError(f"expected RST marker, got {m:02x}")
                preds = [0] * len(comps)
            for ci, (c, td, ta) in enumerate(scan):
                qt = qtables[c["tq"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk, preds[ci] = _decode_block(
                            br, huff_dc[td], huff_ac[ta], qt, preds[ci]
                        )
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1

    # upsample to full resolution (pixel replication) and crop
    full = []
    for c, p in zip(comps, planes):
        if c["h"] != hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] != vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:h, :w])

    if len(full) == 1:
        return np.clip(np.rint(full[0] + 128.0), 0, 255).astype(np.uint8)
    y, cb, cr = full[0] + 128.0, full[1] + 128.0, full[2] + 128.0
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _decode_block(br, dc_dec, ac_dec, qt, pred):
    q = np.zeros(64, dtype=np.int32)
    t = _decode_symbol(br, dc_dec)
    diff = _extend(br.read_bits(t), t) if t else 0
    pred += diff
    q[0] = pred
    i = 1
    while i < 64:
        rs = _decode_symbol(br, ac_dec)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                i += 16
                continue
            break  # EOB
        i += r
        if i > 63:
            raise JpegError("AC run past block end")
        q[i] = _extend(br.read_bits(s), s)
        i += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[ZIGZAG] = q * qt.reshape(64)[ZIGZAG]
    blk = _C.T @ coef.reshape(8, 8) @ _C  # level shift applied by caller
    return blk, pred


def jpeg_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) straight from the SOF0/SOF1 frame
    header — O(header), no entropy decode. A stream whose markers are
    fine but whose scan data is corrupt still yields metadata (the
    right behavior for a catalog/stats pass over a 100 TB corpus;
    decode_jpeg is the integrity check)."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        m = data[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:  # standalone
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        if m in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            _prec, fh, fw, nc = struct.unpack(">BHHB", data[pos + 2 : pos + 8])
            return fw, fh, nc
        if m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("lossless/arithmetic JPEG not supported")
        if m == 0xDA:  # SOS before any SOF
            break
        pos += seglen
    raise JpegError("no SOF0/SOF1/SOF2 frame header found")
