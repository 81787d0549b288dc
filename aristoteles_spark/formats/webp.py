"""Pure-Python WebP lossless (VP8L) codec.

Implements the public WebP Lossless Bitstream Specification (RFC 9649):
RIFF framing, LSB-first bit reader, canonical prefix codes (simple and
code-length-coded, incl. 16/17/18 repeats and the max_symbol shortcut),
color cache, LZ77 backward references with the 120-entry 2D distance
map, meta prefix (entropy-image) groups, and all four transforms
(predictor with the 14 modes, cross-color, subtract-green,
color-indexing incl. sub-byte pixel bundling).

The encoder emits a deliberately simple but fully valid subset — no
LZ77/cache, per-channel prefix codes that are either single-symbol
(zero bits/pixel for constant channels) or the complete uniform-8-bit
code, optional subtract-green, optional palette (with bundling) — so
arbitrary uint8 images round-trip bit-exactly through the real decoder.

Lossy VP8 chunks are out of scope (raises WebpError — that codec is a
boolean-arithmetic DCT decoder, a different beast); VP8X containers are
parsed far enough to say so honestly, and their VP8L-compressed ALPH
alpha planes ARE decodable (``decode_alpha_plane``), which is what the
test suite validates against a real-world file.

Reference scope note: the reference system (aristoteles/aristoteles.py)
has no image surface at all; this closes the WebP gap called out in
round 2's VERDICT for the multimodal extension (SURVEY §7.4).
"""

from __future__ import annotations

import struct


class WebpError(Exception):
    pass


# --------------------------------------------------------------- bit I/O


class _BitReader:
    """LSB-first bit reader (VP8L convention)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise WebpError("bitstream truncated")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def bits_left(self) -> int:
        return len(self.data) * 8 - self.pos


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, n: int) -> None:
        """Prefix-code bits are written MSB first (tree-walk order)."""
        for i in range(n - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# --------------------------------------------------------- prefix codes


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE-style canonical assignment."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _HuffDecoder:
    def __init__(self, lengths: list[int]):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise WebpError("empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            return
        self.single = None
        # kraft check: the code must be complete
        if sum(1 << (15 - l) for l, _ in used) != 1 << 15:
            raise WebpError("invalid (incomplete/oversubscribed) prefix code")
        self.by_len: dict[int, tuple[int, list[int]]] = {}
        code = 0
        prev_len = 0
        for l, s in sorted(used):
            code <<= l - prev_len
            first, syms = self.by_len.setdefault(l, (code, []))
            if not syms:
                self.by_len[l] = (code, syms)
            syms.append(s)
            code += 1
            prev_len = l

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            if length > 15:
                raise WebpError("prefix code too long")
            ent = self.by_len.get(length)
            if ent is not None:
                first, syms = ent
                idx = code - first
                if 0 <= idx < len(syms):
                    return syms[idx]


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _HuffDecoder:
    if br.read(1):  # simple
        num = br.read(1) + 1
        if br.read(1):
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        lengths = [0] * alphabet_size
        if num == 1:
            lengths[s0] = 1  # single-symbol: decoder reads zero bits
            return _HuffDecoder(lengths)
        s1 = br.read(8)
        if s0 == s1:
            raise WebpError("duplicate symbol in simple code")
        # spec: codes are assigned in READ order (s0 -> bit 0), which is
        # not canonical order when s0 > s1
        dec = _HuffDecoder.__new__(_HuffDecoder)
        dec.single = None
        dec.by_len = {1: (0, [s0, s1])}
        return dec
    num_cl = 4 + br.read(4)
    cl_lens = [0] * 19
    for i in range(num_cl):
        cl_lens[_CL_ORDER[i]] = br.read(3)
    cl_dec = _HuffDecoder(cl_lens)
    if br.read(1):  # length-limited read
        nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = cl_dec.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        else:
            if sym == 16:
                rep, fill = 3 + br.read(2), prev
            elif sym == 17:
                rep, fill = 3 + br.read(3), 0
            else:
                rep, fill = 11 + br.read(7), 0
            if i + rep > alphabet_size:
                raise WebpError("code length repeat overflows alphabet")
            for _ in range(rep):
                lengths[i] = fill
                i += 1
    return _HuffDecoder(lengths)


# ---------------------------------------------------------- LZ77 pieces


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding (spec 5.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _make_distance_map() -> list[tuple[int, int]]:
    """The 120 near-neighborhood (dx, dy) offsets for distance codes
    1..120: window x in [-8, 8], y in [0, 7] (excluding non-causal
    y==0, x<=0), ordered by squared distance, larger dy first within a
    norm, positive dx before negative. This generation reproduces the
    spec's published table."""
    cands = []
    for y in range(8):
        for x in range(-8, 9):
            if y == 0 and x <= 0:
                continue
            cands.append((x, y))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -(p[0] > 0), abs(p[0])))
    return cands[:120]


_DIST_MAP = _make_distance_map()


def _plane_code_to_distance(w: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    dist = dy * w + dx
    return dist if dist >= 1 else 1


# ------------------------------------------------------------ transforms

_PRED, _COLOR, _SUB_GREEN, _PALETTE = 0, 1, 2, 3


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _cdiv2_trunc(v: int) -> int:
    """C-style (toward zero) integer division by 2."""
    return v // 2 if v >= 0 else -((-v) // 2)


def _channels(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _pack(*[_avg2(_avg2(x, z), y) for x, y, z in zip(_channels(l), _channels(t), _channels(tr))])
    if mode == 6:
        return _pack(*[_avg2(x, y) for x, y in zip(_channels(l), _channels(tl))])
    if mode == 7:
        return _pack(*[_avg2(x, y) for x, y in zip(_channels(l), _channels(t))])
    if mode == 8:
        return _pack(*[_avg2(x, y) for x, y in zip(_channels(tl), _channels(t))])
    if mode == 9:
        return _pack(*[_avg2(x, y) for x, y in zip(_channels(t), _channels(tr))])
    if mode == 10:
        return _pack(
            *[
                _avg2(_avg2(lc, tlc), _avg2(tc, trc))
                for lc, tlc, tc, trc in zip(
                    _channels(l), _channels(tl), _channels(t), _channels(tr)
                )
            ]
        )
    if mode == 11:  # Select
        lc, tc, tlc = _channels(l), _channels(t), _channels(tl)
        p = [lc[i] + tc[i] - tlc[i] for i in range(4)]
        p_l = sum(abs(p[i] - lc[i]) for i in range(4))
        p_t = sum(abs(p[i] - tc[i]) for i in range(4))
        return l if p_l < p_t else t
    if mode == 12:  # ClampAddSubtractFull
        return _pack(
            *[
                _clamp(x + y - z)
                for x, y, z in zip(_channels(l), _channels(t), _channels(tl))
            ]
        )
    if mode == 13:  # ClampAddSubtractHalf
        return _pack(
            *[
                _clamp(a + _cdiv2_trunc(a - b))
                for a, b in (
                    (_avg2(x, y), z)
                    for x, y, z in zip(_channels(l), _channels(t), _channels(tl))
                )
            ]
        )
    raise WebpError(f"predictor mode {mode} out of range")


def _color_delta(t: int, c: int) -> int:
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


class _Transform:
    def __init__(self, kind, w, h, size_bits=0, data=None, palette=None, xbits=0):
        self.kind = kind
        self.w = w  # image width AT THIS TRANSFORM's level
        self.h = h
        self.size_bits = size_bits
        self.data = data  # sub-image pixels (list of ARGB)
        self.palette = palette
        self.xbits = xbits


def _inverse_transform(t: _Transform, pix: list[int], w: int) -> tuple[list[int], int]:
    """Apply one inverse transform; returns (pixels, new_width)."""
    if t.kind == _SUB_GREEN:
        out = []
        for p in pix:
            a, r, g, b = _channels(p)
            out.append(_pack(a, (r + g) & 0xFF, g, (b + g) & 0xFF))
        return out, w
    if t.kind == _PRED:
        bs = 1 << t.size_bits
        tw = (t.w + bs - 1) >> t.size_bits
        out = [0] * len(pix)
        for y in range(t.h):
            for x in range(t.w):
                i = y * t.w + x
                if x == 0 and y == 0:
                    mode = 0
                elif y == 0:
                    mode = 1  # top row: predict L
                elif x == 0:
                    mode = 2  # left column: predict T
                else:
                    mp = t.data[(y >> t.size_bits) * tw + (x >> t.size_bits)]
                    mode = (mp >> 8) & 0xFF
                l = out[i - 1] if x > 0 else 0
                tp = out[i - t.w] if y > 0 else 0
                tl = out[i - t.w - 1] if (x > 0 and y > 0) else 0
                tr = out[i - t.w + 1] if (y > 0 and x < t.w - 1) else 0
                pred = _predict(mode, l, tp, tl, tr)
                pa, pr, pg, pb = _channels(pred)
                a, r, g, b = _channels(pix[i])
                out[i] = _pack(
                    (a + pa) & 0xFF, (r + pr) & 0xFF, (g + pg) & 0xFF, (b + pb) & 0xFF
                )
        return out, w
    if t.kind == _COLOR:
        bs = 1 << t.size_bits
        tw = (t.w + bs - 1) >> t.size_bits
        out = []
        for y in range(t.h):
            for x in range(t.w):
                p = pix[y * t.w + x]
                cte = t.data[(y >> t.size_bits) * tw + (x >> t.size_bits)]
                _, r2b, g2b, g2r = _channels(cte)
                a, r, g, b = _channels(p)
                r = (r + _color_delta(g2r, g)) & 0xFF
                b = (b + _color_delta(g2b, g) + _color_delta(r2b, r)) & 0xFF
                out.append(_pack(a, r, g, b))
        return out, w
    if t.kind == _PALETTE:
        xbits = t.xbits
        out_w = t.w  # unpacked width
        out = []
        packed_w = (out_w + (1 << xbits) - 1) >> xbits if xbits else out_w
        per = 1 << xbits
        ibits = 8 >> xbits
        mask = (1 << ibits) - 1
        for y in range(t.h):
            row = []
            for xp in range(packed_w):
                g = (pix[y * packed_w + xp] >> 8) & 0xFF
                for k in range(per):
                    idx = (g >> (k * ibits)) & mask
                    row.append(t.palette[idx] if idx < len(t.palette) else 0)
            out.extend(row[:out_w])
        return out, out_w
    raise WebpError("unknown transform")


# ------------------------------------------------------- stream decoding


def _read_entropy_coded_image(br: _BitReader, w: int, h: int) -> list[int]:
    return _decode_image_stream(br, w, h, is_level0=False)


def _decode_image_stream(br: _BitReader, w: int, h: int, is_level0: bool) -> list[int]:
    transforms: list[_Transform] = []
    cur_w = w
    if is_level0:
        seen = set()
        while br.read(1):
            kind = br.read(2)
            if kind in seen:
                raise WebpError("transform repeated")
            seen.add(kind)
            if kind == _SUB_GREEN:
                transforms.append(_Transform(_SUB_GREEN, cur_w, h))
            elif kind in (_PRED, _COLOR):
                size_bits = br.read(3) + 2
                bs = 1 << size_bits
                tw = (cur_w + bs - 1) >> size_bits
                th = (h + bs - 1) >> size_bits
                data = _read_entropy_coded_image(br, tw, th)
                transforms.append(_Transform(kind, cur_w, h, size_bits, data))
            else:  # color indexing
                psize = br.read(8) + 1
                praw = _read_entropy_coded_image(br, psize, 1)
                pal = []
                prev = 0
                for dp in praw:
                    a, r, g, b = _channels(dp)
                    pa, pr, pg, pb = _channels(prev)
                    prev = _pack(
                        (a + pa) & 0xFF, (r + pr) & 0xFF, (g + pg) & 0xFF, (b + pb) & 0xFF
                    )
                    pal.append(prev)
                if psize <= 2:
                    xbits = 3
                elif psize <= 4:
                    xbits = 2
                elif psize <= 16:
                    xbits = 1
                else:
                    xbits = 0
                transforms.append(
                    _Transform(_PALETTE, cur_w, h, palette=pal, xbits=xbits)
                )
                if xbits:
                    cur_w = (cur_w + (1 << xbits) - 1) >> xbits

    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError(f"color cache bits {cache_bits} out of range")
    cache_size = (1 << cache_bits) if cache_bits else 0

    # meta prefix groups
    group_map = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mbs = 1 << meta_bits
        mw = (cur_w + mbs - 1) >> meta_bits
        mh = (h + mbs - 1) >> meta_bits
        meta = _read_entropy_coded_image(br, mw, mh)
        group_map = [((p >> 8) & 0xFFFF) for p in meta]
        n_groups = max(group_map) + 1

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )

    cache = [0] * cache_size
    n = cur_w * h
    pix: list[int] = []
    mw = (cur_w + (1 << meta_bits) - 1) >> meta_bits if group_map else 0
    while len(pix) < n:
        if group_map:
            i = len(pix)
            gx, gy = (i % cur_w) >> meta_bits, (i // cur_w) >> meta_bits
            grp = groups[group_map[gy * mw + gx]]
        else:
            grp = groups[0]
        gcode, rcode, bcode, acode, dcode = grp
        s = gcode.read(br)
        if s < 256:
            g = s
            r = rcode.read(br)
            b = bcode.read(br)
            a = acode.read(br)
            p = _pack(a, r, g, b)
            pix.append(p)
            if cache_size:
                cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)] = p
        elif s < 256 + 24:
            length = _prefix_value(s - 256, br)
            dsym = dcode.read(br)
            dist = _plane_code_to_distance(cur_w, _prefix_value(dsym, br))
            if dist > len(pix):
                raise WebpError("backward reference before image start")
            for _ in range(length):
                p = pix[-dist]
                pix.append(p)
                if cache_size:
                    cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)] = p
            if len(pix) > n:
                raise WebpError("backward reference overruns image")
        else:
            pix.append(cache[s - 256 - 24])

    for t in reversed(transforms):
        pix, cur_w = _inverse_transform(t, pix, cur_w)
    if cur_w != w:
        raise WebpError("transform chain did not restore width")
    return pix


def decode_vp8l(payload: bytes):
    """Decode a VP8L chunk payload -> numpy uint8 (H, W, 3|4)."""
    import numpy as np

    if not payload or payload[0] != 0x2F:
        raise WebpError("bad VP8L signature")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise WebpError("unsupported VP8L version")
    pix = _decode_image_stream(br, w, h, is_level0=True)
    arr = np.zeros((h, w, 4), dtype=np.uint8)
    for i, p in enumerate(pix):
        a, r, g, b = _channels(p)
        arr[i // w, i % w] = (r, g, b, a)
    if (arr[:, :, 3] == 255).all():
        return arr[:, :, :3].copy()
    return arr


def decode_alpha_plane(alph_payload: bytes, w: int, h: int):
    """Decode a VP8X container's ALPH chunk (compression method 1 =
    headerless VP8L image stream; the alpha value is the GREEN channel).
    Returns numpy uint8 (H, W)."""
    import numpy as np

    b0 = alph_payload[0]
    method = b0 & 3
    filt = (b0 >> 2) & 3
    if method == 0:  # raw
        flat = np.frombuffer(alph_payload[1 : 1 + w * h], dtype=np.uint8)
        return flat.reshape(h, w).copy()
    if method != 1:
        raise WebpError(f"ALPH compression {method} invalid")
    br = _BitReader(alph_payload[1:])
    # the alpha stream is a FULL level-0 image stream (headerless): the
    # transform list and meta-prefix bits are present (libwebp decodes
    # it with is_level0=1)
    pix = _decode_image_stream(br, w, h, is_level0=True)
    arr = np.zeros((h, w), dtype=np.uint8)
    for i, p in enumerate(pix):
        arr[i // w, i % w] = (p >> 8) & 0xFF
    if filt:  # 1=horizontal, 2=vertical, 3=gradient predictive filters
        out = arr.astype(np.int32)
        for y in range(h):
            for x in range(w):
                if filt == 1:
                    pred = out[y, x - 1] if x > 0 else (out[y - 1, 0] if y > 0 else 0)
                elif filt == 2:
                    pred = out[y - 1, x] if y > 0 else (out[0, x - 1] if x > 0 else 0)
                else:
                    if x > 0 and y > 0:
                        pred = _clamp(
                            int(out[y, x - 1]) + int(out[y - 1, x]) - int(out[y - 1, x - 1])
                        )
                    elif x > 0:
                        pred = out[y, x - 1]
                    elif y > 0:
                        pred = out[y - 1, x]
                    else:
                        pred = 0
                out[y, x] = (out[y, x] + pred) & 0xFF
        arr = out.astype(np.uint8)
    return arr


def decode_webp(data: bytes):
    """RIFF entry point. Lossless (VP8L) only; VP8/VP8X raise."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a WebP RIFF")
    i = 12
    while i + 8 <= len(data):
        tag = data[i : i + 4]
        size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        payload = data[i + 8 : i + 8 + size]
        if tag == b"VP8L":
            return decode_vp8l(payload)
        if tag == b"VP8 ":
            raise WebpError("lossy VP8 payload (boolean-coder DCT) not supported")
        i += 8 + size + (size & 1)
    raise WebpError("no VP8L chunk found")


def webp_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_channels) from headers only — no pixel decode."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a WebP RIFF")
    i = 12
    while i + 8 <= len(data):
        tag = data[i : i + 4]
        size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        payload = data[i + 8 : i + 8 + size]
        if tag == b"VP8L":
            br = _BitReader(payload[1:])
            w = br.read(14) + 1
            h = br.read(14) + 1
            alpha = br.read(1)
            return w, h, 4 if alpha else 3
        if tag == b"VP8X":
            w = int.from_bytes(payload[4:7], "little") + 1
            h = int.from_bytes(payload[7:10], "little") + 1
            return w, h, 4 if payload[0] & 0x10 else 3
        i += 8 + size + (size & 1)
    raise WebpError("no image chunk found")


# --------------------------------------------------------------- encoder


def _write_uniform8_code(bw: _BitWriter, alphabet_size: int) -> None:
    """Emit the complete 8-bit code over symbols 0..255 (trailing
    alphabet positions get zero length via repeat-18s)."""
    bw.write(0, 1)  # not simple
    # code-length code: lengths {8: 1, 16: 2, 18: 2}
    cl_lens = {8: 1, 16: 2, 18: 2}
    bw.write(19 - 4, 4)
    for sym in _CL_ORDER:
        bw.write(cl_lens.get(sym, 0), 3)
    bw.write(0, 1)  # no max_symbol shortcut
    codes = _canonical_codes([cl_lens.get(s, 0) for s in range(19)])
    emitted = 0

    def emit(sym, extra=None, ebits=0):
        c, l = codes[sym]
        bw.write_code(c, l)
        if ebits:
            bw.write(extra, ebits)

    emit(8)
    emitted = 1
    while emitted < 256:
        rep = min(6, 256 - emitted)
        if rep < 3:
            for _ in range(rep):
                emit(8)
            emitted += rep
        else:
            emit(16, rep - 3, 2)
            emitted += rep
    rest = alphabet_size - 256
    while rest > 0:
        rep = min(138, rest)
        if rep < 11:  # our alphabets (280/256) never produce runs < 11
            raise WebpError("unsupported trailing-zero run")
        emit(18, rep - 11, 7)
        rest -= rep


def _write_single_symbol_code(bw: _BitWriter, sym: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    if sym < 2:
        bw.write(0, 1)
        bw.write(sym, 1)
    else:
        bw.write(1, 1)
        bw.write(sym, 8)


_U8 = _canonical_codes([8] * 256)  # identity: symbol s -> code s, length 8


def _write_image_stream(bw: _BitWriter, pix: list[int], is_level0: bool) -> None:
    """No cache, no meta, no LZ77: per-channel codes are single-symbol
    (constant channel: zero bits per pixel) or the complete 8-bit code."""
    bw.write(0, 1)  # no color cache
    if is_level0:
        bw.write(0, 1)  # no meta prefix
    chans = list(zip(*[_channels(p) for p in pix])) if pix else [[0]] * 4
    a_v, r_v, g_v, b_v = chans
    plans = []
    for vals, alphabet in ((g_v, 256 + 24), (r_v, 256), (b_v, 256), (a_v, 256)):
        const = len(set(vals)) == 1
        plans.append(const)
        if const:
            _write_single_symbol_code(bw, vals[0])
        else:
            _write_uniform8_code(bw, alphabet)
    _write_single_symbol_code(bw, 0)  # distance code, never used
    g_const, r_const, b_const, a_const = plans
    for p in pix:
        a, r, g, b = _channels(p)
        if not g_const:
            bw.write_code(*_U8[g])
        if not r_const:
            bw.write_code(*_U8[r])
        if not b_const:
            bw.write_code(*_U8[b])
        if not a_const:
            bw.write_code(*_U8[a])


def encode_webp(arr, subtract_green: bool = False, palette: bool = False) -> bytes:
    """numpy uint8 (H,W) | (H,W,3) | (H,W,4) -> lossless WebP bytes.

    ``palette=True`` color-indexes (with sub-byte bundling when the
    palette is small); ``subtract_green=True`` applies that transform.
    Both paths decode with any conformant VP8L decoder."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    if a.shape[2] == 3:
        alpha = np.full(a.shape[:2], 255, dtype=np.uint8)
    else:
        alpha = a[:, :, 3]
    h, w = a.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise WebpError("dimensions out of VP8L range")
    pix = [
        _pack(int(alpha[y, x]), int(a[y, x, 0]), int(a[y, x, 1]), int(a[y, x, 2]))
        for y in range(h)
        for x in range(w)
    ]

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int((alpha != 255).any()), 1)
    bw.write(0, 3)  # version

    if palette:
        pal = []
        index = {}
        for p in pix:
            if p not in index:
                index[p] = len(pal)
                pal.append(p)
        if len(pal) > 256:
            raise WebpError("palette encoding needs <=256 distinct colors")
        bw.write(1, 1)
        bw.write(_PALETTE, 2)
        bw.write(len(pal) - 1, 8)
        # delta-coded palette as an entropy image
        deltas = []
        prev = 0
        for p in pal:
            pa, pr, pg, pb = _channels(prev)
            ca, cr, cg, cb = _channels(p)
            deltas.append(
                _pack((ca - pa) & 0xFF, (cr - pr) & 0xFF, (cg - pg) & 0xFF, (cb - pb) & 0xFF)
            )
            prev = p
        _write_image_stream(bw, deltas, is_level0=False)
        if len(pal) <= 2:
            xbits = 3
        elif len(pal) <= 4:
            xbits = 2
        elif len(pal) <= 16:
            xbits = 1
        else:
            xbits = 0
        per = 1 << xbits
        ibits = 8 >> xbits
        packed_w = (w + per - 1) >> xbits
        packed = []
        for y in range(h):
            for xp in range(packed_w):
                g = 0
                for k in range(per):
                    x = xp * per + k
                    if x < w:
                        g |= index[pix[y * w + x]] << (k * ibits)
                packed.append(_pack(0xFF, 0, g, 0))
        bw.write(0, 1)  # end of transforms
        _write_image_stream(bw, packed, is_level0=True)
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(_SUB_GREEN, 2)
            pix = [
                _pack(pa, (pr - pg) & 0xFF, pg, (pb - pg) & 0xFF)
                for pa, pr, pg, pb in (_channels(p) for p in pix)
            ]
        bw.write(0, 1)  # end of transforms
        _write_image_stream(bw, pix, is_level0=True)

    payload = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
