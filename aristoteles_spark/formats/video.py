"""Pure-Python Y4M (YUV4MPEG2) video container codec.

YUV4MPEG2 is the uncompressed video interchange format used by the
mjpegtools/ffmpeg ecosystem (public spec): an ASCII stream header
``YUV4MPEG2 W<w> H<h> F<num>:<den> ...`` followed by frames, each a
``FRAME`` marker line plus raw planar pixel data. Supported here:
``Cmono`` (one W*H luma plane per frame) and ``C420jpeg`` (luma plus
two quarter-size chroma planes).

This is the video analogue of formats/imaging.py: a REAL container
parse — frame boundaries, plane sizes, header fields — that the
frame-sampling stage of a multimodal pipeline needs, with no media
library. Decode kernels run inside Arrow-batched ``mapInPandas``
(multimodal/features.py); the container bytes never shuffle.
"""

from __future__ import annotations

import numpy as np

MAGIC = b"YUV4MPEG2"


def encode_y4m(
    frames: np.ndarray,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "mono",
) -> bytes:
    """``frames``: uint8 (N, H, W) luma; for ``420jpeg`` also pass
    (N, H, W) — neutral (128) chroma planes are synthesized."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim != 3:
        raise ValueError("frames must be (N, H, W) uint8")
    n, h, w = f.shape
    cs = {"mono": b"Cmono", "420jpeg": b"C420jpeg"}[colorspace]
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n" % (w, h, fps[0], fps[1], cs)
    out = bytearray(head)
    chroma = (
        np.full(((h + 1) // 2) * ((w + 1) // 2), 128, dtype=np.uint8).tobytes()
        if colorspace == "420jpeg"
        else b""
    )
    for i in range(n):
        out += b"FRAME\n"
        out += f[i].tobytes()
        out += chroma + chroma
    return bytes(out)


def decode_y4m(payload: bytes) -> tuple[int, int, tuple[int, int], np.ndarray]:
    """Returns (width, height, fps, luma frames uint8 (N, H, W)).
    Chroma planes (C420) are parsed past but not returned."""
    nl = payload.index(b"\n")
    header = payload[:nl].split(b" ")
    if header[0] != MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    cs = b"420jpeg"  # the format's default when C is absent
    for tok in header[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps = (int(num), int(den))
        elif tok[:1] == b"C":
            cs = tok[1:]
    if w is None or h is None:
        raise ValueError("missing W/H in Y4M header")
    if cs == b"mono":
        frame_bytes = w * h
    elif cs in (b"420jpeg", b"420mpeg2", b"420paldv", b"420"):
        frame_bytes = w * h + 2 * (((h + 1) // 2) * ((w + 1) // 2))
    else:
        raise ValueError(f"unsupported colorspace {cs!r}")

    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        pos = fnl + 1
        data = payload[pos:pos + frame_bytes]
        if len(data) != frame_bytes:
            raise ValueError("truncated frame")
        frames.append(
            np.frombuffer(data, dtype=np.uint8, count=w * h).reshape(h, w)
        )
        pos += frame_bytes
    return w, h, fps, np.stack(frames) if frames else np.empty((0, h, w), np.uint8)


def sample_frames(
    payload: bytes, stride: int
) -> tuple[int, int, int, int, np.ndarray]:
    """Fixed-stride frame sampling off a REAL container parse:
    (width, height, n_frames, n_sampled, sampled luma frames)."""
    w, h, _fps, frames = decode_y4m(payload)
    sampled = frames[::stride]
    return w, h, frames.shape[0], sampled.shape[0], sampled
