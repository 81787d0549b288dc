"""Pure-Python WAV (RIFF PCM) codec + basic audio features.

Implements the public RIFF/WAVE format: PCM 16-bit little-endian,
mono or interleaved multi-channel. Enough for an audio-feature
extraction stage (decode -> rate/duration/RMS/peak) without any
audio library; the kernels run inside the same Arrow-batched
``mapInPandas`` seam as the image codecs (multimodal/features.py).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """PCM16 WAV. ``samples``: int16 array, shape (N,) mono or (N, C)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.reshape(-1).tobytes()  # interleaved
    byte_rate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Returns (sample_rate, int16 array shape (N,) mono / (N, C))."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 != len(payload):
        raise ValueError("RIFF size mismatch")
    pos = 12
    rate = channels = bits = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 WAV supported")
        elif tag == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    s = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        s = s.reshape(-1, channels)
    return rate, s


def audio_features(payload: bytes) -> tuple[int, int, float, float, int]:
    """(sample_rate, n_samples, duration_s, rms, peak) via a real decode.
    RMS/peak are over all channels; exact float64 arithmetic so a SQL
    oracle over the known source samples reproduces them bit-for-bit."""
    rate, s = decode_wav(payload)
    n = s.shape[0]
    flat = s.reshape(-1).astype(np.float64)
    rms = float(np.sqrt((flat * flat).sum() / flat.size)) if flat.size else 0.0
    peak = int(np.abs(s.reshape(-1).astype(np.int64)).max()) if flat.size else 0
    return rate, n, n / float(rate), rms, peak
