"""Decode kernels for opaque binary payloads.

``fake_decode_meta`` is the deterministic stand-in used in tests and
oracle-checked queries: it derives (width, height, channels, mean_px)
from the payload's md5, so Spark and the SQL oracle can agree
bit-for-bit without any codec library.

``decode_image`` is the real-codec seam: it dispatches to PIL when
available, else to the pure-Python PNG/BMP/PPM decoders in
``formats/imaging.py`` — a REAL decode either way. Swapping kernels
changes ONE function passed to ``mapInPandas`` — the Spark plumbing
(schema, Arrow batching, partitioning) is identical.
"""

from __future__ import annotations

import hashlib


def fake_decode_meta(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic pseudo-decode: (width, height, channels, mean_px)
    from the payload digest. Mirrors the SQL-oracle formulation exactly
    (md5 hex substrings as big-endian ints)."""
    h = hashlib.md5(payload).hexdigest()
    width = 1 + int(h[0:4], 16) % 1024
    height = 1 + int(h[4:8], 16) % 1024
    channels = 1 + int(h[8], 16) % 4
    mean_px = int(h[9:13], 16) / 65535.0
    return width, height, channels, mean_px


def decode_image(payload: bytes):
    """Real image decode -> numpy uint8 array (H,W) or (H,W,C).

    Dispatches to Pillow when installed (anything PIL reads); otherwise
    falls back to the self-contained pure-Python codecs in
    ``formats/imaging.py`` (PNG / BMP / PPM / GIF / TIFF / baseline AND
    progressive JPEG / lossless WebP — real decoders, no C library;
    JPEG via ``formats/jpeg.py`` + ``formats/jpeg_progressive.py``,
    VP8L via ``formats/webp.py``). Raises NotImplementedError only for
    formats neither path can handle (e.g. lossy-VP8 WebP without
    Pillow)."""
    try:
        import io

        import numpy as np
        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError:
        pass
    from aristoteles_spark.formats.imaging import decode, sniff

    if sniff(payload) is None:
        raise NotImplementedError(
            "payload is not PNG/BMP/PPM/GIF/TIFF/JPEG/VP8L-WebP and Pillow "
            "is not installed; lossy (VP8) WebP needs Pillow"
        )
    try:
        return decode(payload)
    except Exception as e:
        from aristoteles_spark.formats.webp import WebpError

        if isinstance(e, WebpError) and "lossy" in str(e):
            raise NotImplementedError(
                "lossy (VP8) WebP needs Pillow; only VP8L decodes pure-Python"
            ) from e
        raise
