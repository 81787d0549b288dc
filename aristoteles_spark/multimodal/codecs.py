"""Decode kernels for opaque binary payloads.

``fake_decode_meta`` is the deterministic stand-in used in tests and
oracle-checked queries: it derives (width, height, channels, mean_px)
from the payload's md5, so Spark and the SQL oracle can agree
bit-for-bit without any codec library.

``decode_image`` is the real-codec seam: it dispatches to PIL when
available and raises ``NotImplementedError`` otherwise. Swapping the
fake for the real kernel changes ONE function passed to
``mapInPandas`` — the Spark plumbing (schema, Arrow batching,
partitioning) is identical either way.
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
    """Real image decode (PIL). Stub in this container: PIL is absent,
    so this raises — the pipeline uses :func:`fake_decode_meta`."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decoding requires Pillow, which is not installed; "
            "use fake_decode_meta for the deterministic test kernel"
        ) from e
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))
