"""Unit tests for the pure-Python WAV codec (formats/audio)."""

from __future__ import annotations

import numpy as np
import pytest

from aristoteles_spark.formats.audio import (
    audio_features,
    decode_wav,
    encode_wav,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(99)


class TestWav:
    def test_mono_round_trip(self, rng):
        s = rng.integers(-32768, 32768, 777, dtype=np.int16)
        rate, back = decode_wav(encode_wav(s, 44100))
        assert rate == 44100
        assert back.ndim == 1
        assert np.array_equal(back, s)

    def test_stereo_round_trip_interleaving(self, rng):
        s = rng.integers(-32768, 32768, (10, 2), dtype=np.int16)
        rate, back = decode_wav(encode_wav(s, 8000))
        assert back.shape == (10, 2)
        assert np.array_equal(back, s)

    def test_odd_data_chunk_padding(self):
        # a chunk before 'data' with odd size exercises word alignment
        s = np.array([1, -1, 100], dtype=np.int16)
        payload = bytearray(encode_wav(s, 8000))
        # inject an odd-sized LIST chunk between fmt and data
        data_pos = bytes(payload).index(b"data")
        extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
        payload = payload[:data_pos] + extra + payload[data_pos:]
        import struct

        struct.pack_into("<I", payload, 4, len(payload) - 8)
        rate, back = decode_wav(bytes(payload))
        assert np.array_equal(back, s)

    def test_rejects_non_wav_and_bad_size(self):
        with pytest.raises(ValueError):
            decode_wav(b"RIFFxxxxNOPE")
        good = encode_wav(np.array([0, 1], dtype=np.int16), 8000)
        with pytest.raises(ValueError, match="size"):
            decode_wav(good + b"junk")

    def test_features_exact(self):
        s = np.array([0, 32767, -32768, 100], dtype=np.int16)
        rate, n, dur, rms, peak = audio_features(encode_wav(s, 16000))
        assert (rate, n, peak) == (16000, 4, 32768)
        assert dur == 4 / 16000.0
        want = np.sqrt((0 + 32767.0**2 + 32768.0**2 + 100.0**2) / 4)
        assert rms == want

    def test_features_empty(self):
        rate, n, dur, rms, peak = audio_features(
            encode_wav(np.array([], dtype=np.int16), 8000)
        )
        assert (n, dur, rms, peak) == (0, 0.0, 0.0, 0)
