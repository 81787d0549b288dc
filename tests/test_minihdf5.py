"""Unit tests for the pure-Python HDF5 writer/reader (formats/minihdf5).

The lookup3 vectors are the published self-test values from Bob Jenkins'
lookup3.c (the checksum HDF5 itself uses); everything else is round-trip
plus structural assertions against the public file-format spec.
"""

from __future__ import annotations

import math
import struct

import pytest

from aristoteles_spark.formats.minihdf5 import (
    MiniHDF5Writer,
    lookup3,
    read_hdf5,
)


class TestLookup3:
    def test_published_vectors(self):
        q = b"Four score and seven years ago"
        assert lookup3(b"", 0) == 0xDEADBEEF
        assert lookup3(q, 0) == 0x17770551
        assert lookup3(q, 1) == 0xCD628161

    def test_all_lengths_stable(self):
        # every tail-switch arm (lengths 0..13) executes without error and
        # is length-sensitive
        data = bytes(range(32))
        hashes = [lookup3(data[:n]) for n in range(14)]
        assert len(set(hashes)) == len(hashes)


class TestRoundTrip:
    def _sample(self):
        w = MiniHDF5Writer()
        w.root.attrs["name"] = "inst"
        w.root.attrs["lon"] = -119.25
        w.root.attrs["count"] = 42
        g = w.root.create_group("grp")
        g.attrs["desc"] = ""
        g.create_dataset(
            "vals", [1.0, float("nan"), -3.5],
            attrs={"axis": ["t"], "units": "m"},
        )
        g.create_dataset("empty", [])
        w.root.create_group("empty_grp")
        return w

    def test_round_trip(self, tmp_path):
        p = str(tmp_path / "t.h5")
        self._sample().write(p)
        b = read_hdf5(p)
        assert b["attrs"] == {"name": "inst", "lon": -119.25, "count": 42}
        g = b["groups"]["grp"]
        assert g["attrs"] == {"desc": ""}
        v = g["datasets"]["vals"]["values"]
        assert v[0] == 1.0 and math.isnan(v[1]) and v[2] == -3.5
        assert g["datasets"]["vals"]["attrs"] == {"axis": ["t"], "units": "m"}
        assert g["datasets"]["empty"]["values"] == []
        assert b["groups"]["empty_grp"] == {
            "attrs": {}, "groups": {}, "datasets": {}
        }

    def test_superblock_structure(self, tmp_path):
        """Byte-level spec assertions: signature, version 2, 8-byte
        offsets/lengths, EOF address == file size, valid checksum."""
        p = str(tmp_path / "t.h5")
        self._sample().write(p)
        buf = open(p, "rb").read()
        assert buf[:8] == b"\x89HDF\r\n\x1a\n"
        assert buf[8] == 2 and buf[9] == 8 and buf[10] == 8
        eof, root = struct.unpack_from("<QQ", buf, 28)
        assert eof == len(buf)
        assert buf[root:root + 4] == b"OHDR"
        assert struct.unpack_from("<I", buf, 44)[0] == lookup3(buf[:44])

    def test_checksum_detects_corruption(self, tmp_path):
        p = str(tmp_path / "t.h5")
        self._sample().write(p)
        buf = bytearray(open(p, "rb").read())
        root = struct.unpack_from("<Q", buf, 36)[0]
        buf[root + 10] ^= 0xFF  # flip a byte inside the root header chunk
        open(p, "wb").write(bytes(buf))
        with pytest.raises(ValueError, match="checksum"):
            read_hdf5(p)

    def test_truncated_file_rejected(self, tmp_path):
        p = str(tmp_path / "t.h5")
        self._sample().write(p)
        buf = open(p, "rb").read()
        open(p, "wb").write(buf[:-4])
        with pytest.raises(ValueError, match="EOF"):
            read_hdf5(p)

    def test_int_dataset(self, tmp_path):
        w = MiniHDF5Writer()
        w.root.create_dataset("ints", [1, -2, 2**40], dtype="i8")
        p = str(tmp_path / "i.h5")
        w.write(p)
        assert read_hdf5(p)["datasets"]["ints"]["values"] == [1, -2, 2**40]

    def test_many_children_and_long_values(self, tmp_path):
        w = MiniHDF5Writer()
        for i in range(40):
            w.root.create_dataset(f"d{i:02d}", [float(i)] * 300)
        p = str(tmp_path / "m.h5")
        w.write(p)
        b = read_hdf5(p)
        assert len(b["datasets"]) == 40
        assert b["datasets"]["d39"]["values"] == [39.0] * 300
