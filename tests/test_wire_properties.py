"""Hypothesis property tests for the round-3 wire/container codecs
(Avro, WARC, protobuf wire): arbitrary values must round-trip exactly
through every codec path."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aristoteles_spark.formats.avro import read_avro, write_avro
from aristoteles_spark.formats.protowire import read_log, write_log
from aristoteles_spark.formats.warc import (
    conversion_record,
    read_warc,
    write_warc,
)

_SETTINGS = settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
# finite doubles only: NaN != NaN breaks equality (the engines' NaN
# handling is pinned separately by the oracle queries)
_F64 = st.floats(allow_nan=False, allow_infinity=False, width=64)
_TEXT = st.text(max_size=80)

AVRO_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": ["null", "double"]},
        {"name": "d", "type": "boolean"},
        {"name": "e", "type": "bytes"},
    ],
}


class TestAvroProperties:
    @_SETTINGS
    @given(
        st.lists(
            st.tuples(
                _I64,
                st.one_of(st.none(), _TEXT),
                st.one_of(st.none(), _F64),
                st.booleans(),
                st.binary(max_size=40),
            ),
            max_size=50,
        ),
        st.sampled_from(["null", "deflate"]),
        st.integers(1, 7),
    )
    def test_roundtrip(self, rows, codec, block):
        data = write_avro(AVRO_SCHEMA, rows, codec=codec, block_records=block)
        _schema, back = read_avro(data)
        assert back == rows


class TestWarcProperties:
    @_SETTINGS
    @given(
        st.lists(
            st.tuples(st.integers(0, 10**9), _TEXT),
            min_size=1,
            max_size=20,
        ),
        st.booleans(),
    )
    def test_roundtrip(self, docs, compress):
        recs = [
            conversion_record(f"corpus://s/{i}", "2026-01-01T00:00:00Z",
                              text, str(i))
            for i, (_seed, text) in enumerate(docs)
        ]
        back = read_warc(write_warc(recs, compress=compress))
        assert [p for _h, p in back] == [p for _h, p in recs]
        for (h0, _), (h1, _) in zip(recs, back):
            assert h1["WARC-Target-URI"] == h0["WARC-Target-URI"]


class TestProtoProperties:
    @_SETTINGS
    @given(
        st.lists(
            st.fixed_dictionaries(
                {
                    "event_id": _I64,
                    "ts_micros": _I64,
                    "user_id": st.one_of(st.none(), _I64),
                    "event_type": st.one_of(st.none(), _TEXT),
                    "value": st.one_of(st.none(), _F64),
                    "props": st.one_of(st.none(), _TEXT),
                }
            ),
            max_size=40,
        )
    )
    def test_roundtrip(self, recs):
        assert read_log(write_log(recs)) == recs
