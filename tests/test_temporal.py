"""Unit tests for as-of and interval joins: boundary inclusivity, ties,
no-match behavior — the edge semantics the sf0.01 oracle data may not hit."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aristoteles_spark.operators.temporal import asof_join, interval_join_binned


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows, schema="event_id long, user_id long, ts timestamp, value double"):
    return spark.createDataFrame(rows, schema)


class TestAsofJoin:
    def test_matches_latest_at_or_before(self, spark):
        left = _events(spark, [(1, 10, _ts("2024-01-01 10:00:00"), None)])
        right = _events(
            spark,
            [
                (100, 10, _ts("2024-01-01 09:00:00"), 1.0),
                (101, 10, _ts("2024-01-01 09:30:00"), 2.0),
                (102, 10, _ts("2024-01-01 10:30:00"), 3.0),  # future: excluded
            ],
        )
        out = asof_join(left, right, on="user_id", right_cols={"value": "rv"}).collect()
        assert out[0].rv == 2.0

    def test_equal_timestamp_is_inclusive(self, spark):
        left = _events(spark, [(1, 10, _ts("2024-01-01 10:00:00"), None)])
        right = _events(spark, [(100, 10, _ts("2024-01-01 10:00:00"), 7.0)])
        out = asof_join(left, right, on="user_id", right_cols={"value": "rv"}).collect()
        assert out[0].rv == 7.0

    def test_no_match_yields_null(self, spark):
        left = _events(spark, [(1, 10, _ts("2024-01-01 08:00:00"), None)])
        right = _events(spark, [(100, 10, _ts("2024-01-01 09:00:00"), 1.0)])
        out = asof_join(left, right, on="user_id", right_cols={"value": "rv"}).collect()
        assert out[0].rv is None

    def test_key_isolation(self, spark):
        left = _events(spark, [(1, 10, _ts("2024-01-01 10:00:00"), None)])
        right = _events(spark, [(100, 99, _ts("2024-01-01 09:00:00"), 1.0)])
        out = asof_join(left, right, on="user_id", right_cols={"value": "rv"}).collect()
        assert out[0].rv is None

    def test_preserves_left_rowcount(self, spark):
        left = _events(
            spark,
            [(i, 10 + (i % 3), _ts("2024-01-01 10:00:00"), None) for i in range(30)],
        )
        right = _events(spark, [(100, 10, _ts("2024-01-01 09:00:00"), 1.0)])
        assert asof_join(left, right, on="user_id", right_cols={"value": "rv"}).count() == 30


class TestIntervalJoin:
    def test_radius_boundary_inclusive(self, spark):
        probe = _events(spark, [(1, 0, _ts("2024-01-01 10:00:00"), None)])
        build = _events(
            spark,
            [
                (100, 0, _ts("2024-01-01 10:01:00"), None),  # exactly +60s: in
                (101, 0, _ts("2024-01-01 10:01:00.000001"), None),  # out
                (102, 0, _ts("2024-01-01 09:59:00"), None),  # exactly -60s: in
            ],
        )
        out = interval_join_binned(probe, build, "ts", "ts", radius_sec=60).collect()
        assert sorted(r._b_event_id for r in out) == [100, 102]

    def test_pairs_counted_once_across_bins(self, spark):
        # build row lands in a single bin; probe explodes over 3 bins —
        # the pair must still appear exactly once
        probe = _events(spark, [(1, 0, _ts("2024-01-01 10:00:30"), None)])
        build = _events(spark, [(100, 0, _ts("2024-01-01 10:00:00"), None)])
        out = interval_join_binned(probe, build, "ts", "ts", radius_sec=60).collect()
        assert len(out) == 1
