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


SF_SMOKE = "/root/testdata/sf0.001"


class TestIntervalCoalesce:
    def test_islands_disjoint_ordered_and_complete(self, spark):
        from aristoteles_spark.queries.temporal import q_interval_coalesce

        rows = q_interval_coalesce(spark, SF_SMOKE).collect()
        n_events = (
            spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
        )
        assert sum(r.n_events for r in rows) == n_events
        by_user = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        for user_rows in by_user.values():
            # island ids are 1..k in order; intervals strictly separated
            assert [r.island for r in user_rows] == list(
                range(1, len(user_rows) + 1)
            )
            for a, b in zip(user_rows, user_rows[1:]):
                assert a.ivl_end_us < b.ivl_start_us
            for r in user_rows:
                assert r.ivl_start_us <= r.ivl_end_us

    def test_touching_intervals_merge(self, spark):
        # [0, 10], [10, 20] touch -> one island; [30, 40] separate
        from pyspark.sql.window import Window

        df = spark.createDataFrame(
            [(1, 0, 10), (2, 10, 20), (3, 30, 40)],
            "event_id long, start_us long, end_us long",
        ).withColumn("user_id", F.lit(7))
        w_prev = (
            Window.partitionBy("user_id")
            .orderBy("start_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_run = (
            Window.partitionBy("user_id")
            .orderBy("start_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        flagged = df.withColumn(
            "new_island",
            F.when(
                F.col("start_us")
                > F.coalesce(F.max("end_us").over(w_prev), F.lit(-1)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        ).withColumn("island", F.sum("new_island").over(w_run))
        out = (
            flagged.groupBy("island")
            .agg(F.min("start_us").alias("s"), F.max("end_us").alias("e"))
            .orderBy("island")
            .collect()
        )
        assert [(r.s, r.e) for r in out] == [(0, 20), (30, 40)]


class TestScd2History:
    def test_versions_tile_and_change(self, spark):
        from aristoteles_spark.queries.temporal import (
            FAR_FUTURE_US,
            q_scd2_history,
        )

        rows = q_scd2_history(spark, SF_SMOKE).collect()
        by_user = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        for user_rows in by_user.values():
            assert [r.version for r in user_rows] == list(
                range(1, len(user_rows) + 1)
            )
            # intervals tile: each valid_to equals the next valid_from;
            # last is open (sentinel); consecutive tiers always differ
            for a, b in zip(user_rows, user_rows[1:]):
                assert a.valid_to_us == b.valid_from_us
                assert a.tier != b.tier
            assert user_rows[-1].valid_to_us == FAR_FUTURE_US


class TestApplyChangelog:
    def test_matches_bruteforce_recompute(self, spark):
        from aristoteles_spark.queries.versioning import q_apply_changelog

        got = {
            r.user_id: (r.n_changes, r.last_cents)
            for r in q_apply_changelog(spark, SF_SMOKE).collect()
        }
        ev = (
            spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .select("user_id", "ts", "event_id", "value")
            .collect()
        )
        by_user = {}
        for r in ev:
            by_user.setdefault(r.user_id, []).append(r)
        expected = {}
        for uid, rows in by_user.items():
            rows.sort(key=lambda r: (r.ts, r.event_id))
            last = rows[-1]
            if last.event_id % 10 == 0:  # delete wins -> key absent
                continue
            cents = -1 if last.value is None else round(last.value * 100)
            expected[uid] = (len(rows), cents)
        assert got == expected
