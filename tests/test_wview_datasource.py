"""Tests for the wview Python Data Source (batch + streaming).

Covers: schema, day-sliced partition planning, dateTime/station filter
pushdown (both partition pruning and row narrowing), Arrow batch reads,
and the streaming reader's offset protocol (incremental read + replay).
"""

from __future__ import annotations

import datetime as dt

import pytest

from aristoteles_spark.schema import MEASURES
from aristoteles_spark.sources.sqlite_source import write_archive_sqlite
from aristoteles_spark.sources.wview_datasource import (
    WviewDataSource,
    WviewReader,
    WviewStreamReader,
)


def _day_rows(day: dt.date, n: int = 288, us: int = 1):
    t0 = int(
        dt.datetime(day.year, day.month, day.day, tzinfo=dt.timezone.utc).timestamp()
    )
    return [
        (t0 + i * 300, us, *[50.0 + i * 0.01 + j for j in range(len(MEASURES))])
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def archives(tmp_path_factory):
    w = tmp_path_factory.mktemp("wview")
    a, b = str(w / "a.sqlite"), str(w / "b.sqlite")
    write_archive_sqlite(a, _day_rows(dt.date(2020, 6, 1)) + _day_rows(dt.date(2020, 6, 2)))
    write_archive_sqlite(b, _day_rows(dt.date(2020, 6, 2), n=100, us=0))
    return {"alpha": a, "beta": b}


def _opts(archives) -> dict:
    return {"stations": ";".join(f"{k}={v}" for k, v in archives.items())}


DAY2 = int(dt.datetime(2020, 6, 2, tzinfo=dt.timezone.utc).timestamp())


class TestPartitionPlanning:
    def test_one_slice_per_station_day(self, archives):
        parts = WviewReader(_opts(archives)).partitions()
        assert len(parts) == 3  # alpha x 2 days, beta x 1
        assert {(p.station, p.lo // 86400) for p in parts} == {
            ("alpha", DAY2 // 86400 - 1),
            ("alpha", DAY2 // 86400),
            ("beta", DAY2 // 86400),
        }

    def test_datetime_pushdown_prunes_slices(self, archives):
        from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

        r = WviewReader(_opts(archives))
        rest = list(
            r.pushFilters(
                [
                    GreaterThanOrEqual(("dateTime",), DAY2),
                    LessThan(("dateTime",), DAY2 + 86400),
                ]
            )
        )
        assert rest == []  # both fully consumed
        parts = r.partitions()
        assert {p.station for p in parts} == {"alpha", "beta"}
        assert len(parts) == 2
        assert all(p.lo >= DAY2 and p.hi < DAY2 + 86400 for p in parts)

    def test_station_pushdown_prunes_stations(self, archives):
        from pyspark.sql.datasource import EqualTo, GreaterThan

        r = WviewReader(_opts(archives))
        rest = list(
            r.pushFilters(
                [EqualTo(("station",), "beta"), GreaterThan(("outTemp",), 0.0)]
            )
        )
        # the measure predicate is NOT handled and must be returned
        assert len(rest) == 1 and rest[0].attribute == ("outTemp",)
        parts = r.partitions()
        assert [p.station for p in parts] == ["beta"]

    def test_custom_slice_granularity(self, archives):
        r = WviewReader({**_opts(archives), "sliceseconds": "43200"})
        # alpha: 2 days -> 4 half-day slices; beta: 100 rows cover <12h -> 1
        assert len(r.partitions()) == 5

    def test_planning_scales_to_many_station_days(self, tmp_path):
        """Planning over 40 stations x 30 days must yield one slice per
        station-day (1200 partitions) from two index probes per station
        — no data read at plan time. A pushed one-day filter collapses
        the plan to one slice per station."""
        import sqlite3

        from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

        t0 = int(
            dt.datetime(2021, 1, 1, tzinfo=dt.timezone.utc).timestamp()
        )
        stations = {}
        for i in range(40):
            p = str(tmp_path / f"s{i:02d}.sqlite")
            # two rows bounding 30 days: planning only needs MIN/MAX
            write_archive_sqlite(
                p,
                [
                    (t0, 1, *[0.0] * len(MEASURES)),
                    (t0 + 30 * 86400 - 1, 1, *[0.0] * len(MEASURES)),
                ],
            )
            stations[f"s{i:02d}"] = p
        opts = {"stations": ";".join(f"{k}={v}" for k, v in stations.items())}
        parts = WviewReader(opts).partitions()
        assert len(parts) == 40 * 30
        r = WviewReader(opts)
        day5 = t0 + 5 * 86400
        list(
            r.pushFilters(
                [
                    GreaterThanOrEqual(("dateTime",), day5),
                    LessThan(("dateTime",), day5 + 86400),
                ]
            )
        )
        assert len(r.partitions()) == 40

    def test_read_returns_arrow_batch(self, archives):
        import pyarrow as pa

        r = WviewReader(_opts(archives))
        part = [p for p in r.partitions() if p.station == "beta"][0]
        batches = list(r.read(part))
        assert len(batches) == 1 and isinstance(batches[0], pa.RecordBatch)
        assert batches[0].num_rows == 100
        assert batches[0].schema.names[:3] == ["station", "dateTime", "usUnits"]


class TestBatchEndToEnd:
    def test_read_counts_and_filters(self, spark, archives):
        spark.dataSource.register(WviewDataSource)
        df = (
            spark.read.format("wview")
            .option("stations", _opts(archives)["stations"])
            .load()
        )
        assert df.count() == 676
        assert df.rdd.getNumPartitions() == 3
        day2 = df.where(
            (df.dateTime >= DAY2) & (df.dateTime < DAY2 + 86400)
        )
        assert day2.count() == 388
        assert df.where(df.station == "beta").count() == 100
        # row values survive the Arrow path
        row = (
            df.where((df.station == "alpha") & (df.dateTime == DAY2))
            .select("usUnits", "outTemp")
            .head()
        )
        assert row["usUnits"] == 1 and row["outTemp"] == 54.0

    def test_single_path_option(self, spark, archives):
        spark.dataSource.register(WviewDataSource)
        df = (
            spark.read.format("wview")
            .option("path", archives["beta"])
            .option("station", "b1")
            .load()
        )
        assert df.groupBy("station").count().collect()[0]["station"] == "b1"


class TestWriter:
    def test_write_read_round_trip(self, spark, tmp_path):
        from aristoteles_spark.sources.wview_datasource import WVIEW_SCHEMA

        spark.dataSource.register(WviewDataSource)
        w = str(tmp_path / "arch")
        rows = [
            ("a", 1000 + i, 1, *[float(i + j) for j in range(len(MEASURES))])
            for i in range(50)
        ] + [
            ("b", 2000 + i, 0, *[0.5 * i + j for j in range(len(MEASURES))])
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, WVIEW_SCHEMA).repartition(4)
        df.write.format("wview").option("dir", w).mode("append").save()
        back = (
            spark.read.format("wview")
            .option("stations", f"a={w}/a.sqlite;b={w}/b.sqlite")
            .load()
        )
        assert back.count() == 80
        assert sorted(
            tuple(r) for r in back.collect()
        ) == sorted(rows)
        # no staging leftovers after commit
        leftovers = [p for p in (tmp_path / "arch").iterdir() if p.name.startswith(".stage")]
        assert leftovers == []

    def test_append_is_upsert_on_datetime(self, spark, tmp_path):
        from aristoteles_spark.sources.wview_datasource import WVIEW_SCHEMA

        spark.dataSource.register(WviewDataSource)
        w = str(tmp_path / "arch2")
        mk = lambda v: [("a", 100, 1, *[v] * len(MEASURES))]
        spark.createDataFrame(mk(1.0), WVIEW_SCHEMA).write.format(
            "wview"
        ).option("dir", w).mode("append").save()
        spark.createDataFrame(mk(9.0), WVIEW_SCHEMA).write.format(
            "wview"
        ).option("dir", w).mode("append").save()
        back = spark.read.format("wview").option("path", f"{w}/a.sqlite").load()
        assert back.count() == 1
        assert back.head()["barometer"] == 9.0

    def test_overwrite_replaces_written_stations_only(self, spark, tmp_path):
        from aristoteles_spark.sources.wview_datasource import WVIEW_SCHEMA

        spark.dataSource.register(WviewDataSource)
        w = str(tmp_path / "arch3")
        rows = [
            (st, t, 1, *[1.0] * len(MEASURES))
            for st in ("a", "b")
            for t in (100, 200)
        ]
        spark.createDataFrame(rows, WVIEW_SCHEMA).write.format(
            "wview"
        ).option("dir", w).mode("append").save()
        only_a = [("a", 300, 1, *[2.0] * len(MEASURES))]
        spark.createDataFrame(only_a, WVIEW_SCHEMA).write.format(
            "wview"
        ).option("dir", w).mode("overwrite").save()
        a = spark.read.format("wview").option("path", f"{w}/a.sqlite").load()
        b = spark.read.format("wview").option("path", f"{w}/b.sqlite").load()
        assert a.count() == 1 and a.head()["dateTime"] == 300
        assert b.count() == 2  # untouched station survives

    def test_failed_job_leaves_archives_untouched(self, spark, tmp_path):
        """Fault injection: a task that fails mid-write must abort the
        job without corrupting existing archives; staging files are
        removed by the abort path (or remain only as dot-prefixed files
        the reader never touches)."""
        from aristoteles_spark.sources.wview_datasource import WVIEW_SCHEMA

        spark.dataSource.register(WviewDataSource)
        w = str(tmp_path / "arch4")
        good = [("a", 100, 1, *[1.0] * len(MEASURES))]
        spark.createDataFrame(good, WVIEW_SCHEMA).write.format(
            "wview"
        ).option("dir", w).mode("append").save()

        from pyspark.sql import functions as F

        poisoned = spark.createDataFrame(
            [("a", 200, 1, *[2.0] * len(MEASURES))], WVIEW_SCHEMA
        ).withColumn(
            "dateTime",
            F.when(F.col("dateTime") > 0, F.col("dateTime")).otherwise(
                F.col("dateTime")
            )
            + F.raise_error(F.lit("injected task failure")).cast("long") * 0,
        )
        with pytest.raises(Exception, match="injected task failure"):
            poisoned.write.format("wview").option("dir", w).mode(
                "append"
            ).save()
        back = spark.read.format("wview").option("path", f"{w}/a.sqlite").load()
        rows = back.collect()
        assert len(rows) == 1 and rows[0]["dateTime"] == 100

    def test_pool_commit_failure_is_all_or_nothing_per_station(self, tmp_path):
        """Round-6 contract: one station's merge raising mid-POOL must
        not leave ANY archive partially updated — the failing station's
        archive keeps exactly its pre-commit rows (its multi-batch merge
        is one transaction, so batch 1's rows roll back when batch 2
        fails), healthy stations merge fully, and staging is cleaned."""
        import glob
        import sqlite3

        from aristoteles_spark.sources.wview_datasource import (
            MEASURES,
            WviewWriter,
            _StagedDb,
        )

        w = str(tmp_path / "arch5")
        writer = WviewWriter({"dir": w}, overwrite=False)

        def row(st, t, v):
            return (st, t, 1, *[float(v)] * len(MEASURES))

        # seed station c with a committed row the failed job must keep
        writer.commit([writer.write(iter([row("c", 50, 0)]))])
        # batch 1: good rows for stations a and c
        m1 = writer.write(iter([row("a", 100, 1), row("c", 100, 1)]))
        # batch 2: a hand-built staged db whose c-row violates the
        # archive's usUnits NOT NULL (dateTime NULL would silently
        # auto-assign — INTEGER PRIMARY KEY is a rowid alias) — the
        # pre-scan sees the station, the merge fails INSIDE c's
        # transaction after batch 1's c-row was already inserted
        import os
        import uuid

        bad = os.path.join(w, f".stage-{uuid.uuid4().hex}.sqlite")
        with sqlite3.connect(bad) as conn:
            conn.execute(
                "CREATE TABLE staged (station TEXT, dateTime INTEGER, "
                "usUnits INTEGER, "
                + ", ".join(f"{m} REAL" for m in MEASURES)
                + ")"
            )
            conn.execute(
                "INSERT INTO staged VALUES (?, 200, NULL, "
                + ", ".join(["2.0"] * len(MEASURES))
                + ")",
                ("c",),
            )
            conn.commit()
        m2 = _StagedDb(path=bad, rows=1)

        with pytest.raises(sqlite3.IntegrityError):
            writer.commit([m1, m2])

        # staging fully cleaned, no scratch leftovers
        assert glob.glob(f"{w}/.stage-*") == []
        assert glob.glob(f"{w}/.merge-*") == []
        # station c: exactly the pre-commit row — batch 1's c-row must
        # have rolled back with batch 2's failure
        with sqlite3.connect(f"{w}/c.sqlite") as c:
            assert [
                r[0] for r in c.execute("SELECT dateTime FROM archive")
            ] == [50]
        # station a (healthy worker): fully merged
        with sqlite3.connect(f"{w}/a.sqlite") as a:
            assert [
                r[0] for r in a.execute("SELECT dateTime FROM archive")
            ] == [100]
        # retry with regenerated good staging converges
        m3 = writer.write(iter([row("c", 100, 1), row("c", 200, 2)]))
        writer.commit([m3])
        with sqlite3.connect(f"{w}/c.sqlite") as c:
            assert [
                r[0]
                for r in c.execute("SELECT dateTime FROM archive ORDER BY 1")
            ] == [50, 100, 200]

    def test_commit_merges_more_batches_than_sqlite_attach_limit(self, tmp_path):
        """>10 staged batches for one station exceed SQLITE_MAX_ATTACHED;
        the scratch-union pre-merge path must produce the same archive as
        serial merging, keep message-order wins on duplicate keys, and
        leave no scratch files."""
        import glob
        import sqlite3

        from aristoteles_spark.sources.wview_datasource import (
            MEASURES,
            WviewWriter,
        )

        w = str(tmp_path / "arch6")
        writer = WviewWriter({"dir": w}, overwrite=False)
        msgs = [
            writer.write(
                iter([("a", 100 + i, 1, *[float(i)] * len(MEASURES))])
            )
            for i in range(12)
        ]
        # batch 12 rewrites dateTime 100 — later message must win
        msgs.append(
            writer.write(iter([("a", 100, 1, *[99.0] * len(MEASURES))]))
        )
        writer.commit(msgs)
        assert glob.glob(f"{w}/.stage-*") == []
        assert glob.glob(f"{w}/.merge-*") == []
        with sqlite3.connect(f"{w}/a.sqlite") as a:
            rows = dict(
                a.execute(f"SELECT dateTime, {MEASURES[0]} FROM archive")
            )
        assert len(rows) == 12
        assert rows[100] == 99.0 and rows[111] == 11.0

    def test_overwrite_with_scratch_union_replaces_atomically(self, tmp_path):
        """overwrite + >10 staged batches: the DROP rides the same
        transaction as the scratch-union insert, so the final archive
        holds exactly the new rows (and only them)."""
        import glob
        import sqlite3

        from aristoteles_spark.sources.wview_datasource import (
            MEASURES,
            WviewWriter,
        )

        w = str(tmp_path / "arch7")
        app = WviewWriter({"dir": w}, overwrite=False)
        app.commit([app.write(iter([("a", 1, 1, *[0.0] * len(MEASURES))]))])
        over = WviewWriter({"dir": w}, overwrite=True)
        msgs = [
            over.write(iter([("a", 100 + i, 1, *[float(i)] * len(MEASURES))]))
            for i in range(11)
        ]
        over.commit(msgs)
        assert glob.glob(f"{w}/.merge-*") == []
        with sqlite3.connect(f"{w}/a.sqlite") as a:
            got = [r[0] for r in a.execute("SELECT dateTime FROM archive ORDER BY 1")]
        assert got == list(range(100, 111))  # old row 1 gone, 11 new rows

    def test_overwrite_failure_keeps_existing_archive(self, tmp_path):
        """Fault injection for overwrite=True (ADVICE r6): the DROP
        TABLE must ride the SAME transaction as the inserts, so a
        mid-merge failure leaves the pre-existing archive byte-intact
        instead of destroyed. (Under Python sqlite3's default isolation
        the DROP autocommitted before the first INSERT; the writer now
        uses an explicit BEGIN IMMEDIATE on an autocommit connection.)"""
        import glob
        import os
        import sqlite3
        import uuid

        from aristoteles_spark.sources.wview_datasource import (
            MEASURES,
            WviewWriter,
            _StagedDb,
        )

        w = str(tmp_path / "arch8")
        seed = WviewWriter({"dir": w}, overwrite=False)
        seed.commit(
            [seed.write(iter([("a", 50, 1, *[9.0] * len(MEASURES))]))]
        )

        over = WviewWriter({"dir": w}, overwrite=True)
        m1 = over.write(iter([("a", 100, 1, *[1.0] * len(MEASURES))]))
        # poisoned batch: usUnits NULL violates archive's NOT NULL —
        # the merge fails AFTER the DROP and after m1's insert
        bad = os.path.join(w, f".stage-{uuid.uuid4().hex}.sqlite")
        with sqlite3.connect(bad) as conn:
            conn.execute(
                "CREATE TABLE staged (station TEXT, dateTime INTEGER, "
                "usUnits INTEGER, "
                + ", ".join(f"{m} REAL" for m in MEASURES)
                + ")"
            )
            conn.execute(
                "INSERT INTO staged VALUES (?, 200, NULL, "
                + ", ".join(["2.0"] * len(MEASURES))
                + ")",
                ("a",),
            )
            conn.commit()
        m2 = _StagedDb(path=bad, rows=1)

        with pytest.raises(sqlite3.IntegrityError):
            over.commit([m1, m2])

        assert glob.glob(f"{w}/.stage-*") == []
        # the seeded archive survives untouched: DROP rolled back
        with sqlite3.connect(f"{w}/a.sqlite") as a:
            rows = list(
                a.execute(f"SELECT dateTime, {MEASURES[0]} FROM archive")
            )
        assert rows == [(50, 9.0)]
        # a retried overwrite with healthy staging then replaces fully
        retry = WviewWriter({"dir": w}, overwrite=True)
        retry.commit(
            [retry.write(iter([("a", 100, 1, *[1.0] * len(MEASURES))]))]
        )
        with sqlite3.connect(f"{w}/a.sqlite") as a:
            assert [
                r[0] for r in a.execute("SELECT dateTime FROM archive")
            ] == [100]

    def test_writer_rejects_wrong_schema(self, spark, tmp_path):
        spark.dataSource.register(WviewDataSource)
        df = spark.range(3)
        with pytest.raises(Exception, match="wview writer needs columns"):
            df.write.format("wview").option(
                "dir", str(tmp_path / "x")
            ).mode("append").save()


class TestStreaming:
    def test_offset_protocol(self, tmp_path):
        db = str(tmp_path / "s.sqlite")
        write_archive_sqlite(db, _day_rows(dt.date(2020, 6, 1), 10))
        r = WviewStreamReader({"path": db})
        it, off1 = r.read(r.initialOffset())
        assert sum(1 for _ in it) == 10
        # new data arrives; next read picks up only the delta
        write_archive_sqlite(db, _day_rows(dt.date(2020, 6, 2), 4))
        it2, off2 = r.read(off1)
        rows2 = list(it2)
        assert len(rows2) == 4
        assert rows2[0][0] == "st"  # station column prepended
        # deterministic replay of the committed range
        assert sum(1 for _ in r.readBetweenOffsets(off1, off2)) == 4
        # nothing new -> empty batch, offset unchanged
        it3, off3 = r.read(off2)
        assert sum(1 for _ in it3) == 0 and off3 == off2

    def test_restart_continues_from_checkpoint(self, spark, tmp_path):
        """Two AvailableNow runs over a growing archive with a shared
        durable checkpoint: the second run must ingest ONLY the delta
        (offset restored from the checkpoint), and the file sink must
        hold exactly one copy of every row."""
        db = str(tmp_path / "r.sqlite")
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        write_archive_sqlite(db, _day_rows(dt.date(2020, 6, 1), 40))
        spark.dataSource.register(WviewDataSource)

        def run_once():
            q = (
                spark.readStream.format("wview")
                .option("path", db)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        assert spark.read.parquet(out).count() == 40
        write_archive_sqlite(db, _day_rows(dt.date(2020, 6, 2), 15))
        run_once()
        df = spark.read.parquet(out)
        assert df.count() == 55  # 40 + delta of 15, no re-ingest
        assert df.select("dateTime").distinct().count() == 55

    def test_available_now_end_to_end(self, spark, tmp_path):
        db = str(tmp_path / "e.sqlite")
        write_archive_sqlite(db, _day_rows(dt.date(2020, 6, 1), 30))
        spark.dataSource.register(WviewDataSource)
        q = (
            spark.readStream.format("wview")
            .option("path", db)
            .load()
            .writeStream.format("memory")
            .queryName("wview_stream_t")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n = spark.sql("SELECT count(*) AS n FROM wview_stream_t").head()["n"]
        assert n == 30
