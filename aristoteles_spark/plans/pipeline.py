"""End-to-end incremental weather pipeline (the reference's entry()).

Orchestration mirrors reference aristoteles/aristoteles.py:148-485 but the
per-day transform collapses into one declarative Spark plan:

    read_stations (range pushed to SQLite)
      -> conversion_exprs (Catalyst when/otherwise, codegen'd)
      -> write_day (partitioned parquet, sorted within partition)

Deliberately batch-incremental, NOT Structured Streaming: emission is
completeness-*triggered* (hold a day until every station has 288 samples),
which event-time watermarks cannot express (SURVEY.md §2.9). The state file
advances after each day's commit, so re-runs are idempotent per day.

Scale note: the reference loops day x station serially; here all pending
days per batch could be written in ONE job partitioned by (acq, date) — the
day loop below is kept to preserve the reference's crash-safe per-day
watermark advance, but batch_write_days() offers the single-job path.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from aristoteles_spark.functions.units import convert_dataframe
from aristoteles_spark.obs.prom import PromBuffer
from aristoteles_spark.plans import days as D
from aristoteles_spark.plans import state as S
from aristoteles_spark.schema import SAMPLES_PER_DAY
from aristoteles_spark.sinks.daily_parquet import write_day
from aristoteles_spark.sources.sqlite_source import (
    min_datetime,
    ranged_count,
    read_stations,
)


@dataclass
class PipelineConfig:
    """Engine config (the reference's INI, aristoteles.py:191-227)."""

    state_path: str
    instrument: str
    archive: str
    stations: dict[str, dict]  # name -> {db_path, longitude?, latitude?, description?}
    netfc_path: str | None = None
    strict_units: bool = True
    expected_samples: int = SAMPLES_PER_DAY
    output_format: str = "parquet"  # parquet | orc


@dataclass
class RunResult:
    status: int
    days_written: int = 0
    rows_written: int = 0
    skipped_days: list[dt.date] = field(default_factory=list)
    incomplete_stations: list[str] = field(default_factory=list)


def run(
    spark: SparkSession,
    conf: PipelineConfig,
    stop: dt.date | None = None,
    force: bool = False,
    today: dt.date | None = None,
    batch: bool = False,
) -> RunResult:
    """One incremental run: catch up every unwritten complete day.

    ``batch=True`` takes the scale path: the same state read, target
    selection, and completeness gate, but every pending day lands in ONE
    partitioned write (batch_write_days) instead of the reference's
    crash-safe day-at-a-time loop — the trade a 100 TB catch-up makes
    (state advances once, after the whole span commits)."""
    prom = PromBuffer()
    result = RunResult(status=0)
    try:
        db_paths = {n: sc["db_path"] for n, sc in conf.stations.items()}

        # earliest data across stations (reference SQL #1 + driver fold,
        # aristoteles.py:240-254)
        mins = [m for m in (min_datetime(p) for p in db_paths.values()) if m is not None]
        if not mins:
            result.status = 1
            return result
        start_day = D.epoch_to_day(min(mins))

        first_day = S.read_state(conf.state_path) or start_day
        today = today or dt.datetime.now(dt.timezone.utc).date()
        target = stop or (today - dt.timedelta(days=1))  # "yesterday"
        prom.add("first_day", int(S.format_day(first_day)))
        prom.add("yesterday", int(S.format_day(target)))

        if target < first_day:  # nothing to do (reference aristoteles.py:287-289)
            return result

        # completeness gate on the TARGET day across all stations
        # (reference aristoteles.py:296-327)
        lo, hi = D.day_bounds(target)
        counts = {n: ranged_count(p, lo, hi) for n, p in db_paths.items()}
        for n, c in counts.items():
            prom.add("samples_yesterday", c, {"station": n})
        incomplete = D.gate_complete(counts, conf.expected_samples)
        if incomplete and not force:
            result.incomplete_stations = incomplete
            return result  # status 0: defer the whole backlog

        if batch:
            result.rows_written, result.days_written = batch_write_days(
                spark, conf, first_day, target
            )
            prom.add("days_written", result.days_written)
            prom.add("rows_written", result.rows_written)
            return result

        for day in D.span_range(first_day, target):
            lo, hi = D.day_bounds(day)
            df = read_stations(spark, db_paths, lo, hi)
            if df.isEmpty():  # skip-day path (reference aristoteles.py:348-370)
                result.skipped_days.append(day)
                S.write_state(conf.state_path, day)
                continue
            converted = convert_dataframe(df, strict=conf.strict_units)
            rows = write_day(
                converted,
                conf.archive,
                conf.instrument,
                day,
                conf.stations,
                fmt=conf.output_format,
            )
            result.rows_written += rows
            result.days_written += 1
            # crash-safe: advance watermark only after the day's commit
            S.write_state(conf.state_path, day)

        prom.add("days_written", result.days_written)
        prom.add("rows_written", result.rows_written)
        return result
    except Exception:
        result.status = 1
        raise
    finally:
        prom.flush(conf.netfc_path, result.status)


def batch_write_days(
    spark: SparkSession,
    conf: PipelineConfig,
    first: dt.date,
    last: dt.date,
) -> tuple[int, int]:
    """Scale path: ALL pending days in one partitioned write (single job).

    The read goes through the ``format("wview")`` Python Data Source
    (sources/wview_datasource.py): per-(station, day) input partitions,
    dateTime range pushed down into SQLite, Arrow batches decoded on
    EXECUTORS — the only ingest whose parallelism scales with the
    cluster. (The per-day incremental loop keeps the driver-side Arrow
    read: one day x one station is a few hundred rows, where a
    distributed scan is pure overhead.) Conversion, then a single write
    partitioned by (acq, date) — Spark writes every day in parallel
    instead of the reference's serial day loop. Trades per-day watermark
    granularity for throughput; state advances once at the end.

    Returns ``(rows_written, days_written)`` counted from THIS job's
    output frame via the Observation API (metrics ride the write job —
    no second ingest pass) — not from a readback of the whole
    [first, last] span, which would also count rows that pre-existed in
    the archive (a forced re-run, or a day whose source went empty so
    dynamic overwrite left the old partition) and overstate the run's
    metrics relative to the per-day loop.
    """
    import pyspark.sql.functions as F

    from aristoteles_spark.plans.days import acq_name
    from aristoteles_spark.sinks.daily_parquet import _write_sidecar

    from aristoteles_spark.sources.wview_datasource import register

    db_paths = {n: sc["db_path"] for n, sc in conf.stations.items()}
    lo, _ = D.day_bounds(first)
    _, hi = D.day_bounds(last)
    register(spark)
    df = (
        spark.read.format("wview")
        .option("stations", ";".join(f"{n}={p}" for n, p in db_paths.items()))
        .load()
        # range filter pushed down into each per-(station, day) SQLite
        # read (WviewReader.pushFilters); also prunes day partitions
        .filter((F.col("dateTime") >= lo) & (F.col("dateTime") <= hi))
    )
    converted = convert_dataframe(df, strict=conf.strict_units)
    ts = F.to_timestamp(F.col("dateTime"))
    out = (
        converted.withColumn("date", F.to_date(ts))
        .withColumn(
            "acq",
            F.concat(
                F.date_format(F.date_trunc("MONTH", ts), "yyyyMMdd"),
                F.lit(f"T000000Z_{conf.instrument}_weather"),
            ),
        )
        .repartition("acq", "date")
        .sortWithinPartitions("station", "dateTime")
    )
    # metrics ride the WRITE job via the Observation API — the source is
    # scanned exactly once (an after-the-fact agg on `out` would re-run
    # the whole ingest; a span readback would double-count pre-existing
    # partitions the dynamic overwrite didn't touch). An all-empty span
    # writes nothing (dynamic overwrite touches no partitions) and the
    # watermark still advances, matching the loop path's skip behavior.
    from pyspark.sql import Observation

    obs = Observation("batch_write_metrics")
    observed = out.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.size(F.collect_set("date")).alias("days"),
    )
    (
        observed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("acq", "date")
        .parquet(conf.archive)
    )
    rows, days = int(obs.get["rows"]), int(obs.get["days"])
    if rows > 0:
        for day in {D.month_floor(d) for d in D.span_range(first, last)}:
            _write_sidecar(conf.archive, acq_name(day, conf.instrument), conf.instrument, conf.stations)
    S.write_state(conf.state_path, last)
    return rows, days
