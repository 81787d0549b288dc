"""ETL-pipeline throughput benchmark: the reference-parity surface at speed.

Synthesizes a multi-month, multi-station wview archive (SQLite, the
reference's input format), then times two catch-up strategies:

- ``run``            — the reference-faithful per-day loop (crash-safe
                       per-day watermark advance, one write per day;
                       mirrors aristoteles/aristoteles.py:332-476)
- ``batch_write_days`` — the scale path: one ranged scan per station and
                       ONE job writing every pending day in parallel,
                       partitioned by (acq, date)

For context, the reference processes the same workload single-threaded in
Python with one SQLite query + one HDF5 write per day x station and a
scalar per-cell conversion loop (aristoteles.py:339-476). It publishes no
numbers (BASELINE.md), so the comparison target is structural: rows/s
here vs a serial interpreter loop over the same rows.

Writes PIPELINE_BENCH.md. Usage: python tools/pipeline_bench.py [days]
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DAYS = int(sys.argv[1]) if len(sys.argv) > 1 else 180
N_STATIONS = 3
SAMPLES = 288


def synth(workdir: str) -> "PipelineConfig":
    from aristoteles_spark.plans.pipeline import PipelineConfig
    from aristoteles_spark.schema import MEASURES
    from aristoteles_spark.sources.sqlite_source import write_archive_sqlite

    start = dt.date(2020, 1, 1)
    stations = {}
    for s in range(N_STATIONS):
        rows = []
        for d in range(N_DAYS):
            day = start + dt.timedelta(days=d)
            t0 = int(
                dt.datetime(
                    day.year, day.month, day.day, tzinfo=dt.timezone.utc
                ).timestamp()
            )
            for i in range(SAMPLES):
                rows.append(
                    (
                        t0 + i * 300,
                        s % 2,  # half the stations in US units
                        *[40.0 + (i % 50) * 0.5 + j for j in range(len(MEASURES))],
                    )
                )
        path = f"{workdir}/station_{s}.sqlite"
        write_archive_sqlite(path, rows)
        stations[f"st{s}"] = {"db_path": path}
    return PipelineConfig(
        state_path=f"{workdir}/state",
        instrument="wx",
        archive=f"{workdir}/archive",
        stations=stations,
    )


def main() -> None:
    from aristoteles_spark.plans.pipeline import batch_write_days, run
    from aristoteles_spark.session import get_spark

    spark = get_spark("pipeline_bench")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="plbench_")
    conf = synth(workdir)
    total_rows = N_DAYS * N_STATIONS * SAMPLES
    start = dt.date(2020, 1, 1)
    last = start + dt.timedelta(days=N_DAYS - 1)
    stop = last  # treat the final synthetic day as "yesterday"

    t0 = time.time()
    res = run(spark, conf, stop=stop, today=last + dt.timedelta(days=1))
    per_day_s = time.time() - t0
    assert res.days_written == N_DAYS, (res.status, res.days_written)

    # fresh archive + state for the batch path
    shutil.rmtree(conf.archive, ignore_errors=True)
    os.remove(conf.state_path)
    t0 = time.time()
    n, _nd = batch_write_days(spark, conf, start, last)
    batch_s = time.time() - t0
    assert n == total_rows, n

    # third strategy: executor-parallel ingest through the wview Python
    # Data Source (day-sliced partitioned reads) feeding the same
    # conversion + single partitioned write. The driver-side Arrow read
    # in batch_write_days serializes ingest through the driver; the
    # connector spreads it across cores — the true 100 TB backfill shape.
    import pyspark.sql.functions as F

    from aristoteles_spark.plans.pipeline import convert_dataframe
    from aristoteles_spark.sources.wview_datasource import WviewDataSource

    spark.dataSource.register(WviewDataSource)
    shutil.rmtree(conf.archive, ignore_errors=True)
    stations_opt = ";".join(
        f"{name}={sc['db_path']}" for name, sc in conf.stations.items()
    )
    t0 = time.time()
    src = (
        spark.read.format("wview").option("stations", stations_opt).load()
    )
    conv = convert_dataframe(src, strict=False)
    ts = F.to_timestamp(F.col("dateTime"))
    out_df = (
        conv.withColumn("date", F.to_date(ts))
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
    out_df.write.mode("overwrite").partitionBy("acq", "date").parquet(
        conf.archive
    )
    wview_s = time.time() - t0
    n3 = spark.read.parquet(conf.archive).count()
    assert n3 == total_rows, n3

    out = (
        "# Pipeline throughput (reference-parity ETL surface)\n\n"
        f"Generated by tools/pipeline_bench.py: {N_DAYS} days x "
        f"{N_STATIONS} stations x {SAMPLES} samples = {total_rows:,} rows, "
        "SQLite in -> converted -> partitioned parquet out "
        "(local[32]; single machine).\n\n"
        "| strategy | wall s | rows/s | days/s |\n|---|---|---|---|\n"
        f"| per-day loop (`run`, reference-faithful watermark) | {per_day_s:.1f} "
        f"| {total_rows / per_day_s:,.0f} | {N_DAYS / per_day_s:.1f} |\n"
        f"| single-job batch (`batch_write_days`, driver-side Arrow ingest) | {batch_s:.1f} "
        f"| {total_rows / batch_s:,.0f} | {N_DAYS / batch_s:.1f} |\n"
        f"| single-job batch via `wview` data source (executor-parallel ingest) | {wview_s:.1f} "
        f"| {total_rows / wview_s:,.0f} | {N_DAYS / wview_s:.1f} |\n\n"
        "The per-day loop pays one Spark job per day for the reference's\n"
        "crash-safe day-at-a-time watermark; the batch paths amortize the\n"
        "whole backlog into one scan and one partitioned write. The wview\n"
        "data source additionally moves the SQLite reads off the driver\n"
        "onto executor tasks (one per station-day slice). At THIS scale,\n"
        "single machine, the driver-side Arrow read can still win — the\n"
        "whole input fits in one cheap local read, while the connector\n"
        "pays Python-worker startup per task. The connector is the shape\n"
        "that survives growth: driver ingest is serial and O(total bytes)\n"
        "on one node, connector ingest is one task per station-day slice\n"
        "and scales with executors.\n\n"
        "The reference executes this workload as a serial Python loop —\n"
        "one SQLite query and one HDF5 file per day x station, scalar\n"
        "per-cell unit conversion (aristoteles/aristoteles.py:332-476) —\n"
        "and publishes no throughput numbers (BASELINE.md).\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PIPELINE_BENCH.md"), "w") as f:
        f.write(out)
    print(out)
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
