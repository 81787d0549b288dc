"""Format round-trips: CSV/JSONL sources and the ORC daily sink."""

from __future__ import annotations

import datetime as dt
import glob
import os
import tempfile

from pyspark.sql import functions as F

from aristoteles_spark.sources.files import load_csv, load_jsonl

SF_DIR = "/root/testdata/sf0.001"
NATION_DDL = "n_nationkey long, n_name string, n_regionkey long"


class TestFileSources:
    def _nation(self, spark):
        return spark.read.parquet(f"{SF_DIR}/nation.parquet").select(
            "n_nationkey", "n_name", "n_regionkey"
        )

    def test_csv_roundtrip(self, spark):
        n = self._nation(spark)
        tmp = tempfile.mkdtemp(prefix="csv_")
        n.write.mode("overwrite").option("header", True).csv(tmp)
        back = load_csv(spark, tmp, NATION_DDL)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, n.collect()))

    def test_jsonl_roundtrip(self, spark):
        n = self._nation(spark)
        tmp = tempfile.mkdtemp(prefix="jsonl_")
        n.write.mode("overwrite").json(tmp)
        back = load_jsonl(spark, tmp, NATION_DDL)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, n.collect()))

    def test_csv_malformed_rows_do_not_fail_job(self, spark):
        tmp = tempfile.mkdtemp(prefix="csvbad_")
        with open(os.path.join(tmp, "part.csv"), "w") as f:
            f.write("n_nationkey,n_name,n_regionkey\n1,ok,2\nnot_a_number,bad,x\n")
        back = load_csv(spark, tmp, NATION_DDL)
        rows = back.collect()
        assert len(rows) == 2  # PERMISSIVE: malformed row nulled, not fatal
        assert {r.n_nationkey for r in rows} == {1, None}


class TestOrcSink:
    def test_write_day_orc(self, spark):
        from aristoteles_spark.schema import ARCHIVE_SCHEMA, MEASURES
        from aristoteles_spark.sinks.daily_parquet import write_day

        day = dt.date(2020, 6, 1)
        t0 = int(dt.datetime(2020, 6, 1, tzinfo=dt.timezone.utc).timestamp())
        rows = [
            (t0 + i * 300, 0, *[float(i + j) for j in range(len(MEASURES))])
            for i in range(4)
        ]
        df = spark.createDataFrame(rows, schema=ARCHIVE_SCHEMA).withColumn(
            "station", F.lit("st")
        )
        tmp = tempfile.mkdtemp(prefix="orc_archive_")
        n = write_day(df, tmp, "wx", day, {"st": {"db_path": "x"}}, fmt="orc")
        assert n == 4
        files = glob.glob(f"{tmp}/acq=*/date=*/*.orc")
        assert files, os.listdir(tmp)
        back = spark.read.orc(tmp)
        assert back.count() == 4
        assert back.filter(F.col("outTemp").isNotNull()).count() == 4


class TestSqlSurface:
    def test_run_sql_matches_dataframe_api(self, spark):
        from pyspark.sql import functions as F

        from aristoteles_spark.plans.sql import register_views, run_sql
        from aristoteles_spark.sources.parquet_source import load_table

        sf = "/root/testdata/sf0.001"
        got = run_sql(
            spark,
            sf,
            "SELECT r_name, count(*) AS n FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY r_name ORDER BY r_name",
        ).collect()
        want = (
            load_table(spark, sf, "customer")
            .join(load_table(spark, sf, "nation"),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .join(load_table(spark, sf, "region"),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy("r_name")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("r_name")
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
        assert set(register_views(spark, sf)) >= {"lineitem", "orders"}
