"""Key-level upsert into partitioned parquet (sinks/merge.py)."""

from __future__ import annotations

import glob
import os
import tempfile

from aristoteles_spark.sinks.merge import upsert_by_key


def _write_base(spark, path):
    base = spark.createDataFrame(
        [
            (1, "a", 10.0, "2024-01-01"),
            (2, "b", 20.0, "2024-01-01"),
            (3, "c", 30.0, "2024-01-02"),
            (4, "d", 40.0, "2024-01-03"),
        ],
        "id long, name string, v double, d string",
    )
    base.write.mode("overwrite").partitionBy("d").parquet(path)


class TestUpsertByKey:
    def test_update_insert_and_partition_scoping(self, spark):
        tmp = tempfile.mkdtemp(prefix="merge_")
        _write_base(spark, tmp)
        untouched_before = sorted(glob.glob(f"{tmp}/d=2024-01-03/*.parquet"))

        updates = spark.createDataFrame(
            [
                (2, "b2", 21.0, "2024-01-01"),  # update existing key
                (5, "e", 50.0, "2024-01-02"),  # insert new key
            ],
            "id long, name string, v double, d string",
        )
        n = upsert_by_key(spark, tmp, updates, ["id"], "d")
        assert n == 2  # two partitions touched

        got = {
            (r.id, r.name, r.v, str(r.d)) for r in spark.read.parquet(tmp).collect()
        }
        assert got == {
            (1, "a", 10.0, "2024-01-01"),
            (2, "b2", 21.0, "2024-01-01"),
            (3, "c", 30.0, "2024-01-02"),
            (5, "e", 50.0, "2024-01-02"),
            (4, "d", 40.0, "2024-01-03"),
        }
        # untouched partition's files were not rewritten
        untouched_after = sorted(glob.glob(f"{tmp}/d=2024-01-03/*.parquet"))
        assert untouched_before == untouched_after
        assert all(os.path.exists(f) for f in untouched_before)

    def test_idempotent_replay(self, spark):
        tmp = tempfile.mkdtemp(prefix="merge_")
        _write_base(spark, tmp)
        updates = spark.createDataFrame(
            [(2, "b2", 21.0, "2024-01-01")], "id long, name string, v double, d string"
        )
        upsert_by_key(spark, tmp, updates, ["id"], "d")
        first = sorted(map(str, spark.read.parquet(tmp).collect()))
        upsert_by_key(spark, tmp, updates, ["id"], "d")
        assert sorted(map(str, spark.read.parquet(tmp).collect())) == first
