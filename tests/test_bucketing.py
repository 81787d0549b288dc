"""Bucketed-table co-located join: the write-once-shuffle-once layout.

Asserts the property the sink exists for: a join between two tables
bucketed by the same key with the same bucket count plans WITHOUT any
Exchange (shuffle) — and returns the same rows as the plain join.
"""

from __future__ import annotations

import tempfile

import pytest

from aristoteles_spark.sinks.bucketed import colocated_join, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    tmp = tempfile.mkdtemp(prefix="bucketed_")
    write_bucketed(li, "b_lineitem", "l_orderkey", 8, f"{tmp}/li")
    write_bucketed(o, "b_orders", "l_orderkey", 8, f"{tmp}/o")
    yield li, o
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestBucketedJoin:
    def test_join_is_exchange_free(self, spark, bucketed_tables):
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = colocated_join(spark, "b_lineitem", "b_orders", "l_orderkey")
            plan = _plan(j)
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_unbucketed_join_does_shuffle(self, spark, bucketed_tables):
        li, o = bucketed_tables
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(li.join(o, "l_orderkey"))
            assert "Exchange" in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_same_rows_as_plain_join(self, spark, bucketed_tables):
        li, o = bucketed_tables
        got = colocated_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        want = li.join(o, "l_orderkey")
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
