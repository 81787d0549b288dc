"""Analytic extension queries: multi-level rollup aggregation and
deterministic sketches + duckdb oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from aristoteles_spark.operators.sketches import kmv_distinct_estimate
from aristoteles_spark.sources.parquet_source import load_table

KMV_K = 256


def q_rollup(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().alias("g_level"),
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_price"),
        )
        .orderBy("g_level", "o_orderpriority", "o_orderstatus")
    )


def q_cube(spark, sf_dir):
    lf = load_table(spark, sf_dir, "lineitem")
    return (
        lf.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("g_level"),
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        )
        .orderBy("g_level", "l_returnflag", "l_linestatus")
    )


def q_kmv(spark, sf_dir):
    lf = load_table(spark, sf_dir, "lineitem")
    return kmv_distinct_estimate(lf, "l_orderkey", k=KMV_K)


QUERIES = {
    "g4_rollup": q_rollup,
    "g5_cube": q_cube,
    "sk1_kmv_distinct": q_kmv,
}

_H32_KEY = (
    "CAST(concat('0x', substr(md5(concat('0:', CAST(l_orderkey AS VARCHAR))), 1, 8)) AS BIGINT)"
)

ORACLE = {
    "g4_rollup": (
        "SELECT o_orderpriority, o_orderstatus, "
        "GROUPING(o_orderpriority, o_orderstatus) AS g_level, "
        "count(*) AS n_orders, "
        "sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_price "
        "FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus) "
        "ORDER BY g_level, o_orderpriority, o_orderstatus"
    ),
    "g5_cube": (
        "SELECT l_returnflag, l_linestatus, "
        "GROUPING(l_returnflag, l_linestatus) AS g_level, "
        "count(*) AS n_items, "
        "sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty "
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) "
        "ORDER BY g_level, l_returnflag, l_linestatus"
    ),
    "sk1_kmv_distinct": f"""
WITH h AS (
  SELECT DISTINCT {_H32_KEY} AS h FROM lineitem
), topk AS (
  SELECT h FROM h ORDER BY h LIMIT {KMV_K}
)
SELECT count(*) AS k_used, max(h) AS kth_min_hash,
  CASE WHEN count(*) < {KMV_K} THEN CAST(count(*) AS DOUBLE)
       ELSE {KMV_K - 1} * 4294967296.0 / max(h) END AS est_distinct
FROM topk
""",
}
