"""SQL entry surface: the test tables as temp views + a one-call runner.

The DataFrame API is the engine's primary surface (queries/), but a
complete engine also exposes the literal SQL path — `spark.sql` over the
same tables, same Catalyst plans, same pushdown. (The reference's whole
query surface is three SQL statements pushed into SQLite,
aristoteles/aristoteles.py:240,304,340-345; this is its Spark analogue:
SQL text in, optimized distributed scan out.)

Views are session-scoped temp views over the parquet sources — zero
copy, lazily planned; registering them is metadata-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aristoteles_spark.sources.parquet_source import TABLES, load_table


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register each test table as a session temp view named after it.
    Returns the list registered. Idempotent (replaces existing views)."""
    names = tables if tables is not None else TABLES
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(names)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Run a SQL string against the registered table views (registering
    them first). The text goes through the same parser/optimizer as the
    DataFrame API — one engine, two dialect surfaces."""
    register_views(spark, sf_dir)
    return spark.sql(sql)
