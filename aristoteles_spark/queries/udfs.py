"""UDF-surface queries: one per Python extension API + duckdb oracles.

The reference needs no UDFs (SURVEY §2.10) and this engine's hot paths
are all Catalyst codegen — these queries exist to keep every Spark
Python extension point exercised and oracle-checked, so a user who does
need one has a working, tested template:

- `uf1` vectorized scalar ``pandas_udf`` (Arrow-batched, columnar)
- `uf2` Python UDTF (table function, lateral-joined in SQL)
- mapInPandas           -> mm2/mm6-9 (multimodal/features.py)
- applyInPandasWithState-> st2/st9 (streaming/events.py)
- row-at-a-time F.udf   -> deliberately ABSENT engine-wide (the slow
  path; every scalar transform has a codegen form)

Kernels are chosen deterministic-exact (integer arithmetic) so the SQL
oracles hash-match.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from aristoteles_spark.sources.parquet_source import load_table

# NOTE: pandas_udf("long")/udtf(returnType=...) parse their DDL through
# the ACTIVE SparkContext, so decorating at module import would make
# `import aristoteles_spark.queries` require a live session. Both are
# therefore built lazily inside the query functions.


def q_pandas_udf_cents(spark, sf_dir):
    """Arrow-batched scalar pandas UDF: value -> integer cents, then a
    plain exact aggregate over the UDF output. The UDF stage is a map —
    no shuffle added; the agg shuffles tiny (type, sums) pairs."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def to_cents(v: pd.Series) -> pd.Series:
        # whole Arrow batch per call; numpy kernel, no per-row Python
        return v.mul(100).round().astype("int64")

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return (
        e.select("event_type", to_cents("value").alias("cents"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
        .orderBy("event_type")
    )


class _CharChunks:
    """Table function: fixed-width character chunking of a document —
    one input row expands to ceil(len/size) output rows."""

    def eval(self, text: str, size: int):
        if text is None:
            return
        for i in range(0, len(text), size):
            yield i // size, i + 1, len(text[i:i + size])


def q_udtf_chunks(spark, sf_dir):
    """Python UDTF lateral-joined in SQL: per-document fixed-width char
    chunks with positions. (tx10 is the codegen equivalent for token
    chunking — the UDTF form is the template for expansions that
    genuinely need Python.)"""
    from pyspark.sql.functions import udtf

    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "uf2_documents"
    )
    spark.udtf.register(
        "char_chunks",
        udtf(_CharChunks, returnType="chunk_id int, start_pos int, n_chars int"),
    )
    return spark.sql(
        "SELECT doc_id, c.chunk_id, c.start_pos, c.n_chars "
        "FROM uf2_documents, LATERAL char_chunks(text, 120) AS c "
        "ORDER BY doc_id, c.chunk_id"
    )


def q_grouped_agg_udaf(spark, sf_dir):
    """GROUPED_AGG pandas UDF (vectorized UDAF): the whole group's
    column arrives as one pandas Series, the return is a scalar —
    Spark still splits the work into partial batches per group, and the
    kernel is a numpy reduction, no per-row Python. Template for custom
    aggregates the built-ins can't express; here the kernel is
    integer-exact so the oracle hash-matches."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def cents_sum(v: pd.Series) -> int:
        return int(v.mul(100).round().astype("int64").sum())

    @pandas_udf("long")
    def group_size(v: pd.Series) -> int:
        # Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
        # aggregates in one agg(), so the count is a pandas UDAF too
        return int(len(v))

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return (
        e.groupBy("event_type")
        .agg(
            group_size("value").alias("n"),
            cents_sum("value").alias("total_cents"),
        )
        .orderBy("event_type")
    )


def q_grouped_map_deltas(spark, sf_dir):
    """Grouped-map ``applyInPandas``: each user's full (bounded) history
    arrives as one pandas DataFrame; the kernel time-sorts it and emits
    per-event deltas — the template for per-key sequential feature
    engineering that needs a real DataFrame (order-dependent, multi-
    column). One user_id shuffle, Arrow both ways, deterministic sort
    key inside the kernel, integer outputs."""

    def deltas(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        cents = pdf["value"].mul(100).round().astype("int64")
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "cents": cents,
                "delta_cents": cents.diff().fillna(0).astype("int64"),
            }
        )

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_id", "ts", "value")
    )
    out = e.groupBy("user_id").applyInPandas(
        deltas,
        "user_id long, event_id long, cents long, delta_cents long",
    )
    # Barrier between the kernel and the presentation sort: a global
    # orderBy needs a range-partitioner sample pass, and with no
    # materialization boundary that sample pass re-executes the whole
    # grouped-map kernel — every row crosses the Python boundary TWICE
    # (measured at sf0.1: 7.5 s -> 4.1 s with the barrier; results
    # byte-identical). Flag-aware so the plan audit still sees the
    # FlatMapGroupsInPandas + user_id hashpartitioning strategy plan.
    from aristoteles_spark.operators.barrier import audit_barrier

    return audit_barrier(out, eager=False).orderBy("user_id", "event_id")


QUERIES = {
    "uf1_pandas_udf_cents": q_pandas_udf_cents,
    "uf2_udtf_chunks": q_udtf_chunks,
    "uf3_grouped_agg_udaf": q_grouped_agg_udaf,
    "uf4_grouped_map_deltas": q_grouped_map_deltas,
}

ORACLE = {
    "uf1_pandas_udf_cents": """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS max_cents
FROM events WHERE value IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
    "uf3_grouped_agg_udaf": """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events WHERE value IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
    "uf4_grouped_map_deltas": """
WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
)
SELECT user_id, event_id, cents,
       coalesce(cents - lag(cents) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id), 0)
         AS delta_cents
FROM e ORDER BY user_id, event_id
""",
    "uf2_udtf_chunks": """
SELECT doc_id, CAST((s - 1) // 120 AS INT) AS chunk_id,
       CAST(s AS INT) AS start_pos,
       CAST(least(120, length(text) - s + 1) AS INT) AS n_chars
FROM documents, unnest(range(1, length(text) + 1, 120)) AS r(s)
WHERE length(text) > 0
ORDER BY doc_id, chunk_id
""",
}
