"""Temporal join queries (as-of, interval) + duckdb oracles.

duckdb has native ASOF JOIN — the oracle uses it directly, so the
Spark union+running-window formulation is checked against an
independent first-class implementation of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aristoteles_spark.operators.temporal import asof_join, interval_join_binned
from aristoteles_spark.sources.parquet_source import load_table

RADIUS_SEC = 60


def q_asof(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase")
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        right_cols={"event_id": "purchase_event", "value": "purchase_value"},
    ).orderBy("event_id")


def q_interval_counts(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "ts")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "ts")
    joined = interval_join_binned(clicks, errors, "ts", "ts", RADIUS_SEC)
    counts = joined.groupBy("event_id").agg(F.count("_b_event_id").alias("n_errors"))
    return (
        clicks.join(counts, "event_id", "left")
        .select("event_id", F.coalesce("n_errors", F.lit(0)).alias("n_errors"))
        .orderBy("event_id")
    )


QUERIES = {
    "at1_asof_join": q_asof,
    "at2_interval_join": q_interval_counts,
}

ORACLE = {
    "at1_asof_join": """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purch AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id, c.ts,
       p.event_id AS purchase_event, p.value AS purchase_value
FROM clicks c
ASOF LEFT JOIN (SELECT user_id, ts, event_id, value FROM purch WHERE rn = 1) p
  ON c.user_id = p.user_id AND p.ts <= c.ts
ORDER BY c.event_id
""",
    "at2_interval_join": f"""
SELECT c.event_id, count(e.event_id) AS n_errors
FROM events c
LEFT JOIN events e
  ON e.event_type = 'error'
 AND abs(epoch_us(e.ts) - epoch_us(c.ts)) <= {RADIUS_SEC * 1_000_000}
WHERE c.event_type = 'click'
GROUP BY c.event_id
ORDER BY c.event_id
""",
}
