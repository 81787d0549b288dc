"""Window operators: analytic functions and time-bucketed aggregation.

The reference's only window is the tumbling 1-day UTC span
(aristoteles/aristoteles.py:334, SURVEY §2.5); this module declares that
shape plus the full analytic-window surface an engine needs (ranking,
offsets, running frames) and hopping/session variants of time bucketing.

Scale notes: analytic windows shuffle once on the partition key;
time-bucket groupBys are partial-aggregated map-side. The sliding window is
expressed as an explicit 2-bucket assignment (explode of the two candidate
starts) — the same plan F.window generates, kept explicit so the oracle SQL
is a literal transliteration.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from aristoteles_spark.sources.parquet_source import load_table


# --- analytic: ranking within groups (top-3 orders per priority)
def q_row_number(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn")
    )


# --- analytic: offset functions (per-user value delta between events)
def q_lag_delta(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_value", F.lag("value").over(w))
        .select(
            "event_id",
            "user_id",
            (F.col("value") - F.col("prev_value")).alias("delta"),
        )
        .orderBy("event_id")
    )


# --- analytic: running (cumulative) frame per customer
def q_running_sum(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.withColumn(
            "running_total",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w),
        )
        .select("o_orderkey", "o_custkey", "running_total")
        .orderBy("o_orderkey")
    )


# --- analytic: time-RANGE window frame (trailing 1-hour moving average).
# rows-based frames (wf3) count rows; RANGE frames bound by a VALUE delta
# on the ordering column — Spark needs a numeric order key for
# rangeBetween, so the frame orders on epoch seconds. Decimal-cast sum /
# count keeps the average order-insensitive and engine-exact.
def q_time_range_avg(spark, sf_dir):
    from aristoteles_spark.functions.time import epoch_us

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us(e, "ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            (
                F.sum(F.col("value").cast("decimal(30,10)")).over(w).cast("double")
                / F.count(F.lit(1)).over(w)
            ).alias("trailing_avg"),
        )
        .orderBy("event_id")
    )


# --- analytic: dense_rank (gap-free ranking across a whole table).
# A naive Window.orderBy with no partition key moves the WHOLE table to one
# partition; but dense_rank of a row == rank of its distinct value, so we
# rank the distinct values (tiny at any scale) and broadcast-join back —
# the big table is never globally sorted.
def q_dense_rank(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    w = Window.orderBy(F.col("p_size").desc())
    ranks = (
        p.select("p_size").distinct().withColumn("size_rank", F.dense_rank().over(w))
    )
    return (
        p.join(F.broadcast(ranks), "p_size")
        .select("p_partkey", "p_size", "size_rank")
        .orderBy("p_partkey")
    )


# --- time bucket: tumbling 1-hour window (the reference's W1 shape at
# finer grain; F.window -> struct, we project the start)
def q_tumbling_hour(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,10)")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket"), "n", "sum_value")
        .orderBy("bucket")
    )


# --- time bucket: hopping/sliding window (1h length, 30m hop): every row
# lands in exactly 2 buckets
def q_sliding_window(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "n")
        .orderBy("bucket")
    )


# --- time bucket: session window (30-minute gap) per user
def q_sliding_distinct(spark, sf_dir):
    """Sliding-window DISTINCT users (wb2's distinct-cardinality form):
    exact count_distinct per overlapping hour window — the audience/
    reach metric. Each event lands in 2 overlapping windows (Expand),
    then one partial-agg distinct shuffle keyed by (window, user). At
    100 TB the approximate form is approx_count_distinct over the same
    expansion; this exact query is its stated oracle."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(F.col("w.start").alias("bucket"), "n_users")
        .orderBy("bucket")
    )


def q_calendar_join(spark, sf_dir):
    """Generated date-dimension join: the calendar is SYNTHESIZED with
    sequence+explode (no stored dim table needed), carries derived
    attributes (day-of-week as the PORTABLE integer (epoch_days+4)%7 —
    1970-01-01 was a Thursday; engine dow() numberings differ), and
    left-joins the daily fact rollup so empty days still appear. The
    generated-dimension pattern: the dim is a few rows of codegen,
    always broadcast, never stored or shuffled."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n_events")
    )
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
            )
        ).alias("d")
    ).select(
        "d",
        F.pmod(F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) + 4, F.lit(7))
        .cast("int")
        .alias("dow"),
    )
    return (
        cal.join(daily, "d", "left")
        .select(
            "d",
            "dow",
            (F.col("dow") >= 5).cast("int").alias("is_weekend"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
        .orderBy("d")
    )


def q_session_window(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("session_start"), "n")
        .orderBy("user_id", "session_start")
    )


# --- analytic: ntile quartiles + first/last value frames per group
def q_ntile_bounds(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.first_value("o_orderkey").over(wfull).alias("cheapest_key"),
            F.last_value("o_orderkey").over(wfull).alias("priciest_key"),
        )
        .orderBy("o_orderkey")
    )


# --- analytic: relative-position functions. percent_rank and cume_dist
# are exact integer ratios ((rank-1)/(n-1), n_at_or_before/n) — engine-
# independent doubles, so value-hash oracle checking is exact.
def q_percent_rank(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cum_dist"),
        )
        .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
    )


# --- gap filling + LOCF interpolation: materialize the regular hourly
# grid (the reference's data model is exactly such a grid — 288 5-minute
# slots/day, aristoteles/aristoteles.py:296-316 — with the completeness
# gate counting missing slots) and carry the last observed hourly average
# forward across empty slots. The grid is sequence+explode from a
# single-row bounds aggregate — built in-row, broadcast-joined to the
# (tiny) per-slot aggregate; the LOCF is one keyed window. No UDF, no
# driver loop, and the fact table shuffles once for the slot aggregate.
def q_gapfill_locf(spark, sf_dir):
    from aristoteles_spark.functions.time import (
        ntz_epoch_us,
        ntz_from_epoch_us,
        ntz_trunc,
    )

    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        ntz_trunc("hour", F.min("ts")).alias("t0"),
        ntz_trunc("hour", F.max("ts")).alias("t1"),
    )
    # slots generated in epoch-microsecond space: F.sequence over NTZ
    # timestamps coerces through the session timezone (caught under a
    # non-UTC session), integer arithmetic cannot
    slots = bounds.select(
        F.explode(
            F.sequence(
                ntz_epoch_us("t0"), ntz_epoch_us("t1"), F.lit(3_600_000_000)
            )
        ).alias("us")
    ).select(ntz_from_epoch_us("us").alias("slot"))
    types = e.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(slots))
    agg = e.groupBy(
        "event_type", ntz_trunc("hour", "ts").alias("slot")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("value").cast("decimal(30,10)")).cast("double")
            / F.count("value")
        ).alias("hourly_avg"),
    )
    w = Window.partitionBy("event_type").orderBy("slot")
    return (
        grid.join(agg, ["event_type", "slot"], "left")
        .select(
            "event_type",
            "slot",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.last("hourly_avg", ignorenulls=True).over(w).alias("locf_avg"),
        )
        .orderBy("event_type", "slot")
    )


QUERIES = {
    "wb5_gapfill_locf": q_gapfill_locf,
    "wb6_sliding_distinct": q_sliding_distinct,
    "dm1_calendar_join": q_calendar_join,
    "wf1_row_number": q_row_number,
    "wf2_lag_delta": q_lag_delta,
    "wf3_running_sum": q_running_sum,
    "wf4_dense_rank": q_dense_rank,
    "wb1_tumbling_hour": q_tumbling_hour,
    "wb2_sliding_window": q_sliding_window,
    "wb3_session_window": q_session_window,
    "wf5_ntile_bounds": q_ntile_bounds,
    "wf6_time_range_avg": q_time_range_avg,
    "wf7_percent_rank": q_percent_rank,
}

ORACLE = {
    "wb5_gapfill_locf": """
WITH b AS (
  SELECT date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
  FROM events
), slots AS (
  SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS slot FROM b
), types AS (
  SELECT DISTINCT event_type FROM events
), agg AS (
  SELECT event_type, date_trunc('hour', ts) AS slot, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(value)
           AS hourly_avg
  FROM events GROUP BY event_type, slot
)
SELECT t.event_type, s.slot, coalesce(a.n, 0) AS n_events,
       last_value(a.hourly_avg IGNORE NULLS) OVER (
         PARTITION BY t.event_type ORDER BY s.slot
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_avg
FROM types t CROSS JOIN slots s
LEFT JOIN agg a ON a.event_type = t.event_type AND a.slot = s.slot
ORDER BY t.event_type, s.slot
""",
    "wf7_percent_rank": (
        "SELECT o_orderpriority, o_orderkey, o_totalprice, "
        "percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS pct_rank, "
        "cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cum_dist "
        "FROM orders ORDER BY o_orderpriority, o_totalprice, o_orderkey"
    ),
    "wf1_row_number": (
        "SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM ("
        "  SELECT o_orderpriority, o_orderkey, o_totalprice,"
        "         row_number() OVER (PARTITION BY o_orderpriority"
        "                            ORDER BY o_totalprice DESC, o_orderkey) AS rn"
        "  FROM orders) WHERE rn <= 3 ORDER BY o_orderpriority, rn"
    ),
    "wf2_lag_delta": (
        "SELECT event_id, user_id, value - lag(value) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS delta "
        "FROM events ORDER BY event_id"
    ),
    "wf3_running_sum": (
        "SELECT o_orderkey, o_custkey, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER ("
        "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) "
        "AS running_total "
        "FROM orders ORDER BY o_orderkey"
    ),
    "wf4_dense_rank": (
        "SELECT p_partkey, p_size, dense_rank() OVER (ORDER BY p_size DESC) AS size_rank "
        "FROM part ORDER BY p_partkey"
    ),
    "wf5_ntile_bounds": (
        "SELECT o_orderkey, o_orderpriority, "
        "ntile(4) OVER w AS quartile, "
        "first_value(o_orderkey) OVER wf AS cheapest_key, "
        "last_value(o_orderkey) OVER wf AS priciest_key "
        "FROM orders WINDOW "
        "w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey), "
        "wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
        "ORDER BY o_orderkey"
    ),
    "wf6_time_range_avg": (
        "SELECT event_id, user_id, "
        "CAST(sum(CAST(value AS DECIMAL(30,10))) OVER w AS DOUBLE) "
        "/ count(*) OVER w AS trailing_avg "
        "FROM events WHERE value IS NOT NULL "
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) "
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) "
        "ORDER BY event_id"
    ),
    "wb1_tumbling_hour": (
        "SELECT date_trunc('hour', ts) AS bucket, count(*) AS n, "
        "CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY bucket ORDER BY bucket"
    ),
    "wb2_sliding_window": (
        "WITH assigned AS ("
        "  SELECT time_bucket(INTERVAL '30 minutes', ts) - "
        "         (o.off * INTERVAL '30 minutes') AS bucket"
        "  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS off) o"
        "  WHERE ts >= time_bucket(INTERVAL '30 minutes', ts) - (o.off * INTERVAL '30 minutes')"
        "    AND ts <  time_bucket(INTERVAL '30 minutes', ts) - (o.off * INTERVAL '30 minutes')"
        "         + INTERVAL '1 hour') "
        "SELECT bucket, count(*) AS n FROM assigned GROUP BY bucket ORDER BY bucket"
    ),
    "wb6_sliding_distinct": (
        "WITH assigned AS ("
        "  SELECT user_id, time_bucket(INTERVAL '30 minutes', ts) - "
        "         (o.off * INTERVAL '30 minutes') AS bucket"
        "  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS off) o"
        "  WHERE ts >= time_bucket(INTERVAL '30 minutes', ts) - (o.off * INTERVAL '30 minutes')"
        "    AND ts <  time_bucket(INTERVAL '30 minutes', ts) - (o.off * INTERVAL '30 minutes')"
        "         + INTERVAL '1 hour') "
        "SELECT bucket, count(DISTINCT user_id) AS n_users "
        "FROM assigned GROUP BY bucket ORDER BY bucket"
    ),
    "dm1_calendar_join": (
        "WITH cal AS ("
        "  SELECT CAST(s AS DATE) AS d,"
        "         CAST((datediff('day', DATE '1970-01-01', CAST(s AS DATE)) + 4) % 7 AS INT) AS dow"
        "  FROM generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL '1 day') g(s)"
        "), daily AS ("
        "  SELECT CAST(ts AS DATE) AS d, count(*) AS n_events FROM events GROUP BY d"
        ") "
        "SELECT cal.d, dow, CAST(dow >= 5 AS INT) AS is_weekend, "
        "coalesce(n_events, 0) AS n_events "
        "FROM cal LEFT JOIN daily ON cal.d = daily.d ORDER BY cal.d"
    ),
    "wb3_session_window": (
        "WITH marked AS ("
        "  SELECT user_id, ts,"
        "         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        "                   > INTERVAL '30 minutes' OR"
        "              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL"
        "              THEN 1 ELSE 0 END AS new_session"
        "  FROM events), "
        "sessions AS ("
        "  SELECT user_id, ts,"
        "         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts"
        "             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid"
        "  FROM marked) "
        "SELECT user_id, min(ts) AS session_start, count(*) AS n "
        "FROM sessions GROUP BY user_id, sid ORDER BY user_id, session_start"
    ),
}
