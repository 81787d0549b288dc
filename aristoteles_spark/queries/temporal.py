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
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        right_cols={"event_id": "purchase_event", "value": "purchase_value"},
    )
    # purchase_event is a nullable int (no purchase at-or-before the click):
    # a nullable int column degrades to float64 through the driver's pandas
    # canonicalization on the oracle side only ("487" vs "487.0"). Nullable
    # DOUBLE round-trips identically on both sides (wf2 proved this in the
    # round-1 driver check), so ship the column as double on both.
    return out.withColumn(
        "purchase_event", F.col("purchase_event").cast("double")
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


def q_time_weighted_avg(spark, sf_dir):
    """Time-weighted average per user (TimescaleDB-style `time_weight`
    with last-observation-carried-forward): each sample's value is
    weighted by the interval until the next sample; the last sample
    carries no weight. Windowed `lead` partitioned by user_id — fully
    distributed, no cross-partition state; microsecond-exact weights
    (unix_micros) and an INTEGER accumulator so the sum is
    order-insensitive and engine-exact.

    Why integer cents, not a decimal accumulator: the weighted sum
    reaches ~16-20 significant digits, and duckdb's DECIMAL->DOUBLE cast
    converts the int128 payload through a hi/lo two-step that is not
    correctly rounded at that width (round-2 strict gate: identical
    decimals on both engines, different doubles). int64 -> double IS
    correctly rounded everywhere. value is 2-dp, so cents are exact; the
    numerator is bounded by max_cents x total span in us (~1e17 << 2^63),
    independent of row count.
    """
    from pyspark.sql.window import Window

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_id", "ts", "value")
    )
    from aristoteles_spark.functions.time import epoch_us

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "user_id",
        (F.lead(epoch_us(e, "ts")).over(w) - epoch_us(e, "ts")).alias("w_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return (
        seg.groupBy("user_id")
        .agg(
            (
                F.sum(F.col("cents") * F.col("w_us")).cast("double")
                / (F.lit(100.0) * F.sum("w_us").cast("double"))
            ).alias("twa")
        )
        .orderBy("user_id")
    )


def q_ohlc_downsample(spark, sf_dir):
    """Timeseries downsampling to 15-minute OHLC bars per user (the
    hypertable/continuous-aggregate staple): open/close via min_by/max_by
    on the (ts, event_id) order key — one hash aggregate, no per-bucket
    window or sort; high/low/count are plain aggregates. One shuffle on
    (user_id, bucket), partial-aggregated map-side."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    okey = F.struct("ts", "event_id")
    return (
        e.groupBy("user_id", F.window("ts", "15 minutes").alias("w"))
        .agg(
            F.min_by("value", okey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", okey).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("bucket_start"),
            "open",
            "high",
            "low",
            "close",
            "n",
        )
        .orderBy("user_id", "bucket_start")
    )


EWMA_ALPHA = 0.125  # 1/8: exactly representable, multiplications exact-ish


def q_ewma(spark, sf_dir):
    """Per-user exponentially-weighted moving average of event values —
    the smoothing/feature op of a time-series pipeline. EWMA is an
    inherently sequential fold (acc*(1-a) + a*x), so it is computed as
    an IN-ROW left fold over each user's time-ordered value array:
    deterministic regardless of partitioning, identical fold order in
    the oracle (list_reduce over list(.. ORDER BY ts, event_id)), and
    every step a correctly-rounded IEEE op on identical doubles. Per-key
    event counts are bounded (sessions/user), so the collected array is
    small; an unbounded stream would use the applyInPandasWithState
    form (streaming/events.py) instead. One user_id shuffle total."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    folded = (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "value"))
                ),
                F.lit(None).cast("double"),
                lambda acc, x: F.when(acc.isNull(), x["value"]).otherwise(
                    acc * F.lit(0.875) + x["value"] * F.lit(0.125)
                ),
            ).alias("ewma"),
        )
    )
    return folded.select("user_id", "n", "ewma").orderBy("user_id")


QUERIES = {
    "ew1_ewma": q_ewma,
    "at1_asof_join": q_asof,
    "at2_interval_join": q_interval_counts,
    "at3_time_weighted_avg": q_time_weighted_avg,
    "at4_ohlc_downsample": q_ohlc_downsample,
}

ORACLE = {
    "ew1_ewma": """
WITH e AS (
  SELECT user_id, ts, event_id, value FROM events WHERE value IS NOT NULL
)
SELECT user_id, count(*) AS n,
       list_reduce(list(value ORDER BY ts, event_id),
                   (a, b) -> a * 0.875 + b * 0.125) AS ewma
FROM e GROUP BY user_id ORDER BY user_id
""",
    "at1_asof_join": """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purch AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id, c.ts,
       CAST(p.event_id AS DOUBLE) AS purchase_event, p.value AS purchase_value
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
    "at3_time_weighted_avg": """
WITH seg AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS w_us
  FROM events WHERE value IS NOT NULL
)
SELECT user_id,
       CAST(CAST(sum(cents * w_us) AS BIGINT) AS DOUBLE)
            / (100.0 * CAST(sum(w_us) AS DOUBLE)) AS twa
FROM seg GROUP BY user_id ORDER BY user_id
""",
    "at4_ohlc_downsample": """
SELECT user_id, time_bucket(INTERVAL '15 minutes', ts) AS bucket_start,
       first(value ORDER BY ts, event_id) AS open,
       max(value) AS high, min(value) AS low,
       last(value ORDER BY ts, event_id) AS close,
       count(*) AS n
FROM events WHERE value IS NOT NULL
GROUP BY user_id, bucket_start
ORDER BY user_id, bucket_start
""",
}
