"""Temporal join queries (as-of, interval) + duckdb oracles.

duckdb has native ASOF JOIN — the oracle uses it directly, so the
Spark union+running-window formulation is checked against an
independent first-class implementation of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aristoteles_spark.functions.time import epoch_us
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


FAR_FUTURE_US = 9_999_999_999_999_999  # open-interval sentinel (~year 2286)


def q_interval_coalesce(spark, sf_dir):
    """Gaps-and-islands interval coalescing per user: each event opens a
    deterministic interval ``[ts, ts + (event_id % 540 + 60) s]``;
    overlapping or touching intervals merge into one island (the classic
    availability/uptime/session-merge operator timeseries engines ship
    as ``range_agg``). Cumulative-max formulation: a row starts a new
    island iff its start exceeds the running max end of all prior rows —
    two window passes + one groupBy, all on the SAME user_id
    partitioning, so Catalyst plans a single shuffle and reuses the
    sort. All arithmetic is integer microseconds — engine-exact.

    Scale: per-key windows; parallelism = #users, per-user row counts
    bounded. No self-join, no range explosion (contrast the naive
    interval-overlap join which is quadratic per key)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    s_us = epoch_us(e, "ts")
    iv = e.select(
        "user_id",
        "event_id",
        s_us.alias("start_us"),
        (s_us + ((F.col("event_id") % 540) + 60) * F.lit(1_000_000)).alias("end_us"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("start_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("start_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            F.col("start_us") > F.coalesce(F.max("end_us").over(w_prev), F.lit(-1)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("island", F.sum("new_island").over(w_run))
    return (
        flagged.groupBy("user_id", "island")
        .agg(
            F.min("start_us").alias("ivl_start_us"),
            F.max("end_us").alias("ivl_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "island")
    )


def q_scd2_history(spark, sf_dir):
    """Slowly-changing-dimension (Type 2) history build: per user, the
    click stream carries an attribute (``tier = event_id % 3``); collapse
    runs of the unchanged attribute, then emit versioned validity
    intervals ``[valid_from_us, valid_to_us)`` with the open current
    version carrying a far-future sentinel (a NULL bigint would degrade
    to float64 through the driver's pandas canonicalization — same
    hazard at1 documents). lag-filter + lead + row_number all share one
    user_id partitioning: one shuffle, one sort, three window functions.

    Scale: the change-collapse happens BEFORE the interval build, so
    state per key is #changes, not #events; no joins."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    rows = e.select(
        "user_id",
        "event_id",
        epoch_us(e, "ts").alias("ts_us"),
        (F.col("event_id") % 3).alias("tier"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = rows.withColumn("prev_tier", F.lag("tier").over(w)).filter(
        F.col("prev_tier").isNull() | (F.col("tier") != F.col("prev_tier"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        changes.select(
            "user_id",
            F.row_number().over(w2).alias("version"),
            "tier",
            F.col("ts_us").alias("valid_from_us"),
            F.coalesce(F.lead("ts_us").over(w2), F.lit(FAR_FUTURE_US)).alias(
                "valid_to_us"
            ),
        )
        .orderBy("user_id", "version")
    )


def q_feature_snapshot(spark, sf_dir):
    """Feature-store point-in-time join: label events (purchases) pick
    up, per user, the LATEST value of two independently-updated feature
    streams as of the label timestamp — last click value (7-day
    tolerance) and last view value (unbounded) — with no leakage from
    the future (the correctness property a feature store exists for).
    Two as-of joins, each a union + running-last window on the same
    user_id key; Catalyst plans them back-to-back on one partitioning.
    Feature values ride as cents (exact)."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    labels = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(
        (F.col("event_type") == "click") & F.col("value").isNotNull()
    ).select("user_id", "ts", cents.alias("click_cents"), "event_id")
    views = e.filter(
        (F.col("event_type") == "view") & F.col("value").isNotNull()
    ).select("user_id", "ts", cents.alias("view_cents"), "event_id")
    step1 = asof_join(
        labels,
        clicks,
        on="user_id",
        right_cols={"click_cents": "f_click_cents"},
        tolerance=F.expr("INTERVAL 7 DAYS"),
    )
    step2 = asof_join(
        step1,
        views,
        on="user_id",
        right_cols={"view_cents": "f_view_cents"},
    )
    return step2.select(
        "event_id",
        "user_id",
        F.coalesce("f_click_cents", F.lit(-1)).alias("f_click_cents"),
        F.coalesce("f_view_cents", F.lit(-1)).alias("f_view_cents"),
    ).orderBy("event_id")


QUERIES = {
    "ew1_ewma": q_ewma,
    "fs1_feature_snapshot": q_feature_snapshot,
    "at1_asof_join": q_asof,
    "at2_interval_join": q_interval_counts,
    "at3_time_weighted_avg": q_time_weighted_avg,
    "at4_ohlc_downsample": q_ohlc_downsample,
    "iv1_interval_coalesce": q_interval_coalesce,
    "sc1_scd2_history": q_scd2_history,
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
    "fs1_feature_snapshot": """
WITH lbl AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), ck0 AS (
  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id, ts
           ORDER BY CAST(round(value * 100) AS BIGINT) DESC) AS rn
  FROM events WHERE event_type = 'click' AND value IS NOT NULL
), vw0 AS (
  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id, ts
           ORDER BY CAST(round(value * 100) AS BIGINT) DESC) AS rn
  FROM events WHERE event_type = 'view' AND value IS NOT NULL
), j1 AS (
  SELECT l.event_id, l.user_id, l.ts,
         c.cents AS click_cents, c.ts AS click_ts
  FROM lbl l ASOF LEFT JOIN
       (SELECT user_id, ts, cents FROM ck0 WHERE rn = 1) c
    ON l.user_id = c.user_id AND c.ts <= l.ts
), j2 AS (
  SELECT j1.*, v.cents AS view_cents
  FROM j1 ASOF LEFT JOIN
       (SELECT user_id, ts, cents FROM vw0 WHERE rn = 1) v
    ON j1.user_id = v.user_id AND v.ts <= j1.ts
)
SELECT event_id, user_id,
       CASE WHEN click_cents IS NULL OR click_ts < ts - INTERVAL 7 DAY
            THEN -1 ELSE click_cents END AS f_click_cents,
       coalesce(view_cents, -1) AS f_view_cents
FROM j2 ORDER BY event_id
""",
    "iv1_interval_coalesce": """
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS start_us,
         epoch_us(ts) + ((event_id % 540) + 60) * 1000000 AS end_us
  FROM events
), flagged AS (
  SELECT user_id, start_us, end_us,
         CASE WHEN start_us > coalesce(max(end_us) OVER (
                PARTITION BY user_id ORDER BY start_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island,
         event_id
  FROM iv
), islands AS (
  SELECT user_id, start_us, end_us,
         CAST(sum(new_island) OVER (
           PARTITION BY user_id ORDER BY start_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
  FROM flagged
)
SELECT user_id, island, min(start_us) AS ivl_start_us,
       max(end_us) AS ivl_end_us, count(*) AS n_events
FROM islands GROUP BY user_id, island ORDER BY user_id, island
""",
    "sc1_scd2_history": f"""
WITH rows_ AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_id % 3 AS tier
  FROM events WHERE event_type = 'click'
), changes AS (
  SELECT * FROM (
    SELECT user_id, event_id, ts_us, tier,
           lag(tier) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
             AS prev_tier
    FROM rows_)
  WHERE prev_tier IS NULL OR tier <> prev_tier
)
SELECT user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
         AS version,
       tier, ts_us AS valid_from_us,
       coalesce(lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id),
                {FAR_FUTURE_US}) AS valid_to_us
FROM changes ORDER BY user_id, version
""",
}
