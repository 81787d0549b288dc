"""Temporal join operators Spark lacks as built-ins: as-of join and
interval (range) join. North-star extensions (the reference joins nothing
— SURVEY.md §2.3); both are staples of time-series engines.

Scale design:
- **as-of join** avoids the naive range-join explosion entirely: tag the
  two inputs, UNION them, and carry the most recent right-side row
  forward with ``last(..., ignorenulls=True)`` over a running window per
  key. One shuffle on the key (same as any keyed window), zero
  candidate-pair blowup, works at any skew of left:right density.
- **interval join** without an equi-key uses time *binning*: each probe
  row is exploded to the (few) bins its window overlaps, the build side
  is assigned its single bin, and the range predicate runs only within
  bin-matched pairs — an equi-join shuffle on the bin instead of a
  cross join. Bin width should be >= the window radius so each probe
  hits <= 3 bins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aristoteles_spark.functions.time import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: dict[str, str] | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with the same key
    and right_ts <= left_ts (inclusive). Null-filled when none exists.

    ``right_cols`` maps right column -> output alias. The right side is
    deduplicated to one row per (key, ts) — latest wins by the first
    column of ``right_cols`` — so results are deterministic under ties.
    """
    right_cols = right_cols or {right_ts: "asof_ts"}
    aliases = list(right_cols.values())

    # right payload columns are aliased up-front so they can never clash
    # with left columns; one right row per (key, ts) — latest wins by the
    # payload columns (desc) for determinism under ties
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        *[F.col(src).alias(dst) for src, dst in right_cols.items()],
    )
    wdedup = Window.partitionBy(on, "_t").orderBy(*[F.col(a).desc() for a in aliases])
    r = r.withColumn("_rn", F.row_number().over(wdedup)).filter(F.col("_rn") == 1).drop("_rn")

    l_tagged = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(0))
    for a in aliases:
        l_tagged = l_tagged.withColumn(a, F.lit(None))
    r_tagged = r.withColumn("_side", F.lit(1))
    for c in set(l_tagged.columns) - set(r_tagged.columns):
        r_tagged = r_tagged.withColumn(c, F.lit(None))
    cols = l_tagged.columns
    unioned = l_tagged.select(cols).unionByName(r_tagged.select(cols))

    # right rows (_side=1) sort BEFORE left rows (_side=0) at equal ts
    # => inclusive <= semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t"), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for a in aliases:
        out = out.withColumn(
            a, F.last(F.when(F.col("_side") == 1, F.col(a)), ignorenulls=True).over(w)
        )
    out = out.withColumn(
        "_asof_t",
        F.last(F.when(F.col("_side") == 1, F.col("_t")), ignorenulls=True).over(w),
    )
    if tolerance is not None:
        keep = F.col("_asof_t") >= F.col("_t").cast("timestamp") - tolerance
        for a in aliases:
            out = out.withColumn(a, F.when(keep, F.col(a)))
    return out.filter(F.col("_side") == 0).drop("_t", "_side", "_asof_t")


def interval_join_binned(
    probe: DataFrame,
    build: DataFrame,
    probe_ts: str,
    build_ts: str,
    radius_sec: int,
    bin_sec: int | None = None,
) -> DataFrame:
    """All (probe, build) pairs with |build_ts - probe_ts| <= radius_sec,
    via time-binned equi-join (no cross join). Returns probe.* + build.*
    prefixed '_b_'.
    """
    bin_sec = bin_sec or max(radius_sec, 1)
    # integer microsecond arithmetic throughout: exact, no float rounding
    # at bin edges
    radius_us = radius_sec * 1_000_000
    bin_us = bin_sec * 1_000_000
    p_us = epoch_us(probe, probe_ts)
    b_us = epoch_us(build, build_ts)

    p = probe.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor((p_us - radius_us) / bin_us).cast("long"),
                F.floor((p_us + radius_us) / bin_us).cast("long"),
            )
        ),
    )
    b = build.select(
        *[F.col(c).alias(f"_b_{c}") for c in build.columns],
        b_us.alias("_b_us"),
        F.floor(b_us / bin_us).cast("long").alias("_bin"),
    )
    joined = p.join(b, "_bin").filter(F.abs(F.col("_b_us") - p_us) <= radius_us)
    return joined.drop("_bin", "_b_us")
