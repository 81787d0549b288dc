"""Distributed sketch operators with deterministic, oracle-checkable
math.

KMV (k-minimum-values) distinct-count estimation: hash every value with
the portable md5-derived h32 (functions/text.py), keep the k smallest
hashes, estimate D ~= (k-1) * RANGE / h_(k). Unlike HLL
(approx_count_distinct), KMV over a fixed hash is bit-deterministic, so
the same estimate is reproducible in any engine — the property the
oracle gate needs.

Scale: the k smallest hashes are found with a sort-limit, which Spark
executes as TakeOrderedAndProject — per-partition top-k heaps merged on
the driver, no global sort, no full shuffle. The scan aggregates
distinct hashes map-side first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aristoteles_spark.functions.text import h32

H32_RANGE = float(1 << 32)


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame (k, kth_min_hash, est_distinct) estimating the
    number of distinct values of ``col``."""
    hashes = df.select(h32(F.col(col).cast("string")).alias("h")).distinct()
    topk = hashes.orderBy("h").limit(k)
    return topk.agg(
        F.count("*").alias("k_used"),
        F.max("h").alias("kth_min_hash"),
    ).select(
        "k_used",
        "kth_min_hash",
        F.when(
            F.col("k_used") < k,  # fewer distinct values than k: count is exact
            F.col("k_used").cast("double"),
        )
        .otherwise((F.lit(k - 1)) * F.lit(H32_RANGE) / F.col("kth_min_hash"))
        .alias("est_distinct"),
    )
