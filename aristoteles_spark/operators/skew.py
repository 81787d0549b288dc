"""Skew-tolerant aggregation: explicit two-stage (salted) groupBy.

For algebraic aggregates (count/sum/min/max) Spark's map-side partial
aggregation already absorbs most key skew; explicit salting is the tool
for the cases it can't — e.g. collect-style or high-cardinality-state
aggregates where one hot key would pin a single reducer. The pattern:
group by (key, salt) first (spreads a hot key over S reducers), then
re-aggregate by key. Exact for any algebraic aggregate.

AQE's skew-join splitting covers the join side; this covers the
aggregation side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    salt_on: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """``big ⋈ small`` on ``key`` with explicit skew salting: the big
    side's rows scatter over ``salt_buckets`` sub-keys (derived
    deterministically from ``salt_on``, default spark_partition_id), and
    the small side is replicated once per sub-key, so a hot join key
    occupies S reducers instead of pinning one.

    This is the manual form of what AQE's skew-join split does at
    runtime — the explicit version is for when the skew is known ahead
    of time, the small side is too big to broadcast but cheap to
    replicate S times, or the engine's runtime split can't see the skew
    (e.g. a single monster key inside one shuffle block). Exact: the
    (key, salt) equi-join partitions the same matches, just spread out.
    """
    salt = (
        F.abs(salt_on if salt_on is not None else F.spark_partition_id())
        % salt_buckets
    )
    b = big.withColumn("_salt", salt.cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    value_exprs: dict[str, tuple[Column, Callable[[Column], Column]]],
    salt_buckets: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-stage aggregation of ``df`` by ``key``.

    ``value_exprs`` maps output name -> (stage1_agg, stage2_reagg) where
    stage2_reagg is a callable re-aggregating stage 1's partial column
    (count -> sum, sum -> sum, min -> min, ...). ``salt_on`` derives the
    salt deterministically from row content (defaults to
    spark_partition_id — fine for execution, but pass a content hash when
    the result feeds an order-sensitive consumer in tests).
    """
    salt = F.abs(salt_on if salt_on is not None else F.spark_partition_id()) % salt_buckets
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*[expr.alias(f"_s1_{name}") for name, (expr, _) in value_exprs.items()])
    )
    return stage1.groupBy(key).agg(
        *[
            reagg(F.col(f"_s1_{name}")).alias(name)
            for name, (_, reagg) in value_exprs.items()
        ]
    )
