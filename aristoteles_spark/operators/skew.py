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
