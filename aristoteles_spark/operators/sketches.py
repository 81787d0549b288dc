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


def kmv_distinct_per_group(
    df: DataFrame, group_col: str, hash_col, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct estimate: one row per group
    (group, k_used, kth_min_hash, est_distinct).

    The group-wise generalization of :func:`kmv_distinct_estimate`
    (sk1's global orderBy+limit cannot be used per key): the k smallest
    hashes per group are taken with a rank window, which Spark executes
    as WindowGroupLimit — each partition ships at most k rows PER GROUP
    into the exchange, so a group with a billion distinct values costs
    the same shuffle volume as one with a thousand. This is the
    "distinct users per segment" / "vocabulary size per source" shape
    at 100 TB: sketch per key, never count-distinct per key.
    """
    from pyspark.sql import Window

    hashes = df.select(group_col, hash_col.alias("h")).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    topk = hashes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return (
        topk.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("k_used"), F.max("h").alias("kth_min_hash"))
        .select(
            group_col,
            "k_used",
            "kth_min_hash",
            F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
            .otherwise(F.lit(k - 1) * F.lit(H32_RANGE) / F.col("kth_min_hash"))
            .alias("est_distinct"),
        )
    )


def countmin_estimates(
    df: DataFrame,
    col: str,
    items: DataFrame,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch frequency estimates for ``items`` over the
    stream ``df[col]``.

    The sketch is a depth×width counter grid: every value increments
    one bucket per row, bucket = h32(value, seed=row) mod width; the
    estimate for an item is the MIN of its depth counters — an
    OVERESTIMATE by construction (collisions only add), within εN
    (ε = e/width) with probability 1 − e^−depth. Built over the
    portable md5-derived h32, the grid — and therefore every estimate —
    is bit-deterministic and reproducible in any engine, the property
    the oracle gate needs (same design point as KMV above).

    Scale: the explode is ×depth (a constant), the grid aggregation is
    a map-side-combined groupBy onto depth×width cells (tiny, skew-
    free: heavy hitters are exactly what the partial agg absorbs), and
    the probe side joins the broadcast grid — the stream is scanned
    once and never shuffled by value. ``items`` carries the queried
    values (must be distinct).

    Returns (item, cms_n) — the estimate only; callers join exact
    counts alongside when they want the error visible.
    """
    val = F.col(col).cast("string")
    cells = (
        df.filter(F.col(col).isNotNull())
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            (h32(val, s) % width).alias("b"),
                        )
                        for s in range(depth)
                    ]
                )
            ).alias("sb")
        )
        .groupBy(F.col("sb.s").alias("s"), F.col("sb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ival = F.col("item").cast("string")
    probes = items.select(F.col(items.columns[0]).alias("item")).select(
        "item",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        (h32(ival, s) % width).alias("b"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("sb"),
    )
    return (
        probes.join(
            F.broadcast(cells),
            (F.col("sb.s") == F.col("s")) & (F.col("sb.b") == F.col("b")),
            "left",
        )
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_n"))
    )


def kmv_set_overlap(
    df_a: DataFrame, df_b: DataFrame, col: str, k: int = 64
) -> DataFrame:
    """KMV set-operation estimates between two value sets — the
    dataset-overlap primitive (train/eval contamination, audience
    overlap) at sketch cost.

    Each side keeps its k minimum h32 hashes; the union sketch is the k
    minima of the merged sketches (a valid KMV of A∪B — the classic
    mergeability property), |A∪B| follows the KMV formula, the Jaccard
    estimate is the fraction of union-sketch hashes present in BOTH
    side sketches, and |A∩B| = J * |A∪B|. Deterministic over the
    portable hash, so every output value is oracle-checkable
    bit-for-bit; when a side has fewer than k distinct values its
    estimate degrades to the exact count.

    Scale: per-side distinct + TakeOrdered top-k (partition-local heaps,
    no global sort); everything after operates on <= k rows.

    Returns one row: (est_a, est_b, est_union, n_both, est_jaccard,
    est_intersection).
    """

    def sketch(df: DataFrame) -> DataFrame:
        return (
            df.select(h32(F.col(col).cast("string")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(k)
        )

    def estimate(sk: DataFrame, est_name: str) -> DataFrame:
        return sk.agg(
            F.count("*").alias("used"), F.max("h").alias("kth")
        ).select(
            F.when(F.col("used") < k, F.col("used").cast("double"))
            .otherwise(F.lit(float(k - 1)) * F.lit(H32_RANGE) / F.col("kth"))
            .alias(est_name),
            F.col("used").alias(f"{est_name}_used"),
        )

    ka = sketch(df_a).persist()
    kb = sketch(df_b).persist()
    ku = ka.union(kb).distinct().orderBy("h").limit(k).persist()
    n_both = (
        ku.join(ka, "h", "left_semi")
        .join(kb, "h", "left_semi")
        .agg(F.count("*").alias("n_both"))
    )
    est_a = estimate(ka, "est_a").select("est_a")
    est_b = estimate(kb, "est_b").select("est_b")
    est_u = estimate(ku, "est_union")
    out = (
        est_u.crossJoin(est_a)
        .crossJoin(est_b)
        .crossJoin(n_both)
        .select(
            "est_a",
            "est_b",
            "est_union",
            "n_both",
            # guard: two EMPTY sides make the union sketch empty and the
            # Jaccard denominator 0 (ANSI divide-by-zero; round-6
            # empty-input sweep) — overlap of nothing is 0 by definition
            F.when(
                F.col("est_union_used") > 0,
                F.col("n_both").cast("double")
                / F.col("est_union_used").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("est_jaccard"),
            F.when(
                F.col("est_union_used") > 0,
                F.col("n_both").cast("double")
                / F.col("est_union_used").cast("double")
                * F.col("est_union"),
            )
            .otherwise(F.lit(0.0))
            .alias("est_intersection"),
        )
    )
    from aristoteles_spark.operators.barrier import audit_barrier

    # one-row result; release the sketch caches (flag-aware: plan audit
    # keeps the strategy plan visible)
    return audit_barrier(out, ka, kb, ku)


# ---------------------------------------------------------------- HLL
# HyperLogLog (Flajolet et al. 2007) with p=8 (256 registers) over the
# portable h32 hash. Register math is INTEGER end-to-end: rank = 25 -
# bitlength(w) (exact, via the engine's bin() string — no log2), and the
# harmonic denominator is kept scaled by 2^25 as an exact BIGINT sum, so
# every engine produces the identical sketch. The estimate is then ONE
# double division by a precomputed literal numerator. The standard
# small-range linear-counting correction needs ln() — banned by the
# transcendental-free rule (px1) — so the query emits the zero-register
# count alongside the raw estimate and leaves the monotone correction to
# the consumer.
HLL_P = 8
HLL_M = 1 << HLL_P
HLL_W_BITS = 32 - HLL_P            # 24-bit suffix
HLL_RMAX = HLL_W_BITS + 1          # rank range [1, 25]; empty register = 0
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
#: single-literal numerator: alpha_m * m^2 * 2^25 (the 2^25 cancels the
#: scaled denominator); computed once here, inlined in BOTH engines
HLL_C = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RMAX)


def hll_distinct_estimate(df: DataFrame, col: str) -> DataFrame:
    """One-row (m_used, n_zero_registers, s_scaled, est_distinct) HLL
    distinct-count sketch of ``col``.

    Scale: one corpus scan; the only exchange carries at most m=256
    (idx, max-rank) partial rows per task (map-side combined max)."""
    h = h32(F.col(col).cast("string"))
    regs = (
        df.select(
            F.shiftright(h, HLL_W_BITS).alias("idx"),
            h.bitwiseAND((1 << HLL_W_BITS) - 1).alias("w"),
        )
        .select(
            "idx",
            F.when(F.col("w") == 0, F.lit(HLL_RMAX))
            .otherwise(F.lit(HLL_RMAX) - F.length(F.bin(F.col("w"))))
            .cast("int")
            .alias("r"),
        )
        .groupBy("idx")
        .agg(F.max("r").alias("rmax"))
    )
    agg = regs.agg(
        F.count("*").alias("m_used"),
        F.sum(
            F.expr(
                f"CAST(shiftleft(CAST(1 AS BIGINT), {HLL_RMAX} - rmax) AS BIGINT)"
            )
        ).alias("s_used"),
    )
    return agg.select(
        "m_used",
        (F.lit(HLL_M) - F.col("m_used")).cast("long").alias("n_zero_registers"),
        (
            F.col("s_used")
            + (F.lit(HLL_M) - F.col("m_used")) * F.lit(1 << HLL_RMAX)
        ).cast("long").alias("s_scaled"),
        (
            F.lit(HLL_C)
            / (
                F.col("s_used")
                + (F.lit(HLL_M) - F.col("m_used")) * F.lit(1 << HLL_RMAX)
            )
        ).alias("est_distinct"),
    )
