"""Distributed k-means (Lloyd's algorithm) over embedding columns.

Beyond the reference inventory (the reference,
aristoteles/aristoteles.py:229-346, is scalar weather ETL with no vector
types); part of the SURVEY §7.4 LLM-pipeline extensions. Clustering is
the primitive behind semantic dedup (SemDeDup), IVF index training
(sim4's coarse quantizer) and corpus domain discovery — at 100 TB it has
to run as a sequence of full-corpus *map* passes, not a driver-side fit.

Scale design (the 100 TB shape):
- **Assignment is a zero-shuffle map.** The k centroids are collapsed to
  ONE row (`collect_list` into an array of structs) and attached to the
  corpus by a broadcast nested-loop join; the nearest-centroid argmin is
  computed IN-ROW by `array_min` over a `transform` of the centroid
  array (lexicographic struct min = deterministic (dist, cid)
  tie-break). The corpus is scanned once per iteration and never
  shuffled.
- **The update exchanges k x dim keys, not rows.** Assigned vectors
  posexplode to (cid, dim, coord) and hit a partial (map-side combined)
  sum/count aggregate: the only exchange per iteration carries
  ~k*dim*shuffle_partitions partial rows. Centroid arrays are rebuilt
  with sort-by-dim collect_list on k rows.
- No driver collect anywhere: centroids stay a (tiny) DataFrame between
  iterations, so the same plan works when k*dim is thousands of rows.

Determinism (the px1/mx1 fixed-point rule): coordinates are quantized
once to integers (floor(x * SCALE)) and every downstream op — squared-L2
fold, argmin, mean-with-floor, inertia — is integer arithmetic, which is
bit-identical in any engine. Cross-engine float traps (double->decimal
cast rounding, accumulation order, libm) never arise by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: 1e-6 coordinate resolution. Bounds (for int64
#: safety, dim=64): |x| < 1e4 -> |xq| < 1e10... in practice embeddings
#: are O(1), |xq| ~ 1e6, per-dim square ~ 1e13, 64-dim sum ~ 1e15 —
#: three orders below int64; per-cluster inertia sums go through
#: DECIMAL(38,0) so they cannot overflow at any corpus size.
SCALE = 1_000_000.0


def quantize(vec: Column) -> Column:
    """array<float> -> array<long> fixed-point coordinates.

    floor(double * SCALE) is one correctly-rounded IEEE multiply plus an
    exact floor — deterministic in Spark and duckdb (Spark's bare
    double->long cast truncates toward zero while duckdb rounds, so the
    explicit floor is load-bearing for cross-engine parity)."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * F.lit(SCALE)).cast("long"))


def dist2q(a: Column, b: Column) -> Column:
    """Exact integer squared L2 distance between two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, p: acc + p,
    )


def assign(vq: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, xq) x (cid, cq) -> one row
    per vector with its argmin cluster and integer distance.

    `cents` is collapsed to a single array-of-structs row and broadcast,
    so the whole assignment is per-row codegen on the corpus scan — no
    shuffle, no groupBy. Ties break to the smallest cid (struct min)."""
    packed = F.broadcast(
        cents.select(F.struct("cid", "cq").alias("c"))
        .groupBy()
        .agg(F.array_sort(F.collect_list("c")).alias("cents"))
    )
    best = F.array_min(
        F.transform(F.col("cents"), lambda c: F.struct(dist2q(F.col("xq"), c["cq"]).alias("d2q"), c["cid"].alias("cid")))
    )
    return (
        vq.join(packed)  # 1-row broadcast: BroadcastNestedLoopJoin
        .withColumn("best", best)
        .select("vec_id", "xq", F.col("best.cid").alias("cid"), F.col("best.d2q").alias("d2q"))
    )


def update(assigned: DataFrame) -> DataFrame:
    """Centroid update: integer mean (floor) per (cluster, dimension).

    The explode produces (cid, dim) keys — k*dim of them — so the
    partial aggregate collapses map-side and the exchange is tiny.
    `dim` is 1-based to match SQL's 1-indexed lists. The mean is
    floor(sum / n) computed through one double division: sums stay well
    under 2^53 (|xq| ~ 1e7 needs > 1e8 members per cluster to approach
    the exact-double bound; a production run at that size would switch
    the sum to DECIMAL as inertia already does)."""
    tall = assigned.select("cid", F.posexplode("xq").alias("pos", "xqv"))
    return tall.groupBy("cid", "pos").agg(
        F.floor(F.sum("xqv").cast("double") / F.count(F.lit(1))).cast("long").alias("cq"),
    ).select("cid", (F.col("pos") + 1).alias("dim"), "cq")


def pack_centroids(tall: DataFrame) -> DataFrame:
    """(cid, dim, cq) tall frame -> (cid, cq: array<long>) rows."""
    return tall.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cq"))), lambda s: s["cq"]
        ).alias("cq")
    )
