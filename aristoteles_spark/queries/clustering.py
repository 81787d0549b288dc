"""Distributed k-means queries over the embeddings table + duckdb oracles.

km1/km2 run genuine Lloyd iterations *inside the engine* — unlike sim4's
IVF coarse quantizer (which trains on a collected tiny sample), the
centroid state here never touches the driver: assignment is a broadcast
in-row argmin and the update is a (k x dim)-key partial aggregate. This
is the clustering primitive a 100 TB corpus needs for semantic dedup /
domain discovery / IVF training (reference scope check:
/root/reference/aristoteles/aristoteles.py:229-346 — scalar weather ETL,
no vector ops; SURVEY §7.4 extension).

Determinism: all arithmetic after the one quantization step
(floor(x * 1e6) -> int64) is integer — squared-L2 folds, lexicographic
argmin, floor-mean, decimal inertia sums — so Spark and duckdb agree
bit-for-bit with no float-accumulation or cast-rounding caveats. (The
double->DECIMAL(38,18) route was measured to differ between the engines
in the last ~2 digits — per-term cast rounding — which is why the
fixed-point formulation is load-bearing, not a style choice.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aristoteles_spark.operators.clustering import (
    SCALE,
    assign,
    pack_centroids,
    quantize,
    update,
)
from aristoteles_spark.sources.parquet_source import fan_out, load_table

DIM = 64
# deterministic k-means++-free init: every ~101st vector among the
# first SEED_CAP ids is a seed centroid (5 at sf0.01, 20 from sf0.1 up)
# — same literal predicate in both engines. The id cap is load-bearing
# for scale: without it k grows WITH the corpus and the O(n*k)
# assignment turns quadratic (the 10x sweep measured pq1 at 69x before
# the cap; k must be a constant of the ALGORITHM, not the data size).
CENT_MOD = 101
CENT_OFF = 3
SEED_CAP = 2000


def _vq(spark, sf_dir):
    # fan_out: the per-row argmin fold is compute-bound (k * dim integer
    # ops per vector); single-row-group scans would pin it to one core
    v = fan_out(load_table(spark, sf_dir, "embeddings"))
    return v.select("vec_id", quantize(F.col("embedding")).alias("xq"))


def _init_cents(vq):
    return vq.filter(
        (F.col("vec_id") % CENT_MOD == CENT_OFF) & (F.col("vec_id") < SEED_CAP)
    ).select(F.col("vec_id").alias("cid"), F.col("xq").alias("cq"))


def q_kmeans_centroids(spark, sf_dir):
    """One full Lloyd iteration; returns the updated centroid table
    (cluster_id, dim, centroid_q) tall, dim 1-based.

    Plan: corpus scan -> in-row argmin (broadcast centroid array, zero
    shuffle) -> posexplode to (cid, dim) -> partial-agg floor-mean. The
    single exchange carries k*64 keys' partial sums."""
    vq = _vq(spark, sf_dir)
    a1 = assign(vq, _init_cents(vq))
    return (
        update(a1)
        .select(F.col("cid").alias("cluster_id"), "dim", F.col("cq").alias("centroid_q"))
        .orderBy("cluster_id", "dim")
    )


def q_kmeans_lloyd(spark, sf_dir):
    """Two Lloyd iterations, then the per-cluster census
    (cluster_id, n_members, inertia_q): the convergence-tracking readout
    (inertia = exact integer sum of quantized squared distances, carried
    through DECIMAL(38,0) so it cannot overflow at any corpus size).

    Plan: two zero-shuffle assignment passes over the corpus, one tiny
    (k x dim) update exchange between them, one k-key final aggregate."""
    vq = _vq(spark, sf_dir)
    a1 = assign(vq, _init_cents(vq))
    c1 = pack_centroids(update(a1))
    a2 = assign(vq, c1)
    return (
        a2.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.col("d2q").cast("decimal(38,0)")).alias("inertia_q"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------- SemDeDup

# sd1 parameters: tau = 0.35 cosine (the corpus has no planted
# near-identical pairs — max pairwise cosine is ~0.51 — so the gate uses
# the same loose threshold the sim3 near-dup census does to stay
# non-vacuous); tau^2 * 1e4 = 1225 keeps the comparison integer-exact.
SEM_T2_E4 = 1225
SEM_W = 4  # sorted-neighborhood window width


def _dotq(a, b):
    """Exact integer dot product of two quantized vectors (in-row fold).

    |xq| <= ~6e5 for these unit-ish embeddings, so per-term products are
    < 4e11 and the 64-term sum < 3e13 — far inside int64."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, p: acc + p,
    )


def q_semdedup(spark, sf_dir):
    """sd1 — SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-
    space semantic dedup. Cluster the corpus with k-means, then inside
    each cluster drop every vector whose cosine to an earlier-kept
    member exceeds tau. The reference has no vector surface (scope
    check: /root/reference/aristoteles/aristoteles.py:229-346); SURVEY
    §7.4 extension.

    The paper's within-cluster step is all-pairs (O(m^2) per cluster,
    with k chosen so m stays bounded). Here the comparison set is made
    *linear by construction* with the sorted-neighborhood method: rank
    cluster members by (distance-to-centroid, id) and compare each
    member only to its SEM_W predecessors in that order. True
    near-duplicates have near-equal centroid distances, so they land on
    adjacent ranks; candidate pairs are exactly n*SEM_W regardless of
    cluster size — the skew-proof form of the paper's step.

    Plan: zero-shuffle broadcast argmin assignment (operators/
    clustering.assign) -> ONE exchange on cid; the W predecessors are
    fetched as lag(struct(xq, nrm), j) columns of the SAME rank window
    — no self-join, no second corpus pass (the first formulation
    equi-joined the ranked frame to itself: that join flipped
    broadcast->SortMergeJoin with input size in the 10x sweep, and
    re-shuffled the corpus; the lag form is exchange-stable by
    construction) -> in-row integer cosine gate -> one per-cluster
    census aggregate (n_members and n_dropped from the same groupBy).

    Determinism: the duplicate test is pure integer arithmetic on the
    quantized coordinates — drop x iff dot(x,y) > 0 and
    (100*dot)^2 >= 1225 * |x|^2 * |y|^2 (i.e. cos >= 0.35), evaluated
    in DECIMAL(38,0) (~4e35 max term; HUGEINT on the duckdb side) — so
    no sqrt, no division, no float comparison anywhere."""
    from pyspark.sql import Window

    vq = _vq(spark, sf_dir)
    a = assign(vq, _init_cents(vq))  # (vec_id, xq, cid, d2q)
    w = Window.partitionBy("cid").orderBy("d2q", "vec_id")
    r = a.withColumn("nrm", _dotq(F.col("xq"), F.col("xq"))).select(
        "cid",
        "xq",
        "nrm",
        *[
            F.lag(F.struct("xq", "nrm"), j).over(w).alias(f"y{j}")
            for j in range(1, SEM_W + 1)
        ],
    )

    def _dup_vs(yj):
        d100 = (_dotq(F.col("xq"), yj["xq"]) * 100).cast("decimal(38,0)")
        return (
            yj.isNotNull()
            & (d100 > 0)
            & (
                d100 * d100
                >= F.lit(SEM_T2_E4).cast("decimal(38,0)")
                * F.col("nrm").cast("decimal(38,0)")
                * yj["nrm"].cast("decimal(38,0)")
            )
        )

    dup = None
    for j in range(1, SEM_W + 1):
        c = _dup_vs(F.col(f"y{j}"))
        dup = c if dup is None else (dup | c)
    return (
        r.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(dup.cast("long")).cast("long").alias("n_dropped"),
            F.sum((~dup).cast("long")).cast("long").alias("n_kept"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------- oracles

_PREFIX = f"""
WITH vq AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {SCALE!r}) AS BIGINT)) AS xq
  FROM embeddings
), c0 AS (
  SELECT vec_id AS cid, xq AS cq FROM vq WHERE vec_id % {CENT_MOD} = {CENT_OFF} AND vec_id < {SEED_CAP}
), s1 AS (
  SELECT v.vec_id, v.xq, c.cid,
         CAST(list_sum(list_transform(range(1, {DIM + 1}),
              i -> (v.xq[i] - c.cq[i]) * (v.xq[i] - c.cq[i]))) AS BIGINT) AS d2q
  FROM vq v CROSS JOIN c0 c
), a1 AS (
  SELECT vec_id, xq, cid, d2q FROM s1
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2q, cid) = 1
), u1 AS (
  SELECT cid, i AS dim,
         CAST(floor(CAST(sum(xq[i]) AS DOUBLE) / count(*)) AS BIGINT) AS cq
  FROM a1, range(1, {DIM + 1}) t(i)
  GROUP BY cid, i
)"""

# ---------------------------------------------------------------- PQ

N_SUB = 4
SUB_DIM = DIM // N_SUB  # 16 dims per subspace


def q_product_quantize(spark, sf_dir):
    """pq1 — product quantization: split each embedding into 4
    subvectors, train a per-subspace codebook with one Lloyd iteration,
    encode every vector as 4 codeword ids + its exact quantization
    error. The compression step behind IVF-PQ ANN indexes (what a 100 TB
    vector corpus actually stores: 4 small ints instead of 64 floats).

    Plan: codebook training is 4 subspace-sliced Lloyd passes (each =
    zero-shuffle assign + (k x 16)-key update); the 4 trained codebooks
    union into ONE ~20-row broadcast; encoding is a single corpus scan
    with 4 in-row argmins — no shuffle. (A production run would train on
    a sample rather than the full corpus; the plan shape is unchanged.)

    Determinism: same fixed-point integer arithmetic as km1/km2."""
    from functools import reduce

    # vq appears five times in one plan (4 subspace trainings + the
    # encode); materialize the quantized vectors once — at corpus scale
    # the int-array table is exactly what a PQ index build stores
    from aristoteles_spark.operators.barrier import audit_barrier

    vq = audit_barrier(_vq(spark, sf_dir))
    cbs = []
    for s in range(N_SUB):
        sub = vq.select(
            "vec_id", F.slice("xq", s * SUB_DIM + 1, SUB_DIM).alias("xq")
        )
        cb = pack_centroids(update(assign(sub, _init_cents(sub))))
        cbs.append(cb.withColumn("sub", F.lit(s)))
    allcb = reduce(lambda a, b: a.unionByName(b), cbs)
    packed = F.broadcast(
        allcb.select(F.struct("sub", "cid", "cq").alias("c"))
        .groupBy()
        .agg(F.array_sort(F.collect_list("c")).alias("cbs"))
    )

    def best_for(s):
        from aristoteles_spark.operators.clustering import dist2q

        sub_xq = F.slice("xq", s * SUB_DIM + 1, SUB_DIM)
        entries = F.filter("cbs", lambda b: b["sub"] == F.lit(s))
        return F.array_min(
            F.transform(
                entries,
                lambda b: F.struct(
                    dist2q(sub_xq, b["cq"]).alias("d2q"), b["cid"].alias("cid")
                ),
            )
        )

    enc = vq.crossJoin(packed)
    bests = [best_for(s) for s in range(N_SUB)]
    err = bests[0]["d2q"]
    for b in bests[1:]:
        err = err + b["d2q"]
    return enc.select(
        "vec_id",
        *[b["cid"].alias(f"code{s}") for s, b in enumerate(bests)],
        err.alias("err_q"),
    ).orderBy("vec_id")


def _pq_sub_ctes(s: int) -> str:
    """One subspace's train+encode CTE chain (mirrors km's oracle with
    the subvector slice as the vector)."""
    off = s * SUB_DIM
    d2 = (
        f"CAST(list_sum(list_transform(range(1, {SUB_DIM + 1}),"
        f" i -> (v.xq[i] - c.cq[i]) * (v.xq[i] - c.cq[i]))) AS BIGINT)"
    )
    return f"""sub{s} AS (
  SELECT vec_id, list_transform(range(1, {SUB_DIM + 1}), i -> xq[i + {off}]) AS xq
  FROM vq
), c0_{s} AS (
  SELECT vec_id AS cid, xq AS cq FROM sub{s} WHERE vec_id % {CENT_MOD} = {CENT_OFF} AND vec_id < {SEED_CAP}
), s1_{s} AS (
  SELECT v.vec_id, v.xq, c.cid, {d2} AS d2q
  FROM sub{s} v CROSS JOIN c0_{s} c
), a1_{s} AS (
  SELECT vec_id, xq, cid FROM s1_{s}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2q, cid) = 1
), u1_{s} AS (
  SELECT cid, i AS dim,
         CAST(floor(CAST(sum(xq[i]) AS DOUBLE) / count(*)) AS BIGINT) AS cq
  FROM a1_{s}, range(1, {SUB_DIM + 1}) t(i)
  GROUP BY cid, i
), c1_{s} AS (
  SELECT cid, list(cq ORDER BY dim) AS cq FROM u1_{s} GROUP BY cid
), s2_{s} AS (
  SELECT v.vec_id, c.cid, {d2} AS d2q
  FROM sub{s} v CROSS JOIN c1_{s} c
), a2_{s} AS (
  SELECT vec_id, cid AS code{s}, d2q AS e{s} FROM s2_{s}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2q, cid) = 1
)"""


def _pq_oracle_sql() -> str:
    ctes = ",\n".join(_pq_sub_ctes(s) for s in range(N_SUB))
    joins = " ".join(f"JOIN a2_{s} USING (vec_id)" for s in range(1, N_SUB))
    codes = ", ".join(f"code{s}" for s in range(N_SUB))
    err = " + ".join(f"e{s}" for s in range(N_SUB))
    return f"""
WITH vq AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {SCALE!r}) AS BIGINT)) AS xq
  FROM embeddings
),
{ctes}
SELECT vec_id, {codes}, CAST({err} AS BIGINT) AS err_q
FROM a2_0 {joins}
ORDER BY vec_id
"""


QUERIES = {
    "km1_kmeans_centroids": q_kmeans_centroids,
    "km2_kmeans_lloyd": q_kmeans_lloyd,
    "pq1_product_quantize": q_product_quantize,
    "sd1_semdedup": q_semdedup,
}

_SD1_DOT = (
    f"CAST(list_sum(list_transform(range(1, {DIM + 1}),"
    f" i -> x.xq[i] * y.xq[i])) AS BIGINT)"
)

ORACLE = {
    "sd1_semdedup": _PREFIX
    + f"""
, r AS (
  SELECT vec_id, xq, cid, d2q,
         CAST(list_sum(list_transform(range(1, {DIM + 1}),
              i -> xq[i] * xq[i])) AS BIGINT) AS nrm,
         row_number() OVER (PARTITION BY cid ORDER BY d2q, vec_id) AS rnk
  FROM a1
), pr AS (
  SELECT x.cid, x.vec_id AS vid_x,
         CAST(100 AS HUGEINT) * {_SD1_DOT} AS d100,
         x.nrm AS nx, y.nrm AS ny
  FROM r x JOIN r y
    ON x.cid = y.cid AND y.rnk BETWEEN x.rnk - {SEM_W} AND x.rnk - 1
), dropped AS (
  SELECT cid, count(DISTINCT vid_x) AS n_dropped
  FROM pr
  WHERE d100 > 0
    AND d100 * d100 >= CAST({SEM_T2_E4} AS HUGEINT) * CAST(nx AS HUGEINT) * CAST(ny AS HUGEINT)
  GROUP BY cid
), members AS (
  SELECT cid, count(*) AS n_members FROM a1 GROUP BY cid
)
SELECT m.cid AS cluster_id, m.n_members,
       CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(m.n_members - COALESCE(d.n_dropped, 0) AS BIGINT) AS n_kept
FROM members m LEFT JOIN dropped d USING (cid)
ORDER BY cluster_id
""",
    "pq1_product_quantize": _pq_oracle_sql(),
    "km1_kmeans_centroids": _PREFIX
    + """
SELECT cid AS cluster_id, dim, cq AS centroid_q
FROM u1 ORDER BY cluster_id, dim
""",
    "km2_kmeans_lloyd": _PREFIX
    + f"""
, c1 AS (
  SELECT cid, list(cq ORDER BY dim) AS cq FROM u1 GROUP BY cid
), s2 AS (
  SELECT v.vec_id, c.cid,
         CAST(list_sum(list_transform(range(1, {DIM + 1}),
              i -> (v.xq[i] - c.cq[i]) * (v.xq[i] - c.cq[i]))) AS BIGINT) AS d2q
  FROM vq v CROSS JOIN c1 c
), a2 AS (
  SELECT vec_id, cid, d2q FROM s2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2q, cid) = 1
)
SELECT cid AS cluster_id, count(*) AS n_members,
       CAST(CAST(sum(d2q) AS DECIMAL(38,0)) AS DOUBLE) AS inertia_q
FROM a2 GROUP BY cid ORDER BY cluster_id
""",
}
