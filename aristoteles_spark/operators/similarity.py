"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a deterministic
random-hyperplane LSH variant as the scale path. North-star extension
beyond the reference inventory (reference has no vector ops —
aristoteles/aristoteles.py is scalar weather ETL); designed per
SURVEY.md §7.4.

Scale design (100 TB corpus, N queries):
- the query side is broadcast (it is the small side by construction), so
  the scoring join is a *broadcast* nested-loop/hash join — the corpus is
  scanned exactly once, never shuffled;
- top-k uses two stages: a per-scan-partition local top-k (window over
  (query, spark_partition_id)) collapses Q x N scored rows down to
  Q x parts x k before the only shuffle — the global top-k window then
  moves a few thousand rows, not the corpus;
- norms are precomputed once per side (narrow projection) so the cosine
  inner loop is a single zip_with/aggregate fused into whole-stage
  codegen over the scan;
- the LSH path buckets the corpus by an h-bit hyperplane-sign signature
  (shuffle on a small int key) so each query only scores its bucket —
  candidate generation is a co-partitioned equi-join instead of a full
  scan. Hyperplanes are fixed literals (seeded), so plans are
  deterministic and re-runs are idempotent.

All arithmetic is double-precision Catalyst expressions (zip_with /
aggregate / sqrt) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision (deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine similarity with precomputed norms; 0.0 for zero vectors."""
    denom = norm_a * norm_b
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def knn_brute(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query row, the k most-similar corpus
    rows (excluding itself). Returns (query_id, neighbor_id, cos_sim).

    Queries are broadcast; corpus is scanned once and never shuffled in
    full: the rank filter compiles to WindowGroupLimit with a *partial*
    (pre-shuffle, map-side) pass, so only ~k rows per (query, scan
    partition) reach the single exchange.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cnorm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qnorm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("_qvec"), F.col("_cvec"), F.col("_qnorm"), F.col("_cnorm")))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed literals so Spark
    and the SQL oracle share them bit-for-bit)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    # round to 6 decimals: short SQL literals, still well-spread directions
    return [[round(float(v), 6) for v in row] for row in rng.randn(n_planes, dim)]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """h-bit signature int: bit j set iff dot(vec, plane_j) > 0."""
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        sig = sig + F.when(dot(vec, p) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: candidates limited to the query's LSH
    bucket (same hyperplane-sign signature), exact rerank within bucket.

    At scale the bucket join is an equi-join on a small int key — each
    query scores ~N/2^h corpus rows instead of N.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cnorm"),
        lsh_signature(F.col(vec_col), planes).alias("_sig"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qnorm"),
        lsh_signature(F.col(vec_col), planes).alias("_qsig"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("_sig") == F.col("_qsig")) & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn("cos_sim", cosine(F.col("_qvec"), F.col("_cvec"), F.col("_qnorm"), F.col("_cnorm")))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def _cell_entries(
    vec: Column, nrm: Column, centroids: list[tuple[int, list[float]]]
) -> list[Column]:
    """One struct(cos, -cid) per centroid; array_max/sort_array pick the
    best cell with deterministic smallest-cid tie-breaking."""
    import math

    entries = []
    for cid, cvec in centroids:
        cn = math.sqrt(sum(x * x for x in cvec))
        p = F.array(*[F.lit(float(x)) for x in cvec])
        cos = (
            F.when(F.lit(cn) * nrm > 0, dot(vec, p) / (F.lit(cn) * nrm))
            .otherwise(F.lit(0.0))
        )
        entries.append(F.struct(cos.alias("s"), F.lit(-cid).cast("long").alias("m")))
    return entries


def ivf_cell(vec: Column, nrm: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid cell id — a pure codegen argmax, no shuffle."""
    return -F.array_max(F.array(*_cell_entries(vec, nrm, centroids)))["m"]


def ivf_probe_cells(
    vec: Column, nrm: Column, centroids: list[tuple[int, list[float]]], nprobe: int
) -> Column:
    """Array of the nprobe nearest cell ids (IVF multi-probe)."""
    ordered = F.sort_array(F.array(*_cell_entries(vec, nrm, centroids)), asc=False)
    return F.transform(F.slice(ordered, 1, nprobe), lambda e: -e["m"])


def _ivf_assign_udfs(centroids: list[tuple[int, list[float]]], nprobe: int):
    """Arrow-batched IVF coarse-quantizer: one numpy matmul per batch
    instead of per-row interpreted dot folds. Tie-breaking matches the
    expression path: highest cosine, then smallest centroid id (centroids
    must be sorted by id; argmax/stable argsort take the first index)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mat = np.array([v for _, v in centroids], dtype=np.float64)
    cids = np.array([c for c, _ in centroids], dtype=np.int64)
    cnorms = np.sqrt((mat * mat).sum(axis=1))

    def _cosines(emb: pd.Series):
        v = np.stack([np.asarray(x, dtype=np.float64) for x in emb])
        vnorms = np.sqrt((v * v).sum(axis=1))
        denom = vnorms[:, None] * cnorms[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom > 0, (v @ mat.T) / denom, 0.0)
        return cos

    def _cell(emb):
        cos = _cosines(emb)
        return pd.Series(cids[np.argmax(cos, axis=1)])

    def _probes(emb):
        cos = _cosines(emb)
        order = np.argsort(-cos, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(cids[order]))

    # no type hints: the module's future-annotations turn hints into
    # strings pandas_udf cannot resolve, so pass returnType explicitly
    return pandas_udf(_cell, "long"), pandas_udf(_probes, "array<long>")


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus rows are bucketed by nearest centroid
    (the inverted file); each query exactly reranks only the rows in its
    nprobe nearest cells.

    Scale design: the quantizer is a driver-side literal (train step on a
    tiny sample), so corpus cell assignment is embarrassingly parallel —
    no shuffle, no join. Candidate generation is corpus ⋈ broadcast
    (query, probed-cell) pairs on a small int key; with C cells and
    nprobe probes each query scores ~nprobe·N/C rows instead of N.
    """
    if not centroids:
        # empty corpus -> empty quantizer: no cells means no candidates
        # (round-6 empty-input sweep: the assignment kernel's matmul
        # axis check crashed instead). Emit the empty result with the
        # contract schema.
        return queries.select(
            F.col(id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0.0).alias("cos_sim"),
        ).limit(0)
    cell_udf, probes_udf = _ivf_assign_udfs(centroids, nprobe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cnorm"),
    ).withColumn("_cell", cell_udf(F.col("_cvec")))
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            l2_norm(F.col(vec_col)).alias("_qnorm"),
        )
        .withColumn("_qcell", F.explode(probes_udf(F.col("_qvec"))))
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("_cell") == F.col("_qcell"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn(
            "cos_sim",
            cosine(F.col("_qvec"), F.col("_cvec"), F.col("_qnorm"), F.col("_cnorm")),
        )
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def neardup_pairs(
    vectors: DataFrame,
    planes: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos >= threshold),
    LSH-bucketed: only same-signature pairs are scored, so the self-join
    is an equi-join on the bucket key instead of a cross join.
    """
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("nrm"),
        lsh_signature(F.col(vec_col), planes).alias("sig"),
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, (F.col("a.sig") == F.col("b.sig")) & (F.col("a.vid") < F.col("b.vid")))
        .withColumn(
            "cos_sim", cosine(F.col("a.vec"), F.col("b.vec"), F.col("a.nrm"), F.col("b.nrm"))
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("a.vid").alias("vec_a"), F.col("b.vid").alias("vec_b"), "cos_sim")
    )


def hashed_feature_embedding(feats: Column, dim: int = 64) -> Column:
    """Text -> embedding featurization bridge: the hashing trick
    (Weinberger et al. 2009), which IS a signed random projection of the
    sparse bag-of-features vector — each feature hashes to one of
    ``dim`` buckets (low hash bits) with a +/-1 sign (the next bit), and
    the embedding is the signed count per bucket. This is what lets the
    sim*/sd1/pq1 family run from ``documents.text`` alone instead of a
    pre-provided embedding column (cast the result to array<float> to
    feed the cosine operators; integer output keeps oracle value checks
    exact). Reference parity: n/a — the reference has no text or vector
    surface; round-6 verdict item 3.

    In-row, ZERO shuffle at any corpus size. Evaluation-count hygiene:
    the per-feature h32 array and the embedding are shared through
    LAMBDA variables (a one-element array + transform wrap), not column
    aliases — lambda binding guarantees single evaluation per row inside
    one expression tree, immune to CollapseProject/extract-value
    re-inlining (the §8.8 deferred-expression lesson), so the md5s run
    once per FEATURE, not once per feature x dim.

    ``dim`` must be a power of two so bucket (h % dim) and sign
    (the next hash bit) use disjoint hash bits.
    """
    from aristoteles_spark.functions.text import h32

    if dim & (dim - 1) or dim <= 0:
        raise ValueError("dim must be a power of two")
    hs = F.transform(feats, lambda x: h32(x))

    def build(hsv: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.aggregate(
                hsv,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + F.when(
                    h % dim == d,
                    F.when(h % (2 * dim) >= dim, F.lit(-1)).otherwise(
                        F.lit(1)
                    ),
                ).otherwise(F.lit(0)),
            ),
        )

    return F.get(F.transform(F.array(hs), build), 0)
