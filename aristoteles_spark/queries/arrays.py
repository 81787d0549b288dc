"""Array-column (vector) analytics via higher-order functions.

The embeddings table carries `array<float>` columns — the multimodal/
vector half of a training-data pipeline. These queries exercise Spark's
higher-order array functions (filter/size/array_max/array_position),
which run entirely in codegen on the JVM: no UDF, no shuffle beyond the
final sort, and the array never leaves the row.

Determinism note: every derived value is either an integer (counts,
1-based positions) or an exact float comparison (array_max returns one of
the stored float32 values verbatim) — no accumulation order in play, so
value-hash oracle checking is exact. Deliberately avoided: float
sums/norms, whose accumulation order differs across engines.

Beyond the reference inventory (the reference, aristoteles/aristoteles.py,
has no array types at all — SURVEY §1.2); part of the §7.4 extensions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aristoteles_spark.sources.parquet_source import load_table


def q_embedding_stats(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return (
        emb.select(
            "vec_id",
            F.size(e).alias("dim"),
            F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
            F.array_position(e, F.array_max(e)).cast("int").alias("argmax_idx"),
            F.array_max(e).alias("max_val"),
        )
        .orderBy("vec_id")
    )


# deterministic sparse sign-projection coefficients (Achlioptas-style
# {-1,0,+1}); the same literal lists are inlined into the duckdb oracle,
# so both engines multiply identical integers.
_PROJ_K = 4
_PROJ_DIM = 64
_PROJ_COEFFS = [
    [((i * 2654435761 + j * 40503 + 7) % 3) - 1 for i in range(_PROJ_DIM)]
    for j in range(_PROJ_K)
]


def _quantized(emb):
    """vec_id + symmetric int8 scalar quantization of the embedding:
    q_i = floor(127*x_i/max|x| + 0.5). Exact: per-element double math on
    identical float32 inputs, no accumulation anywhere, so every engine
    produces bit-identical integers. max|x|==0 degenerates to all zeros."""
    e = F.col("embedding")
    d = emb.select(
        "vec_id",
        "embedding",
        F.array_max(F.transform(e, lambda x: F.abs(x.cast("double")))).alias(
            "max_abs"
        ),
    )
    zero = F.col("max_abs") == 0.0
    qvec = F.when(
        zero, F.transform("embedding", lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            "embedding",
            lambda x: F.floor(
                F.lit(127.0) * x.cast("double") / F.col("max_abs") + F.lit(0.5)
            ).cast("int"),
        )
    )
    scale = F.when(zero, F.lit(0.0)).otherwise(F.lit(127.0) / F.col("max_abs"))
    return d.select("vec_id", scale.alias("scale"), qvec.alias("qvec"))


def q_vector_quantize(spark, sf_dir):
    """Per-vector symmetric int8 quantization (the storage/ANN-index
    compression step of an embedding pipeline). Row-local transform
    expressions only — zero shuffle at any scale; the 4x-smaller int8
    column is what a 100 TB embedding store would persist."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _quantized(emb).orderBy("vec_id")


def q_random_projection(spark, sf_dir):
    """Signed random projection (LSH sketch) over the quantized vectors:
    k integer dot products with fixed {-1,0,+1} coefficient vectors plus
    the derived sign-bucket id. Integer arithmetic end-to-end — exact and
    order-independent — and row-local (zero shuffle); the bucket id is
    what sim2-style ANN would shuffle on instead of the raw vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _quantized(emb)
    projs = [
        F.aggregate(
            F.zip_with(
                "qvec",
                F.array(*[F.lit(c) for c in _PROJ_COEFFS[j]]),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias(f"p{j}")
        for j in range(_PROJ_K)
    ]
    p = q.select("vec_id", *projs)
    bucket = sum(
        F.when(F.col(f"p{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(_PROJ_K)
    )
    return p.select(
        "vec_id", *[f"p{j}" for j in range(_PROJ_K)], bucket.cast("int").alias("bucket")
    ).orderBy("vec_id")


def _sql_list(xs):
    return "[" + ", ".join(str(x) for x in xs) + "]"


_QUANT_CTE = (
    "WITH m AS (SELECT vec_id, embedding, "
    "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS max_abs "
    "FROM embeddings), "
    "q AS (SELECT vec_id, "
    "CASE WHEN max_abs = 0 THEN 0.0 ELSE 127.0 / max_abs END AS scale, "
    "CASE WHEN max_abs = 0 THEN list_transform(embedding, x -> 0) "
    "ELSE list_transform(embedding, x -> "
    "CAST(floor(127.0 * CAST(x AS DOUBLE) / max_abs + 0.5) AS INT)) END AS qvec "
    "FROM m) "
)


_GRAM_DIM = 64
_GRAM_SCALE = 1_000_000.0  # fixed-point rule shared with operators/clustering.py


def q_gram_matrix(spark, sf_dir):
    """ar4 — distributed Gram matrix: the one-pass reduction behind
    big-data PCA / whitening / covariance analysis (G = X^T X fits any
    driver at 64x64; X does not at 100 TB). Reference scope check:
    /root/reference/aristoteles/aristoteles.py:229-346 has no vector
    types; SURVEY §7.4 extension.

    Plan (the 100 TB shape): one corpus scan through an Arrow-batched
    mapInPandas that emits each batch's PARTIAL upper-triangle X^T X
    (2080 tall rows per batch, computed by one numpy int64 matmul) —
    the only exchange is the final groupBy over <=2080 (i, j) keys,
    partial-aggregated map-side. Data rows never shuffle; per-batch
    output size is constant in the batch's row count.

    Determinism: coordinates are fixed-point quantized (floor(x*1e6));
    per-batch products |x_i*x_j| < 4e11 sum to < 4e15 per 10k-row Arrow
    batch (int64-safe), and the global sum is carried in DECIMAL(38,0)
    then emitted as BIGINT (exact at any test scale; production keeps
    the decimal). A pytest pins driver-side PCA (numpy eigh on the
    assembled matrix) against direct full-data PCA."""
    from aristoteles_spark.sources.parquet_source import fan_out

    d = fan_out(load_table(spark, sf_dir, "embeddings")).select(
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(_GRAM_SCALE)).cast("long"),
        ).alias("xq")
    )

    def partial_gram(it):
        import numpy as np
        import pandas as pd

        iu = np.triu_indices(_GRAM_DIM)
        for pdf in it:
            if not len(pdf):
                continue
            x = np.array(pdf["xq"].tolist(), dtype=np.int64)
            g = x.T @ x
            yield pd.DataFrame(
                {
                    "i": (iu[0] + 1).astype("int32"),
                    "j": (iu[1] + 1).astype("int32"),
                    "s": g[iu],
                }
            )

    return (
        d.mapInPandas(partial_gram, "i int, j int, s long")
        .groupBy("i", "j")
        .agg(F.sum(F.col("s").cast("decimal(38,0)")).cast("long").alias("gram_q"))
        .orderBy("i", "j")
    )


QUERIES = {
    "ar1_embedding_stats": q_embedding_stats,
    "ar2_vector_quantize": q_vector_quantize,
    "ar3_random_projection": q_random_projection,
    "ar4_gram_matrix": q_gram_matrix,
}

ORACLE = {
    "ar1_embedding_stats": (
        "SELECT vec_id, len(embedding) AS dim, "
        "len(list_filter(embedding, x -> x > 0)) AS n_pos, "
        "CAST(list_position(embedding, list_max(embedding)) AS INT) AS argmax_idx, "
        "list_max(embedding) AS max_val "
        "FROM embeddings ORDER BY vec_id"
    ),
    "ar2_vector_quantize": (
        # qvec serialized via to_json to match the registry's terminal
        # container cast (_stable_output_types) — driver-canonicalizable.
        _QUANT_CTE + "SELECT vec_id, scale, "
        "CAST(to_json(qvec) AS VARCHAR) AS qvec FROM q ORDER BY vec_id"
    ),
    "ar3_random_projection": (
        _QUANT_CTE
        + "SELECT vec_id, "
        + ", ".join(
            f"CAST(list_dot_product(qvec, {_sql_list(_PROJ_COEFFS[j])}) AS BIGINT)"
            f" AS p{j}"
            for j in range(_PROJ_K)
        )
        + ", CAST("
        + " + ".join(
            f"(CASE WHEN list_dot_product(qvec, {_sql_list(_PROJ_COEFFS[j])}) > 0"
            f" THEN {1 << j} ELSE 0 END)"
            for j in range(_PROJ_K)
        )
        + " AS INT) AS bucket FROM q ORDER BY vec_id"
    ),
    "ar4_gram_matrix": f"""
WITH vq AS (
  SELECT list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {_GRAM_SCALE!r}) AS BIGINT)) AS xq
  FROM embeddings
)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
       CAST(CAST(sum(xq[i] * xq[j]) AS DECIMAL(38,0)) AS BIGINT) AS gram_q
FROM vq, range(1, {_GRAM_DIM + 1}) ti(i), range(1, {_GRAM_DIM + 1}) tj(j)
WHERE j >= i
GROUP BY i, j ORDER BY i, j
""",
}
