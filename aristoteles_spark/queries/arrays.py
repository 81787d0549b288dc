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


QUERIES = {
    "ar1_embedding_stats": q_embedding_stats,
}

ORACLE = {
    "ar1_embedding_stats": (
        "SELECT vec_id, len(embedding) AS dim, "
        "len(list_filter(embedding, x -> x > 0)) AS n_pos, "
        "CAST(list_position(embedding, list_max(embedding)) AS INT) AS argmax_idx, "
        "list_max(embedding) AS max_val "
        "FROM embeddings ORDER BY vec_id"
    ),
}
