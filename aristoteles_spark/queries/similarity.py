"""Similarity-search queries on the embeddings table + duckdb oracles.

The LSH hyperplanes are fixed literals shared between the Spark plan and
the oracle SQL, so the approximate variants are value-exact reproducible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aristoteles_spark.operators.similarity import (
    hyperplanes,
    knn_brute,
    knn_lsh,
    neardup_pairs,
)
from aristoteles_spark.sources.parquet_source import load_table

DIM = 64
N_PLANES = 6
K = 5
QUERY_MOD = 50  # query set = vec_id % 50 == 0 (10 queries at sf0.01)
NEARDUP_T = 0.35

PLANES = hyperplanes(DIM, N_PLANES)


def _load(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def q_knn_brute(spark, sf_dir):
    v = _load(spark, sf_dir)
    q = v.filter(F.col("vec_id") % QUERY_MOD == 0)
    return knn_brute(v, q, k=K).orderBy("query_id", "neighbor_id")


def q_knn_lsh(spark, sf_dir):
    v = _load(spark, sf_dir)
    q = v.filter(F.col("vec_id") % QUERY_MOD == 0)
    return knn_lsh(v, q, PLANES, k=K).orderBy("query_id", "neighbor_id")


def q_neardup(spark, sf_dir):
    v = _load(spark, sf_dir)
    return neardup_pairs(v, PLANES, threshold=NEARDUP_T).orderBy("vec_a", "vec_b")


QUERIES = {
    "sim1_knn_brute": q_knn_brute,
    "sim2_knn_lsh": q_knn_lsh,
    "sim3_neardup_pairs": q_neardup,
}

# ------------------------------------------------------------------ oracles

_DOT = "list_dot_product({a}, {b})"


def _plane_sql(plane: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[]"


_SIG = "(" + " + ".join(
    f"CASE WHEN {_DOT.format(a='{e}', b=_plane_sql(p))} > 0 THEN {1 << j} ELSE 0 END"
    for j, p in enumerate(PLANES)
) + ")"

_COS = (
    "CASE WHEN nq * nc > 0 THEN "
    + _DOT.format(a="q.e", b="c.e")
    + " / (nq * nc) ELSE 0.0 END"
)

_V = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings"

ORACLE = {
    "sim1_knn_brute": f"""
WITH v AS ({_V}),
q AS (SELECT vec_id, e, nrm FROM v WHERE vec_id % {QUERY_MOD} = 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.nrm AS nq, c.nrm AS nc,
         q.e AS e, c.e AS ce
  FROM q JOIN v c ON c.vec_id <> q.vec_id
), sims AS (
  SELECT query_id, neighbor_id,
    CASE WHEN nq * nc > 0 THEN list_dot_product(e, ce) / (nq * nc) ELSE 0.0 END AS cos_sim
  FROM scored
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM sims
)
SELECT query_id, neighbor_id, cos_sim FROM ranked WHERE rn <= {K}
ORDER BY query_id, neighbor_id
""",
    "sim2_knn_lsh": f"""
WITH v AS (
  SELECT vec_id, e, nrm, {_SIG.format(e='e')} AS sig FROM ({_V})
),
q AS (SELECT vec_id, e, nrm, sig FROM v WHERE vec_id % {QUERY_MOD} = 0),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    CASE WHEN q.nrm * c.nrm > 0
         THEN list_dot_product(q.e, c.e) / (q.nrm * c.nrm) ELSE 0.0 END AS cos_sim
  FROM q JOIN v c ON c.sig = q.sig AND c.vec_id <> q.vec_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM sims
)
SELECT query_id, neighbor_id, cos_sim FROM ranked WHERE rn <= {K}
ORDER BY query_id, neighbor_id
""",
    "sim3_neardup_pairs": f"""
WITH v AS (
  SELECT vec_id, e, nrm, {_SIG.format(e='e')} AS sig FROM ({_V})
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  CASE WHEN a.nrm * b.nrm > 0
       THEN list_dot_product(a.e, b.e) / (a.nrm * b.nrm) ELSE 0.0 END AS cos_sim
FROM v a JOIN v b ON a.sig = b.sig AND a.vec_id < b.vec_id
WHERE CASE WHEN a.nrm * b.nrm > 0
       THEN list_dot_product(a.e, b.e) / (a.nrm * b.nrm) ELSE 0.0 END >= {NEARDUP_T}
ORDER BY vec_a, vec_b
""",
}
