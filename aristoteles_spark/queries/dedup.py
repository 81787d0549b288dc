"""Dedup queries on the documents table + duckdb oracle transliterations.

The oracle SQL mirrors the Spark operators value-for-value: same md5-based
h32 hash, same tokenization regex, same band layout — so MinHash/SimHash
results (normally engine-specific) hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aristoteles_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    normalized_dedup_groups,
    simhash_sketches,
)
from aristoteles_spark.sources.parquet_source import load_table

# ------------------------------------------------------ shared SQL fragments

_TOKENS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_DTOKENS = f"list_distinct({_TOKENS})"


def _h32(expr: str, seed: str = "0") -> str:
    return f"CAST(concat('0x', substr(md5(concat('{seed}:', {expr})), 1, 8)) AS BIGINT)"


NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS


# ----------------------------------------------------------------- queries


def q_exact(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(d).orderBy("digest")


def q_normalized(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return normalized_dedup_groups(d).orderBy("digest")


def q_jaccard(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, threshold=0.8).orderBy("doc_a", "doc_b")


def q_minhash(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, num_hashes=NUM_HASHES, bands=BANDS, threshold=0.5).orderBy(
        "doc_a", "doc_b"
    )


def q_simhash(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return simhash_sketches(d).orderBy("doc")


QUERIES = {
    "dd1_exact_groups": q_exact,
    "dd2_normalized_groups": q_normalized,
    "dd3_jaccard_pairs": q_jaccard,
    "dd4_minhash_lsh_pairs": q_minhash,
    "dd5_simhash_sketches": q_simhash,
}

# ------------------------------------------------------------------ oracles

_sig_cols = ",\n    ".join(
    f"list_min(list_transform({_DTOKENS}, t -> {_h32('t', str(i))})) AS s{i}"
    for i in range(NUM_HASHES)
)
_band_cols = ",\n    ".join(
    "md5(concat_ws(',', "
    + ", ".join(f"s{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
    + f")) AS b{b}"
    for b in range(BANDS)
)
_band_match = " OR ".join(f"a.b{b} = b.b{b}" for b in range(BANDS))
_est_sim = (
    "("
    + " + ".join(f"CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES))
    + f") / {float(NUM_HASHES)}"
)

ORACLE = {
    "dd1_exact_groups": (
        "SELECT md5(text) AS digest, count(*) AS n_docs, min(doc_id) AS keep_id "
        "FROM documents GROUP BY digest ORDER BY digest"
    ),
    "dd2_normalized_groups": (
        f"SELECT md5(array_to_string({_TOKENS}, ' ')) AS digest, "
        "count(*) AS n_docs, min(doc_id) AS keep_id "
        "FROM documents GROUP BY digest ORDER BY digest"
    ),
    "dd3_jaccard_pairs": f"""
WITH toks AS (
  SELECT doc_id AS doc, unnest({_DTOKENS}) AS token FROM documents
), sizes AS (
  SELECT doc, count(*) AS sz FROM toks GROUP BY doc
), inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS i
  FROM toks a JOIN toks b ON a.token = b.token AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, i / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
FROM inter JOIN sizes sa ON inter.doc_a = sa.doc JOIN sizes sb ON inter.doc_b = sb.doc
WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.8
ORDER BY doc_a, doc_b
""",
    "dd4_minhash_lsh_pairs": f"""
WITH sigs AS (
  SELECT doc_id AS doc,
    {_sig_cols}
  FROM documents
), banded AS (
  SELECT *,
    {_band_cols}
  FROM sigs
)
SELECT a.doc AS doc_a, b.doc AS doc_b, {_est_sim} AS est_sim
FROM banded a JOIN banded b ON a.doc < b.doc AND ({_band_match})
WHERE {_est_sim} >= 0.5
ORDER BY doc_a, doc_b
""",
    "dd5_simhash_sketches": f"""
WITH th AS (
  SELECT doc_id AS doc, {_h32('token')} AS h
  FROM (SELECT doc_id, unnest({_DTOKENS}) AS token FROM documents)
), bits AS (
  SELECT doc, j, SUM(((h >> j) & 1) * 2 - 1) AS s
  FROM th CROSS JOIN (SELECT unnest(range(32)) AS j) js
  GROUP BY doc, j
)
SELECT doc, SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS simhash
FROM bits GROUP BY doc ORDER BY doc
""",
}
