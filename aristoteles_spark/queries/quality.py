"""Model-based document quality scoring (fastText-style linear classifier).

The standard web-corpus curation step (CCNet/RefinedWeb/FineWeb all gate
on a linear text classifier): score every document with a bag-of-hashed-
n-gram linear model and keep/route by the score. The reference has no
text surface at all (scope check: /root/reference/aristoteles/
aristoteles.py:229-346 — scalar weather ETL); SURVEY §7.4 extension.

The model here is a deterministic stand-in for shipped weights — bucket
b's weight is a fixed integer mix ((b * KNUTH) % M - M//2) — because the
point under test is the *serving plumbing*: hashing unigram+bigram
features into a fixed bucket space and folding broadcast-free integer
weights per row. Swapping real trained weights in changes one lambda
(weights become a broadcast array indexed by bucket).

Scale design: the whole query is per-row codegen over the corpus scan —
tokenize, bigram expansion (in-row transform over indexes, no explode),
per-feature md5 bucket hash, integer weight fold. ZERO shuffles before
the final order-by; at 100 TB this runs at scan speed with no state.

Determinism: every derived value is integer arithmetic on the md5-based
h32 hash (identical in duckdb by construction, functions/text.py:42);
the one float op (quality_ppm = floor(score * 1e6 / n_feats)) is a
single exact double conversion + one correctly-rounded division + exact
floor — bit-identical cross-engine (the mx1 rule: explicit floor,
because Spark's bare double->long cast truncates while duckdb rounds).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aristoteles_spark.functions.text import h32, tokens
from aristoteles_spark.sources.parquet_source import fan_out, load_table

N_BUCKETS = 4096
KNUTH = 2654435761  # Knuth's multiplicative-hash constant
WMOD = 2003  # prime weight-table size; weights span [-1001, +1001]
WOFF = 1001


def _weight(bucket):
    # parenthesization mirrored exactly in the SQL oracle
    return ((bucket % N_BUCKETS) * KNUTH) % WMOD - WOFF


def classifier_features(toks):
    """unigram + bigram feature bag over a token-array column; bigrams
    keep duplicates (term frequency weighs the score, as in fastText's
    feature bag); 0-based F.get over an index sequence — in-row."""
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat(F.get(toks, i), F.lit("_"), F.get(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def classifier_score(toks):
    """Integer classifier score of a token-array column (in-row fold);
    reused by rl1's release pipeline as its quality gate."""
    return F.aggregate(
        F.transform(classifier_features(toks), lambda x: _weight(h32(x))),
        F.lit(0).cast("long"),
        lambda acc, p: acc + p,
    )


def q_quality_classifier(spark, sf_dir):
    d = fan_out(load_table(spark, sf_dir, "documents"))
    base = d.select("doc_id", tokens("text").alias("toks"))
    feats = classifier_features(F.col("toks"))
    scored = base.select(
        "doc_id",
        F.size(feats).alias("n_feats"),
        classifier_score(F.col("toks")).alias("score_q"),
    )
    return scored.select(
        "doc_id",
        "n_feats",
        "score_q",
        F.when(F.col("n_feats") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(F.col("score_q") * F.lit(1.0e6) / F.col("n_feats")).cast("long")
        )
        .alias("quality_ppm"),
        (F.col("score_q") > 0).cast("int").alias("label"),
    ).orderBy("doc_id")


_H32 = "CAST(concat('0x', substr(md5(concat('0', ':', x)), 1, 8)) AS BIGINT)"


def score_sql(toks_expr: str) -> str:
    """SQL mirror of classifier_score over a token-list expression."""
    feats = (
        f"list_concat({toks_expr}, CASE WHEN len({toks_expr}) >= 2 "
        f"THEN list_transform(range(1, len({toks_expr})), "
        f"i -> {toks_expr}[i] || '_' || {toks_expr}[i + 1]) ELSE [] END)"
    )
    return (
        f"COALESCE(CAST(list_sum(list_transform({feats}, "
        f"x -> (({_H32} % {N_BUCKETS}) * {KNUTH}) % {WMOD} - {WOFF}"
        f")) AS BIGINT), 0)"
    )

QUERIES = {"qc1_quality_classifier": q_quality_classifier}

ORACLE = {
    "qc1_quality_classifier": f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
), f AS (
  SELECT doc_id,
         list_concat(
           toks,
           CASE WHEN len(toks) >= 2
                THEN list_transform(range(1, len(toks)),
                                    i -> toks[i] || '_' || toks[i + 1])
                ELSE [] END) AS feats
  FROM t
), s AS (
  SELECT doc_id, len(feats) AS n_feats,
         COALESCE(CAST(list_sum(list_transform(feats,
             x -> (({_H32} % {N_BUCKETS}) * {KNUTH}) % {WMOD} - {WOFF}
         )) AS BIGINT), 0) AS score_q
  FROM f
)
SELECT doc_id, n_feats, score_q,
       CASE WHEN n_feats = 0 THEN 0
            ELSE CAST(floor(score_q * 1.0e6 / n_feats) AS BIGINT) END AS quality_ppm,
       CASE WHEN score_q > 0 THEN 1 ELSE 0 END AS label
FROM s ORDER BY doc_id
""",
}
