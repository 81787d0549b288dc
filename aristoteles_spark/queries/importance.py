"""Data-selection-by-importance-resampling (DSIR-style) corpus filtering.

ds1 implements the hashed n-gram importance-weighting scheme of DSIR
(Xie et al. 2023, arXiv:2302.03169): score every document by how much
more likely its (hashed) token features are under a *target*
distribution than under the *raw* corpus distribution, then keep the
documents that look more target-like than baseline. This is the
standard "make CommonCrawl look like Wikipedia" selection stage of an
LLM data pipeline. The reference has no text surface at all (scope
check: /root/reference/aristoteles/aristoteles.py:229-346 — scalar
weather ETL); SURVEY §7.4 extension.

Differences from the paper, chosen for engine-exactness (the px1/mx1
fixed-point rule):
- the per-bucket log-ratio log(p_tgt/p_raw) is replaced by the
  integer-quantized probability *ratio* in parts-per-million:
  score_b = floor((t_b+1)(R+B) * 1e6 / ((r_b+1)(T+B))) with add-one
  smoothing — monotone in the same direction, and exact: the numerator
  and denominator are exact int64, the one double multiply+divide is
  identically rounded in Spark and duckdb, and floor pins the result;
- a document's weight is the integer SUM of its tokens' bucket scores
  (order-independent), normalized per token by one floored division;
- selection is "normalized weight > 1e6" (more target-like than the
  corpus average) — a data-independent threshold, so no global sort or
  single-partition window is ever needed.

Scale shape (the 100 TB plan):
1. one explode+partial-agg pass over the token stream collapses
   map-side to B=512 bucket keys — the only exchange carries
   O(B * shuffle_partitions) partial rows;
2. the B-row score table is folded to a single array row and broadcast
   (1-row BroadcastNestedLoopJoin, the pack_centroids pattern), so
   per-document scoring is an IN-ROW codegen fold — zero explode, zero
   per-document shuffle, no Python;
3. the final per-source census is another tiny partial aggregate.
At the paper's production scale the bucket counts (int64) would be the
only state that grows, and B is a constant of the model.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aristoteles_spark.functions.text import h32, tokens
from aristoteles_spark.sources.parquet_source import fan_out, load_table

N_BUCKETS = 512
PPM = 1.0e6


def q_dsir_select(spark, sf_dir):
    d = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "lang", tokens("text").alias("toks")
    )
    tok = d.select("lang", F.explode("toks").alias("t"))
    counts = tok.select(
        (h32(F.col("t")) % N_BUCKETS).alias("b"), "lang"
    ).groupBy("b").agg(
        F.count(F.lit(1)).alias("raw_c"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("tgt_c"),
    )
    tot = counts.agg(
        F.sum("raw_c").cast("long").alias("R"), F.sum("tgt_c").cast("long").alias("T")
    )
    dense = (
        spark.range(N_BUCKETS)
        .select(F.col("id").alias("b"))
        .join(counts, "b", "left")
        .select(
            "b",
            F.coalesce("raw_c", F.lit(0)).cast("long").alias("raw_c"),
            F.coalesce("tgt_c", F.lit(0)).cast("long").alias("tgt_c"),
        )
    )
    scores = dense.join(F.broadcast(tot)).select(
        "b",
        F.floor(
            ((F.col("tgt_c") + 1) * (F.col("R") + N_BUCKETS)).cast("double")
            * F.lit(PPM)
            / ((F.col("raw_c") + 1) * (F.col("T") + N_BUCKETS)).cast("double")
        )
        .cast("long")
        .alias("score"),
    )
    arr = F.broadcast(
        scores.select(F.struct("b", "score").alias("s"))
        .groupBy()
        .agg(F.transform(F.array_sort(F.collect_list("s")), lambda s: s["score"]).alias("a"))
    )
    wdoc = (
        d.filter(F.size("toks") > 0)
        .join(arr)  # 1-row broadcast
        .select(
            "doc_id",
            "source",
            F.size("toks").alias("n_tok"),
            F.aggregate(
                F.transform(
                    F.col("toks"),
                    lambda t: F.element_at(
                        F.col("a"), ((h32(t) % N_BUCKETS) + 1).cast("int")
                    ),
                ),
                F.lit(0).cast("long"),
                lambda acc, s: acc + s,
            ).alias("w"),
        )
        .select(
            "source",
            F.floor(F.col("w") / F.col("n_tok")).cast("long").alias("wn"),
        )
    )
    return (
        wdoc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # sum over ALL docs: the checksum that keeps every document's
            # weight load-bearing even where the selection tail is empty
            # (at sf0.001 no doc clears 1e6; the driver gate runs sf0.01)
            F.sum("wn").cast("long").alias("sum_wn"),
            F.sum(F.when(F.col("wn") > 1_000_000, 1).otherwise(0))
            .cast("long")
            .alias("n_selected"),
            F.sum(F.when(F.col("wn") > 1_000_000, F.col("wn")).otherwise(0))
            .cast("long")
            .alias("sum_wn_selected"),
        )
        .orderBy("source")
    )


_H32_T = "CAST(concat('0x', substr(md5(concat('0', ':', t)), 1, 8)) AS BIGINT)"

QUERIES = {"ds1_dsir_select": q_dsir_select}

ORACLE = {
    "ds1_dsir_select": f"""
WITH d AS (
  SELECT doc_id, source, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
), tok AS (
  SELECT lang, unnest(toks) AS t FROM d
), bt AS (
  SELECT {_H32_T} % {N_BUCKETS} AS b, lang FROM tok
), counts AS (
  SELECT b, CAST(count(*) AS BIGINT) AS raw_c,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tgt_c
  FROM bt GROUP BY b
), tot AS (
  SELECT CAST(sum(raw_c) AS BIGINT) AS R, CAST(sum(tgt_c) AS BIGINT) AS T
  FROM counts
), dense AS (
  SELECT i.b, COALESCE(c.raw_c, 0) AS raw_c, COALESCE(c.tgt_c, 0) AS tgt_c
  FROM (SELECT CAST(range AS BIGINT) AS b FROM range(0, {N_BUCKETS})) i
  LEFT JOIN counts c USING (b)
), scores AS (
  SELECT b,
         CAST(floor(CAST((tgt_c + 1) * (R + {N_BUCKETS}) AS DOUBLE) * 1e6
                    / CAST((raw_c + 1) * (T + {N_BUCKETS}) AS DOUBLE)) AS BIGINT) AS score
  FROM dense, tot
), arr AS (
  SELECT list(score ORDER BY b) AS a FROM scores
), wdoc AS (
  SELECT source,
         CAST(floor(CAST(list_sum(list_transform(toks,
                t -> a[CAST({_H32_T} % {N_BUCKETS} AS INT) + 1])) AS BIGINT)
              / len(toks)) AS BIGINT) AS wn
  FROM d, arr WHERE len(toks) > 0
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(wn) AS BIGINT) AS sum_wn,
       CAST(sum(CASE WHEN wn > 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       CAST(sum(CASE WHEN wn > 1000000 THEN wn ELSE 0 END) AS BIGINT) AS sum_wn_selected
FROM wdoc GROUP BY source ORDER BY source
""",
}
