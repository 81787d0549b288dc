"""Dataset-versioning queries: snapshot diff (CDC-style) and content
manifests + duckdb oracles.

The dataset-management layer of a training pipeline: detect what
changed between two corpus snapshots (for incremental re-processing)
and fingerprint partitions cheaply (for sync/skip decisions). The
"v2" snapshot is derived deterministically from the base corpus so
both engines construct the identical pair of tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aristoteles_spark.sources.parquet_source import fan_out, load_table

# deterministic v2 derivation (same arithmetic in the oracle SQL):
# - doc_id % 17 == 3   -> deleted in v2
# - doc_id % 13 == 2   -> text updated in v2 (suffix edit)
# - others             -> unchanged
_DEL_MOD, _DEL_OFF = 17, 3
_UPD_MOD, _UPD_OFF = 13, 2


def _snapshots(spark, sf_dir):
    base = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text"
    )
    v2 = base.filter(F.col("doc_id") % _DEL_MOD != _DEL_OFF).select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % _UPD_MOD == _UPD_OFF,
            F.concat(F.col("text"), F.lit(" [rev2]")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return base, v2


def q_snapshot_diff(spark, sf_dir):
    """CDC-style snapshot diff: full outer join of two corpus versions
    on the key, content compared by digest — emits per-(source, status)
    row counts and key ranges. One shuffle per side on doc_id (the join
    key); digests computed in the scan projection, so only (key, 32-byte
    digest, source) shuffles — never document text. At 100 TB both
    sides would be bucketed by doc_id to make this join exchange-free
    (sinks/bucketed.py pattern)."""
    base, v2 = _snapshots(spark, sf_dir)
    a = base.select(
        "doc_id", F.col("source").alias("src_a"), F.md5("text").alias("dig_a")
    )
    b = v2.select(
        "doc_id", F.col("source").alias("src_b"), F.md5("text").alias("dig_b")
    )
    j = a.join(b, "doc_id", "full_outer")
    status = (
        F.when(F.col("dig_a").isNull(), "inserted")
        .when(F.col("dig_b").isNull(), "deleted")
        .when(F.col("dig_a") != F.col("dig_b"), "updated")
        .otherwise("unchanged")
    )
    return (
        j.select(
            F.coalesce("src_a", "src_b").alias("source"),
            status.alias("status"),
            "doc_id",
        )
        .groupBy("source", "status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source", "status")
    )


def q_content_manifest(spark, sf_dir):
    """Partition content fingerprints: per source, row count plus an
    ORDER-INDEPENDENT content checksum (sum of per-row 32-bit content
    hashes — commutative, so partial aggregation and any row order give
    the same value; the manifest comparison that lets an incremental
    sync skip unchanged partitions without reading data twice). One
    partial-agg shuffle of (source, tiny ints); text never shuffles."""
    from aristoteles_spark.functions.text import h32

    d = fan_out(load_table(spark, sf_dir, "documents"))
    row_hash = h32(
        F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.md5("text"))
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(row_hash).cast("long").alias("content_sum"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )
        .orderBy("source")
    )


def q_apply_changelog(spark, sf_dir):
    """CDC changelog apply (changelog -> current snapshot): the events
    stream is read as an ordered change feed keyed by user_id — op is
    'D' (delete) when ``event_id % 10 == 0`` else 'U' (upsert with the
    event's value, cents-encoded; NULL payload -> -1 sentinel) — and the
    snapshot is the LAST operation per key, deletes dropped. Last-write-
    wins via one ``max_by(struct(payload), struct(ts, event_id))``
    aggregate (planned as a partial+final SortAggregate — the struct
    ordering key rules out a mutable hash buffer, but map-side partials
    still run): no per-key window over the full history, no self-join,
    ONE shuffle of one tiny struct per key. This is the MERGE-free way
    to materialize a Debezium/binlog-style feed at 100 TB: the fact
    payload never shuffles more than once and skewed keys still
    partial-aggregate."""
    e = load_table(spark, sf_dir, "events")
    ch = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_id") % 10 == 0, "D").otherwise("U").alias("op"),
        F.when(F.col("value").isNull(), F.lit(-1))
        .otherwise(F.round(F.col("value") * 100).cast("long"))
        .alias("cents"),
    )
    okey = F.struct("ts", "event_id")
    snap = ch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.max_by("op", okey).alias("last_op"),
        F.max_by("cents", okey).alias("last_cents"),
    )
    return (
        snap.filter(F.col("last_op") == "U")
        .select("user_id", "n_changes", "last_cents")
        .orderBy("user_id")
    )


QUERIES = {
    "cd1_snapshot_diff": q_snapshot_diff,
    "cd2_content_manifest": q_content_manifest,
    "cd3_apply_changelog": q_apply_changelog,
}

_H32 = (
    "CAST(concat('0x', substr(md5(concat('0:', "
    "concat(CAST(doc_id AS VARCHAR), '|', md5(text)))), 1, 8)) AS BIGINT)"
)

ORACLE = {
    "cd1_snapshot_diff": f"""
WITH base AS (
  SELECT doc_id, source, text FROM documents
), v2 AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % {_UPD_MOD} = {_UPD_OFF}
              THEN text || ' [rev2]' ELSE text END AS text
  FROM documents WHERE doc_id % {_DEL_MOD} <> {_DEL_OFF}
), j AS (
  SELECT coalesce(a.source, b.source) AS source,
         coalesce(a.doc_id, b.doc_id) AS doc_id,
         CASE WHEN a.doc_id IS NULL THEN 'inserted'
              WHEN b.doc_id IS NULL THEN 'deleted'
              WHEN md5(a.text) <> md5(b.text) THEN 'updated'
              ELSE 'unchanged' END AS status
  FROM base a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
)
SELECT source, status, count(*) AS n,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM j GROUP BY source, status ORDER BY source, status
""",
    "cd2_content_manifest": f"""
SELECT source, count(*) AS n_rows,
       CAST(sum({_H32}) AS BIGINT) AS content_sum,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY source ORDER BY source
""",
    "cd3_apply_changelog": """
WITH ch AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op,
         CASE WHEN value IS NULL THEN -1
              ELSE CAST(round(value * 100) AS BIGINT) END AS cents
  FROM events
), ranked AS (
  SELECT user_id, op, cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_changes
  FROM ch
)
SELECT user_id, CAST(n_changes AS BIGINT) AS n_changes,
       cents AS last_cents
FROM ranked WHERE rn = 1 AND op = 'U' ORDER BY user_id
""",
}
