"""Declared query inventory: each module exports QUERIES (name ->
callable(spark, sf_dir) -> DataFrame) and ORACLE (name -> duckdb SQL).

Every SURVEY.md §2 operator has an entry here; __spark_entry__.py merges
the dicts for the driver's correctness gate.

Determinism rules (so Spark and duckdb value-hashes agree exactly):
- double SUMs go through DECIMAL casts (order-independent, exact);
- AVGs are computed as CAST(decimal_sum AS DOUBLE) / count — a single
  deterministic double division, no engine-rounding in play;
- every computed column is aliased identically on both sides;
- any LIMIT is preceded by a total ORDER BY on a unique key.
"""

from __future__ import annotations

from importlib import import_module

_MODULES = [
    "dedup",
    "similarity",
    "text",
    "multimodal",
    "streaming",
    "temporal",
    "analytics",
    "arrays",
    "windows",
    "relational",
    "tpch_shapes",
    "io_formats",
]

# Declaration order matters: the driver's correctness gate checks the
# FIRST ~50 entries of queries() each round. Round 1 burned the whole
# window on the (now-proven) relational/TPC-H block, leaving the
# LLM-pipeline inventory driver-unverified, and 16 decimal-output
# queries hash-failed on canonicalization (fixed this round by terminal
# DOUBLE casts — they need a driver RE-check to flip green). The window
# budget is therefore split: the 16 re-typed queries first, then 34
# never-driver-checked LLM-pipeline queries (dedup / similarity / text /
# streaming / temporal — the north-star families). Everything else
# (already driver-green in round 1, or queued for the round-3 window)
# follows in module order.
_PRIORITY = [
    # round-1 red rows, re-typed — must re-enter the check window
    "j1_join_agg", "g1_pricing_summary", "j5_multi_join_topk",
    "j6_star_join", "j9_large_orders", "h6_forecast_revenue",
    "h7_nation_volume", "h8_market_share", "h9_profit",
    "h10_returned_items", "h11_important_parts", "h12_late_shipments",
    "h15_top_supplier", "h19_disjunctive", "wf3_running_sum",
    "wb1_tumbling_hour",
    # never-driver-checked LLM-pipeline families (34 slots)
    "dd1_exact_groups", "dd2_normalized_groups", "dd3_jaccard_pairs",
    "dd4_minhash_lsh_pairs", "dd5_simhash_sketches", "dd6_simhash_pairs",
    "dd7_dup_clusters", "dd8_repetition_scrub",
    "dd9_cluster_representatives", "fz1_fuzzy_name_match",
    "sim1_knn_brute", "sim2_knn_lsh", "sim3_neardup_pairs",
    "sim4_knn_ivf", "sim5_semantic_clusters",
    "tx1_token_stats", "tx2_quality", "tx3_langid", "tx4_fingerprint",
    "tx5_regex_features", "tx6_tfidf_top_terms", "tx7_bpe_token_count",
    "ct1_contamination", "pk1_sequence_packing", "cp1_curation_pipeline",
    "st1_stream_hourly", "st2_stream_user_totals", "st3_stream_dedup",
    "st4_stream_stream_join", "st5_stream_sessions",
    "st6_stream_sink_parquet", "st7_stream_static_join",
    "at1_asof_join", "at2_interval_join",
]


def _stable_output_types(fn):
    """Terminal cast of any DECIMAL output column to DOUBLE.

    Internal accumulation stays decimal (order-independent, exact); only
    the final schema changes. Round 1 showed the driver canonicalizes
    the oracle side through a float path (pandas: DECIMAL -> float64),
    so a Spark DECIMAL output ("1400362.00") hash-mismatches a
    numerically identical oracle value ("1400362.0"). Every oracle SQL
    correspondingly wraps its decimal outputs in CAST(... AS DOUBLE),
    making both sides bit-identical float64. The cast is applied here,
    at the registry, so no individual query can forget it.
    """

    def wrapped(spark, sf_dir):
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = fn(spark, sf_dir)
        if any(isinstance(f.dataType, T.DecimalType) for f in df.schema.fields):
            df = df.select(
                *[
                    F.col(f.name).cast("double").alias(f.name)
                    if isinstance(f.dataType, T.DecimalType)
                    else F.col(f.name)
                    for f in df.schema.fields
                ]
            )
        return df

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def _ordered(d: dict) -> dict:
    out = {n: d[n] for n in _PRIORITY if n in d}
    out.update((n, v) for n, v in d.items() if n not in out)
    return out


def all_queries() -> dict:
    out = {}
    for m in _MODULES:
        try:
            mod = import_module(f"aristoteles_spark.queries.{m}")
        except ModuleNotFoundError:
            continue
        for name, fn in mod.QUERIES.items():
            out[name] = _stable_output_types(fn)
    return _ordered(out)


def all_oracle_sql() -> dict[str, str]:
    out = {}
    for m in _MODULES:
        try:
            mod = import_module(f"aristoteles_spark.queries.{m}")
        except ModuleNotFoundError:
            continue
        out.update(mod.ORACLE)
    return _ordered(out)
