"""Shuffle/input-volume report: runs headline queries and records, per
query, the bytes actually read from parquet and the bytes moved through
shuffles (from Spark's AppStatusStore stage metrics).

This is the quantitative side of PLANS.md: the plan audit proves the
*shape* (pushdown, broadcast, partial agg); this proves the *volume* — a
query whose shuffle-write is a tiny fraction of its input is the one that
survives a 100x scale-up. Writes METRICS.md.

Usage: python tools/shuffle_report.py  [SPARK_GRAFT_SF_DIR=... to change sf]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# batch headliners across categories (streaming excluded: the memory-sink
# runner muddies per-query stage attribution)
HEADLINERS = [
    "g1_pricing_summary",
    "j5_multi_join_topk",
    "j6_star_join",
    "h2_min_cost_supplier",
    "h8_market_share",
    "h9_profit",
    "h11_important_parts",
    "h16_supplier_cnt",
    "j8_outer_count_dist",
    "j9_large_orders",
    "j10_semi_anti_self",
    "dd1_exact_groups",
    "dd3_jaccard_pairs",
    "dd4_minhash_lsh_pairs",
    "dd7_dup_clusters",
    "dd9_cluster_representatives",
    "sim5_semantic_clusters",
    "sim1_knn_brute",
    "sim4_knn_ivf",
    "tx6_tfidf_top_terms",
    "tx8_bigram_topk",
    "an2_retention_cohorts",
    "at3_time_weighted_avg",
    "tk1_salted_token_df",
    "wb4_multires_rollup",
    "iv1_interval_coalesce",
    "cd3_apply_changelog",
    "an5_attribution",
    "gr1_khop_bfs",
    "dd10_containment",
    "mv1_incremental_rollup",
    "fs1_feature_snapshot",
    "sk2_bloom_filter",
    "mm10_real_jpeg",
    # round-3 additions
    "sk3_countmin_freq",
    "sk4_kmv_overlap",
    "gr3_weighted_sssp",
    "io10_avro_roundtrip",
    "io11_warc_roundtrip",
    "io12_zorder_pruning",
    "io13_protobuf_log",
    "st12_stream_cdc_upsert",
    "mm13_progressive_jpeg",
    # round-3b additions
    "ir1_bm25_search",
    "ir2_hybrid_rrf",
    "hx1_html_extract",
    # round-3c additions (curation + linear algebra)
    "sd1_semdedup",
    "ds1_dsir_select",
    # round-3 session-2 additions (censuses + layout + mixtures)
    "mm15_phash_buckets",
    "qc2_threshold_yield",
    "tv1_tokenizer_fertility",
    "srt1_range_shards",
    "dd12_lsh_quality",
    "sim6_ann_recall",
    "mx2_temperature_mixture",
    "st13_stream_neardup",
    "url1_url_canonicalize",
    "ar4_gram_matrix",
    "rl1_release_pipeline",
    "sk6_kmv_per_group",
    "dr1_distribution_drift",
    "qr1_gopher_rules",
    # round-6 additions
    "xm1_index_compaction",
    "qr2_repetition_rules",
    # round-7 additions
    "ln2_substring_dedup",
    "sd2_text_embed_neardup",
    "fp1_winnowing_fps",
    # round-8 additions
    "qc3_logreg_train",
    "qc5_logreg_holdout",
    "sim7_knn_ivfpq",
    "sim8_ivfpq_recall",
    "sim9_ivfpq_rerank",
    "ln4_substring_probe",
    "xm2_winnow_compaction",
    "tx15_bpe_roundtrip",
]


def _stages(spark):
    store = spark._jsparkSession.sparkContext().statusStore()
    gw = spark._sc._gateway
    empty = gw.jvm.java.util.ArrayList()
    quantiles = gw.new_array(gw.jvm.double, 0)
    lst = store.stageList(empty, False, False, quantiles, empty)
    out = {}
    for i in range(lst.size()):
        s = lst.apply(i)
        out[(s.stageId(), s.attemptId())] = (
            s.inputBytes(),
            s.shuffleWriteBytes(),
            s.shuffleWriteRecords(),
            s.shuffleReadBytes(),
        )
    return out


def main() -> int:
    import __spark_entry__ as entrymod
    from aristoteles_spark.session import get_spark

    spark = get_spark("shuffle_report")
    qs = entrymod.queries()
    rows = []
    for name in HEADLINERS:
        before = _stages(spark)
        t0 = time.time()
        n_rows = len(qs[name](spark, SF_DIR).collect())
        wall = time.time() - t0
        after = _stages(spark)
        new = [v for k, v in after.items() if k not in before]
        inp = sum(v[0] for v in new)
        sw = sum(v[1] for v in new)
        swr = sum(v[2] for v in new)
        sr = sum(v[3] for v in new)
        rows.append((name, n_rows, wall, inp, sw, swr, sr))
        print(f"{name}: input={inp/1e6:.1f}MB shuffleW={sw/1e6:.2f}MB", flush=True)

    mb = lambda b: f"{b/1e6:.2f}"  # noqa: E731
    lines = [
        "# Shuffle / input volume report",
        "",
        f"Stage-metric deltas per headline query at sf_dir={SF_DIR}",
        "(tools/shuffle_report.py, AppStatusStore). Shuffle-write is the",
        "volume that would cross the network on a real cluster — the",
        "scale-limiting quantity. Cached/persisted subtrees shared between",
        "queries are charged to the first query that materializes them.",
        "",
        "| query | rows | wall s | input MB | shuffle write MB | shuffle write rows | shuffle read MB | write/input |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, n_rows, wall, inp, sw, swr, sr in rows:
        ratio = f"{sw/inp:.3f}" if inp else "—"
        lines.append(
            f"| {name} | {n_rows} | {wall:.2f} | {mb(inp)} | {mb(sw)} | {swr} | {mb(sr)} | {ratio} |"
        )
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "METRICS.md"),
        "w",
    ) as f:
        f.write("\n".join(lines) + "\n")
    print("METRICS.md written")
    return 0


if __name__ == "__main__":
    sys.exit(main())
