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
    simhash_pairs,
    simhash_sketches,
)
from aristoteles_spark.sources.parquet_source import fan_out, load_table

# ------------------------------------------------------ shared SQL fragments

_TOKENS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_DTOKENS = f"list_distinct({_TOKENS})"


def _h32(expr: str, seed: str = "0") -> str:
    return f"CAST(concat('0x', substr(md5(concat('{seed}:', {expr})), 1, 8)) AS BIGINT)"


NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS


# ----------------------------------------------------------------- queries


def minhash_sig_table(spark, sf_dir):
    """The full-corpus MinHash signature table (doc, sig) — materialized
    ONCE per session (operators/materialize.shared_table) and consumed by
    every minhash-family query: dd4's pair stream, dd7's cluster edges,
    dd11's bucket census, dd12's sample-side candidates, nd1's stored
    index + probe batch, xm1's daily indexes. This is the production
    shape: a pipeline writes its signature index once and every dedup /
    maintenance stage reads it — signatures are pure per-row functions of
    the text (values pytest- and oracle-pinned), so a filtered slice of
    this table is bit-identical to re-signing the slice. Through round 8
    each consumer re-ran the tokenize+md5+minhash scan (the family's
    dominant map cost) per query.

    Under SPARK_GRAFT_NO_SHARED_TABLES=1 (scale sweeps) each caller
    builds its own frame — growth ratios stay honest; the plan audit's
    SPARK_GRAFT_AUDIT_NO_BARRIER=1 bypasses the memo entirely so every
    query's full strategy plan remains visible."""
    import os

    from aristoteles_spark.operators.dedup import minhash_signatures
    from aristoteles_spark.operators.materialize import shared_table

    def build():
        d = fan_out(load_table(spark, sf_dir, "documents"))
        return minhash_signatures(d, num_hashes=NUM_HASHES)

    return shared_table(
        spark, ("minhash_sigs", os.path.abspath(sf_dir), NUM_HASHES), build
    )


def q_exact(spark, sf_dir):
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return exact_dedup_groups(d).orderBy("digest")


def q_normalized(spark, sf_dir):
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return normalized_dedup_groups(d).orderBy("digest")


NDSPLIT_MOD = 10  # ~10% of docs form the "new batch"; the rest are the index


def q_incremental_neardup(spark, sf_dir):
    """nd1 — incremental near-dup check: a new ingest batch (content-hash
    ~10% slice) probed against the existing corpus's banded LSH index
    (operators/dedup.py:minhash_index_probe). Per batch doc: how many
    index near-dups it has, the closest estimated similarity, and the
    novelty flag a filter stage would gate on. The production dedup
    shape — daily batches never re-pair the historical corpus."""
    from aristoteles_spark.functions.text import h32
    from aristoteles_spark.operators.dedup import (
        _finalize,
        banded_index_grouped,
        minhash_probe_census,
    )

    d = fan_out(load_table(spark, sf_dir, "documents"))
    is_batch = h32(F.col("doc_id").cast("string")) % NDSPLIT_MOD == 0
    batch = d.filter(is_batch)
    index = d.filter(~is_batch)
    # round 7: the shared DISTINCT-SIGNATURE census (st13's probe
    # collapse, operators/dedup.py:minhash_probe_census) — est_sim is a
    # pure function of the signature pair, so both sides collapse to
    # distinct signatures before the band join and per-doc counts
    # recover exactly via sum(cnt_i). Output (and oracle) unchanged.
    # Round 9: both sides are id-predicate slices of the session-shared
    # signature table (signatures are per-row pure, so a filtered slice
    # == re-signing the slice; the split predicate lands on the stored
    # table's `doc` column).
    sig_all = minhash_sig_table(spark, sf_dir)
    sig_is_batch = h32(F.col("doc").cast("string")) % NDSPLIT_MOD == 0
    idxg = banded_index_grouped(
        index, num_hashes=NUM_HASHES, bands=BANDS,
        sigs=sig_all.filter(~sig_is_batch),
    )
    # persist: consumed by the distinct pass AND the re-expansion join
    sb = sig_all.filter(sig_is_batch).persist()
    out = minhash_probe_census(
        idxg, sb, NUM_HASHES, BANDS, threshold=0.5
    ).orderBy("batch_doc")
    return _finalize(out, sb)


SPAN_W = 8  # non-overlapping block width (tokens)

# ln2 exact-substring dedup: minimum duplicated run length (tokens) and
# the seeded-clone families that give the rule live data — the synthetic
# corpus is random words, which never repeat a 16-token window, so the
# query derives a corpus with verbatim excerpts: clone1 is a straight
# 200-char excerpt (one long duplicated span), clone2 splices two
# disjoint excerpts around a per-doc-unique separator (two spans,
# exercising the interval-merge break). Built identically in Spark and
# the SQL oracle, so the driver compare covers the live path.
LN2_W = 16
LN2_MOD = 23
LN2_C1_OFF, LN2_C1_BASE = 5, 1_000_000
LN2_C2_OFF, LN2_C2_BASE = 11, 2_000_000

# fp1 winnowing: k-gram size, window size, and the clone family that
# gives the shared-fingerprint census live data. Robust winnowing
# guarantees: any shared token run of length >= FP_W + FP_K - 1 (= 7)
# between two documents shares at least one selected fingerprint.
FP_K, FP_W = 4, 4
FP_MOD, FP_OFF, FP_BASE = 29, 13, 5_000_000
# gram hash = per-token h32 combined by a 40-bit polynomial: each step
# (acc * FP_C + next) & FP_MASK stays under 2^61 (no ANSI bigint
# overflow; & is the same operator in duckdb), and hashing the TOKEN
# array once then combining with integer math avoids materializing one
# K-token STRING per position — measured at the 100x replica, the
# slice+array_join gram-string construction alone cost 33s of the 50s
# hashing pass (md5-of-gram-string added 17s more); the polynomial is
# integer-only. 40-bit space over ~25M grams keeps expected collisions
# in the hundreds (vs ~150k at 31 bits).
FP_C = 1_000_003
FP_MASK = (1 << 40) - 1

def _fp_poly_sql() -> str:
    """duckdb mirror of fp1's per-gram polynomial over the token-hash
    list (1-based i is the gram start)."""
    acc = "th[i]"
    for o in range(1, FP_K):
        acc = f"(({acc}) * {FP_C} + th[i + {o}]) & {FP_MASK}"
    return acc


_FP_POLY = _fp_poly_sql()


def q_span_dedup(spark, sf_dir):
    """ln1 — cross-document span dedup (the CCNet/RefinedWeb "remove
    duplicated lines across the corpus" curation step, over token blocks
    since this corpus has no newlines): split every document into
    non-overlapping 8-token blocks, keep each distinct block's GLOBAL
    first occurrence (min (doc_id, idx)), rebuild every document from
    its surviving blocks. Output: per doc, block counts before/after and
    the digest of the cleaned text.

    Plan (100 TB shape): blocks are built in-row (transform over an
    index sequence, no per-token explode); ONE corpus shuffle keyed by
    block hash computes first-occurrences as a min(struct) partial agg
    (map-side combined); keepers join back on the same key; the rebuild
    groupBy(doc_id) carries only SURVIVING block text. No window over
    the corpus, no driver state."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    n_blocks = F.ceil(F.size(toks) / F.lit(SPAN_W)).cast("int")
    blocks = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.struct(
            i.alias("idx"),
            F.array_join(
                F.slice(toks, i * SPAN_W + 1, SPAN_W), " "
            ).alias("block"),
        ),
    )
    b = (
        d.select("doc_id", F.explode(blocks).alias("b"))
        .select(
            "doc_id",
            F.col("b.idx").alias("idx"),
            F.col("b.block").alias("block"),
            F.md5(F.col("b.block").cast("binary")).alias("bh"),
        )
    )
    keepers = b.groupBy("bh").agg(
        F.min(F.struct("doc_id", "idx")).alias("keep")
    )
    kept = (
        b.join(keepers, "bh")
        .withColumn(
            "is_kept",
            (F.col("doc_id") == F.col("keep.doc_id"))
            & (F.col("idx") == F.col("keep.idx")),
        )
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum((~F.col("is_kept")).cast("long")).alias("n_removed"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("is_kept"),
                                    F.struct("idx", "block"),
                                )
                            )
                        ),
                        lambda s: s["block"],
                    ),
                    " ",
                ).cast("binary")
            ).alias("clean_digest"),
        )
        .orderBy("doc_id")
    )


def q_substring_dedup(spark, sf_dir):
    """ln2 — variable-length exact repeated-substring dedup (ExactSubstr,
    Lee et al. 2021, keep-first variant; operator:
    operators/dedup.py:exact_substring_dedup). Any token run >= LN2_W
    that occurs more than once in the corpus — across documents or
    within one — is flagged for removal at every occurrence except the
    globally first; overlapping/adjacent duplicated windows merge into
    maximal spans, so an 80-token verbatim repeat reports as ONE span of
    80 tokens, not 65 window hits. Output: per affected doc, token
    count, span count, removed-token count, and a digest of the exact
    span extents.

    The corpus is seeded with two deterministic clone families (straight
    excerpt + two-excerpt splice) because random synthetic text never
    repeats a 16-token window — the seeding is replicated verbatim in
    the oracle, so the driver checks the LIVE removal path, including
    multi-span docs and variable span lengths."""
    from aristoteles_spark.operators.dedup import exact_substring_dedup

    out = exact_substring_dedup(
        _ln_corpus(spark, sf_dir), "text", "doc_id", min_len=LN2_W
    )
    return out.select(
        F.col("doc").alias("doc_id"),
        "n_tokens",
        "n_spans",
        "removed_tokens",
        "span_digest",
    ).orderBy("doc_id")


def _ln_corpus(spark, sf_dir):
    """The ln2/ln3 seeded corpus (docs + excerpt clone + two-span
    splice clone) — shared so both variants diff only in keeper
    semantics."""
    d = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    c1 = d.filter(F.col("doc_id") % LN2_MOD == LN2_C1_OFF).select(
        (F.col("doc_id") + LN2_C1_BASE).alias("doc_id"),
        F.substring("text", 30, 200).alias("text"),
    )
    c2 = d.filter(F.col("doc_id") % LN2_MOD == LN2_C2_OFF).select(
        (F.col("doc_id") + LN2_C2_BASE).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 120),
            F.lit(" uq"),
            F.col("doc_id").cast("string"),
            F.lit(" "),
            F.substring("text", 180, 120),
        ).alias("text"),
    )
    return d.unionByName(c1).unionByName(c2)


def q_substring_remove_all(spark, sf_dir):
    """ln3 — exact-substring dedup, REMOVE-ALL variant: the released
    Lee et al. 2021 tool's exact semantics — every occurrence of a
    duplicated >= LN2_W-token run is removed, INCLUDING the first
    (ln2 keeps the global first). Same seeded corpus, same operator
    (operators/dedup.py:exact_substring_dedup keep_first=False), same
    output shape; the keeper join against the dup digest set
    disappears entirely (any count >= 2 window flags all its
    occurrences), so this variant is one shuffle + the per-doc fold."""
    from aristoteles_spark.operators.dedup import exact_substring_dedup

    out = exact_substring_dedup(
        _ln_corpus(spark, sf_dir), "text", "doc_id",
        min_len=LN2_W, keep_first=False,
    )
    return out.select(
        F.col("doc").alias("doc_id"),
        "n_tokens",
        "n_spans",
        "removed_tokens",
        "span_digest",
    ).orderBy("doc_id")


def q_substring_probe(spark, sf_dir):
    """ln4 — INCREMENTAL exact-substring probe (the round-7 verdict's
    maintenance-loop item): the seeded ln corpus splits content-hash
    style (h32(doc_id) % NDSPLIT_MOD == 0 = the new ingest batch, nd1's
    rule); history collapses ONCE into the stored window-digest index
    (operators/dedup.py:exact_substring_index — ln2's corpus shuffle
    saved as a table) and the batch probes it WITHOUT re-scanning
    history (exact_substring_probe, batch mode: batch-local (count,
    min-code) aggregates merge with the index's). The result equals a
    fresh full-corpus keep-first ln2 restricted to batch docs — the
    oracle states exactly that identity, so the driver checks the
    incremental path against the from-scratch semantics."""
    from aristoteles_spark.functions.text import h32
    from aristoteles_spark.operators.dedup import (
        exact_substring_index,
        exact_substring_probe,
    )

    corpus = _ln_corpus(spark, sf_dir)
    is_batch = h32(F.col("doc_id").cast("string")) % NDSPLIT_MOD == 0
    idx = exact_substring_index(corpus.filter(~is_batch), min_len=LN2_W)
    out = exact_substring_probe(
        idx, corpus.filter(is_batch), min_len=LN2_W
    )
    return out.select(
        F.col("doc").alias("doc_id"),
        "n_tokens",
        "n_spans",
        "removed_tokens",
        "span_digest",
    ).orderBy("doc_id")


def winnow_per_doc(corpus):
    """(doc_id, n_grams, fps) — fp1's robust-winnowing fingerprint set
    per document, all in-row (the gram-hash array is lambda-bound once
    — the sd2 hygiene; per-window rightmost-min is a W-element fold).
    Factored out so xm2's daily index tables build through the SAME
    expression the fresh fp1 census uses."""
    from aristoteles_spark.functions.text import h32

    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    th = F.transform(toks, lambda t: h32(t))

    def poly(thv, i):
        acc = F.element_at(thv, (i + 1).cast("int"))
        for o in range(1, FP_K):
            acc = (acc * F.lit(FP_C) + F.element_at(
                thv, (i + o + 1).cast("int")
            )).bitwiseAND(F.lit(FP_MASK))
        return acc

    # token-hash array lambda-bound once (the sd2 hygiene), then each
    # gram is pure integer math over it — no per-position gram string
    grams = F.get(
        F.transform(
            F.array(th),
            lambda thv: F.when(
                n >= FP_K,
                F.transform(
                    F.sequence(F.lit(0), n - FP_K),
                    lambda i: poly(thv, i),
                ),
            ).otherwise(F.expr("CAST(array() AS array<bigint>)")),
        ),
        0,
    )

    def build(g):
        ng = F.size(g)
        # rightmost minimal hash per window: <= keeps the RIGHTMOST on
        # ties (the paper's robust variant); positions are 1-based so
        # the duckdb mirror indexes identically
        win_pos = F.transform(
            F.sequence(F.lit(1), ng - FP_W + 1),
            lambda j: F.aggregate(
                F.sequence(F.lit(0), F.lit(FP_W - 1)),
                F.struct(
                    F.lit(1 << 62).cast("long").alias("best"),
                    F.lit(0).alias("pos"),
                ),
                lambda acc, o: F.when(
                    F.element_at(g, (j + o).cast("int")) <= acc["best"],
                    F.struct(
                        F.element_at(g, (j + o).cast("int")).alias("best"),
                        (j + o).cast("int").alias("pos"),
                    ),
                ).otherwise(acc),
                lambda acc: acc["pos"],
            ),
        )
        fps = F.array_distinct(
            F.transform(
                F.array_distinct(win_pos),
                lambda p: F.element_at(g, p),
            )
        )
        return F.when(ng >= FP_W, fps).otherwise(
            F.expr("CAST(array() AS array<bigint>)")
        )

    return corpus.select(
        "doc_id",
        F.size(grams).cast("long").alias("n_grams"),
        F.get(F.transform(F.array(grams), build), 0).alias("fps"),
    )


def winnow_fp_table(spark, sf_dir):
    """The BASE-corpus winnowing fingerprint table (doc_id, n_grams,
    fps) — materialized once per session (the minhash_sig_table
    discipline, round 9): the MOSS candidate index a production pipeline
    writes once and every fingerprint consumer reads. Fingerprint
    selection is a pure per-row function of the text, so corpus slices
    (xm2's daily indexes) and unions with derived clone rows (fp1) are
    value-identical to recomputing. Bypassed under the scale sweep's
    NO_SHARED_TABLES regime and the plan audit's NO_BARRIER flag."""
    import os

    from aristoteles_spark.operators.materialize import shared_table

    def build():
        d = fan_out(load_table(spark, sf_dir, "documents")).select(
            "doc_id", "text"
        )
        return winnow_per_doc(d)

    return shared_table(
        spark, ("winnow_fps", os.path.abspath(sf_dir), FP_K, FP_W), build
    )


def q_winnowing_fps(spark, sf_dir):
    """fp1 — robust winnowing fingerprints (Schleimer/Wilkerson/Aiken
    2003, the MOSS algorithm): per document, hash every FP_K-token
    gram, slide a FP_W-hash window, and select the RIGHTMOST minimal
    hash in each window; the distinct selected hashes are the doc's
    fingerprint set. Guarantee (pytest-pinned): any shared token run of
    length >= FP_W + FP_K - 1 between two docs shares >= 1 fingerprint
    — the sub-linear candidate generator for exact-substring dedup
    (ln2 verifies extents; winnowing finds WHO to compare at ~1/W the
    index size). Output: per fingerprinted doc, gram/fingerprint
    counts, how many of its fingerprints are shared with other docs,
    and the max document frequency among them.

    Plan (100 TB shape): gram hashing AND window selection run in-row
    (the gram-hash array is lambda-bound once — the sd2 hygiene);
    per-window rightmost-min is a W-element fold, O(grams x W) per
    row. The only corpus exchanges are a partial-agged groupBy on the
    fingerprint (doc frequency) and the join-back — both linear in
    selected fingerprints (~grams/W rows, the winnowing density bound),
    never pairs. Docs shorter than FP_K + FP_W - 1 tokens select
    nothing and are structurally absent (standard winnowing semantics).
    Clone seeding (FP_MOD family) mirrors the oracle verbatim so the
    shared-fingerprint path is driver-live. Round 9: base-corpus rows
    come from the session-shared fingerprint table (winnow_fp_table);
    only the ~n/29 derived clone rows are fingerprinted fresh."""
    d = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    clones = d.filter(F.col("doc_id") % FP_MOD == FP_OFF).select(
        (F.col("doc_id") + FP_BASE).alias("doc_id"),
        F.substring("text", 25, 220).alias("text"),
    )
    per = winnow_fp_table(spark, sf_dir).unionByName(winnow_per_doc(clones))
    ex = per.select(
        "doc_id", "n_grams", F.explode("fps").alias("fp")
    )
    dfc = ex.groupBy("fp").agg(F.count(F.lit(1)).alias("dfx"))
    return (
        ex.join(dfc, "fp")
        .groupBy("doc_id")
        .agg(
            F.min("n_grams").alias("n_grams"),
            F.count(F.lit(1)).cast("long").alias("n_fps"),
            F.sum((F.col("dfx") >= 2).cast("long")).alias("n_shared"),
            F.max("dfx").cast("long").alias("max_df"),
        )
        .orderBy("doc_id")
    )


# The pair-generating operators emit O(cluster^2) rows on a dup-heavy
# corpus; materializing all pairs to the driver is exactly what a 100 TB
# dedup job must NOT do. The declared queries therefore aggregate the pair
# stream per doc (the realistic deliverable: how many near-dups each doc
# has, and how close the nearest is) — the oracle hash still pins every
# pair through the counts/extrema.


def q_jaccard(spark, sf_dir):
    d = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(d, threshold=0.8)
    return (
        pairs.groupBy("doc_a")
        .agg(F.count("*").alias("n_dups"), F.max("jaccard").alias("max_jaccard"))
        .orderBy("doc_a")
    )


def q_minhash(spark, sf_dir):
    d = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = minhash_lsh_pairs(
        d, num_hashes=NUM_HASHES, bands=BANDS, threshold=0.5,
        sigs=minhash_sig_table(spark, sf_dir),
    )
    return (
        pairs.groupBy("doc_a")
        .agg(F.count("*").alias("n_pairs"), F.max("est_sim").alias("max_est_sim"))
        .orderBy("doc_a")
    )


def simhash_sketch_table(spark, sf_dir):
    """The full-corpus SimHash sketch table (doc, simhash) — materialized
    once per session (the minhash_sig_table discipline): sketches are
    per-row pure, so dd5's census and dd6's pair generation read the
    same stored table a production pipeline would write once. Bypassed
    under NO_SHARED_TABLES / the plan audit's NO_BARRIER flag."""
    import os

    from aristoteles_spark.operators.materialize import shared_table

    def build():
        d = fan_out(load_table(spark, sf_dir, "documents"))
        return simhash_sketches(d)

    return shared_table(
        spark, ("simhash_sketches", os.path.abspath(sf_dir)), build
    )


def q_simhash(spark, sf_dir):
    return simhash_sketch_table(spark, sf_dir).orderBy("doc")


MAX_HAMMING = 2
# block layout must mirror operators/dedup.py:simhash_pairs: nblocks =
# max_hamming+1, width = ceil(32/nblocks)
_NBLOCKS = MAX_HAMMING + 1
_BWIDTH = 32 // _NBLOCKS + (1 if 32 % _NBLOCKS else 0)


def q_simhash_pairs(spark, sf_dir):
    d = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = simhash_pairs(
        d, max_hamming=MAX_HAMMING,
        sketches=simhash_sketch_table(spark, sf_dir),
    )
    return (
        pairs.groupBy("doc_a")
        .agg(F.count("*").alias("n_pairs"), F.min("hamming").alias("min_hamming"))
        .orderBy("doc_a")
    )


def _doc_clusters(spark, sf_dir):
    """The MinHash-LSH near-dup cluster table (node, cluster) —
    materialized ONCE per session and consumed by every query that
    needs the labeling (dd7's deliverable, p8's split keys). This is
    the production shape: a pipeline writes its cluster table once and
    every downstream stage reads it; through round 4 dd7 and p8 each
    re-ran the signature+banding+contraction-CC stack (~13 s of the
    247 s sf0.1 suite for two copies of the same table — VERDICT r4).

    Uses the star+bridge contracted edge set (minhash_cluster_edges):
    identical components as the full pair expansion, but O(n) edges
    instead of the clique blowup (5.4M -> ~5k at sf0.1)."""
    import os

    from aristoteles_spark.operators.dedup import minhash_cluster_edges
    from aristoteles_spark.operators.graph import connected_components
    from aristoteles_spark.operators.materialize import shared_table

    def build():
        d = fan_out(load_table(spark, sf_dir, "documents"))
        edges = minhash_cluster_edges(
            d, num_hashes=NUM_HASHES, bands=BANDS, threshold=0.5,
            sigs=minhash_sig_table(spark, sf_dir),
        )
        nodes = d.select(F.col("doc_id").alias("doc"))
        return connected_components(nodes, edges)

    key = ("doc_clusters", os.path.abspath(sf_dir), NUM_HASHES, BANDS, 0.5)
    return shared_table(spark, key, build)


def q_dup_clusters(spark, sf_dir):
    """Near-dup cluster labeling: MinHash-LSH similarity edges, iterated
    min-label propagation to a fixpoint (operators/graph.py). The
    'keep one per cluster' deliverable of a dedup pipeline; the cluster
    table itself is session-shared (_doc_clusters)."""
    return _doc_clusters(spark, sf_dir).orderBy("node")


def q_repetition_scrub(spark, sf_dir):
    """Within-document repetition removal (the RefinedWeb/Gopher-style
    scrub step, adapted to token runs): collapse consecutive repeated
    tokens, emit the cleaned text plus before/after counts. Entirely
    row-local higher-order array expressions — zero shuffle at any scale;
    the only cost is the scan itself."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    # keep token i when it differs from its predecessor (F.get is 0-based
    # and null-safe on out-of-range, so i==0 never errors under ANSI)
    kept = F.filter(
        "toks",
        lambda x, i: (i == F.lit(0))
        | ~x.eqNullSafe(F.get(F.col("toks"), i - F.lit(1))),
    )
    return (
        toks.select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.size(kept).alias("n_kept"),
            F.array_join(kept, " ").alias("clean_text"),
        )
        .orderBy("doc_id")
    )


def q_fuzzy_name_match(spark, sf_dir):
    """Entity resolution / fuzzy matching: pairs of distinct part names
    within edit distance 4, blocked on the trailing token so the
    quadratic levenshtein only runs inside blocks (the standard
    blocking+residual recipe — at scale the distinct-name table is the
    product of a partial-agg dedup, orders smaller than the fact table,
    and the block key join replaces the n^2 cross compare)."""
    # block on the FIRST token: substring_index(…, 1) and duckdb's
    # split_part(…, 1) agree on every input shape (including names with
    # no or many delimiters), so the oracle stays a literal transliteration
    p = load_table(spark, sf_dir, "part").select("p_name").distinct()
    a = p.select(
        F.col("p_name").alias("name_a"),
        F.substring_index("p_name", " ", 1).alias("blk"),
    )
    b = p.select(
        F.col("p_name").alias("name_b"),
        F.substring_index("p_name", " ", 1).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.levenshtein("name_a", "name_b") <= 4)
        )
        .select(
            "name_a", "name_b", F.levenshtein("name_a", "name_b").alias("dist")
        )
        .orderBy("name_a", "name_b")
    )


def q_cluster_representatives(spark, sf_dir):
    """'Keep one per cluster', quality-aware: for each exact-dup group pick
    the member with the best quality score (ties -> lowest doc_id) and
    report the group size. One digest shuffle with map-side partial agg —
    the argmax is a struct-max aggregate, no per-group window/sort."""
    from aristoteles_spark.functions.text import quality_score

    d = fan_out(load_table(spark, sf_dir, "documents"))
    best = F.max(
        F.struct(
            F.col("q").alias("q"),
            (-F.col("doc_id")).alias("nd"),
            F.col("doc_id").alias("doc_id"),
        )
    )
    return (
        d.select(F.md5(F.col("text").cast("binary")).alias("digest"),
                 "doc_id", quality_score("text").alias("q"))
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_members"), best.alias("b"))
        .select(
            F.col("b.doc_id").alias("rep_doc"),
            "n_members",
            F.col("b.q").alias("rep_quality"),
        )
        .orderBy("rep_doc")
    )


DF_CAP = 25  # stop-gram removal: grams in more docs than this are dropped


def q_containment(spark, sf_dir):
    """Asymmetric near-containment detection ("doc A is mostly inside
    doc B") — the dedup case Jaccard misses: a short doc embedded in a
    long one has low Jaccard but containment ~1. Classic inverted-index
    formulation: distinct 8-token shingles per doc, document-frequency
    cap (k <= DF_CAP) drops stop-grams BEFORE the index self-join — the
    blocking step that bounds per-gram pair fanout at DF_CAP^2 and makes
    the join skew-proof at corpus scale (a boilerplate gram shared by
    10^6 docs never reaches the join). Containment is scored on the
    capped gram sets (stated semantics, identical in the oracle);
    threshold 0.8 applied as an integer predicate (n_common*5 >=
    4*min(n_a, n_b)) so no float comparison sits on the cut.

    The capped index `rare` feeds three consumers (sizes, both join
    sides); without a barrier each consumer re-runs the gram explosion
    — the corpus's most expensive stage — up to 8x (round-3 bench
    measured 8.4 s vs 3.2 s depending on whether AQE's runtime exchange
    reuse happened to kick in). localCheckpoint materializes the
    compact (doc_id, gram-hash) index ONCE; at corpus scale that index
    is what a production containment pass stores anyway."""
    from aristoteles_spark.functions.text import tokens
    from aristoteles_spark.queries.text import _gram_hashes

    d = fan_out(load_table(spark, sf_dir, "documents"))
    grams = d.select(
        "doc_id", F.explode(_gram_hashes(tokens("text"))).alias("g")
    )
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("k"))
    from aristoteles_spark.operators.barrier import audit_barrier

    rare = audit_barrier(
        grams.join(freq.filter(F.col("k") <= DF_CAP), "g").select("doc_id", "g")
    )
    sizes = rare.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = rare.select(F.col("doc_id").alias("doc_a"), "g")
    b = rare.select(F.col("doc_id").alias("doc_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")),
            "doc_b",
        )
        .filter(F.col("n_common") * 5 >= 4 * F.least("n_a", "n_b"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            "n_a",
            "n_b",
            (
                F.col("n_common").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("containment"),
        )
        .orderBy("doc_a", "doc_b")
    )


SPLIT_BUCKETS = 10  # 0-7 train, 8 val, 9 test


def q_leakage_free_split(spark, sf_dir):
    """Leakage-free train/val/test split: assignment is by NEAR-DUP
    CLUSTER, not by document — the practice that keeps one member of a
    duplicate family out of eval while its twin sits in train (the
    failure mode p7's per-doc hash split cannot prevent). Clusters are
    the MinHash-LSH connected components (dd7's operator); the split is
    a content-hash of the CLUSTER label, so every member inherits the
    same bucket by construction. Emits per split the doc/cluster/token
    masses plus ``n_leaky_clusters`` — clusters spanning >1 split —
    which is structurally zero and oracle-matched at zero (the same
    computed-not-asserted pattern as sk2's false negatives). Scale: the
    cluster labeling is the contraction CC — session-shared with dd7
    (_doc_clusters); everything after is one partial-agg shuffle of
    tiny keys."""
    from aristoteles_spark.functions.text import h32, tokens

    d = fan_out(load_table(spark, sf_dir, "documents"))
    cc = _doc_clusters(spark, sf_dir)  # (node, cluster)
    bucket = F.pmod(
        h32(F.col("cluster").cast("string"), F.lit("split")),
        F.lit(SPLIT_BUCKETS),
    )
    split = (
        F.when(bucket <= 7, "train").when(bucket == 8, "val").otherwise("test")
    )
    labeled = (
        d.select("doc_id", F.size(tokens("text")).alias("n_tok"))
        .join(cc, d["doc_id"] == cc["node"])
        .select("doc_id", "n_tok", "cluster", split.alias("split"))
    )
    leaky = (
        labeled.groupBy("cluster")
        .agg(F.count_distinct("split").alias("k"))
        .agg(
            F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_leaky_clusters")
        )
    )
    return (
        labeled.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("cluster").alias("n_clusters"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
        .crossJoin(F.broadcast(leaky))
        .orderBy("split")
    )


def q_lsh_tuning(spark, sf_dir):
    """LSH parameter diagnostics: per band, the bucket census — bucket
    count, largest bucket, and the candidate-pair mass Σ k·(k−1)/2 each
    band would feed the verifier. This is the table you read before
    picking (bands, rows): a band whose max bucket explodes is the
    skew/recall trade-off made visible BEFORE running the join.
    Buckets are grouped on the raw signature slices (no digest — the
    grouping itself is the portable object), one explode + one
    partial-agg shuffle; census keys are tiny. Signatures come from the
    session-shared signature table (round 9, minhash_sig_table)."""
    rows_per_band = NUM_HASHES // BANDS
    sigs = minhash_sig_table(spark, sf_dir)
    banded = sigs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.slice("sig", bi * rows_per_band + 1, rows_per_band).alias(
                            "key"
                        ),
                    )
                    for bi in range(BANDS)
                ]
            )
        ).alias("x")
    ).select(F.col("x.band").alias("band"), F.col("x.key").alias("key"))
    buckets = banded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("k"))
    return (
        buckets.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("k").cast("long").alias("n_docs"),
            F.max("k").alias("max_bucket"),
            F.sum(F.expr("(k * (k - 1)) DIV 2")).cast("long").alias("candidate_pairs"),
        )
        .orderBy("band")
    )


LSHQ_T = 0.5  # evaluation threshold shared by truth and candidate sides
LSHQ_SAMPLE = 500  # fixed-SIZE evaluation sample (hash-smallest doc ids)


def q_lsh_quality(spark, sf_dir):
    """dd12 — LSH quality census (see _lsh_quality_plan). Materializes
    the 1-row result eagerly (localCheckpoint), then releases the
    evaluation-sample cache so it cannot leak into a 220-query session
    (gr4's pattern). plan_audit explains _lsh_quality_plan's frame —
    the pre-checkpoint plan with the audit-worthy operators."""
    out, sample_docs = _lsh_quality_plan(spark, sf_dir)
    from aristoteles_spark.operators.barrier import audit_barrier

    return audit_barrier(out, sample_docs)


def _lsh_quality_plan(spark, sf_dir):
    """dd12 — LSH quality census: precision/recall of the banded MinHash
    candidate set against exact token-set Jaccard ground truth at the
    same threshold, measured on a FIXED-SIZE evaluation sample. THE
    number that justifies (num_hashes, bands) before a 100 TB dedup
    pass — dd11 shows the bucket-size/skew side, this shows the
    accuracy side of the same trade-off.

    Scale design — why the sample is load-bearing: exact Jaccard ground
    truth is inherently superlinear on a growing corpus (the first
    formulation measured 35x at the 10x sweep: threshold 0.5 halves the
    AllPairs prefix filter's selectivity exactly when the replica vocab
    forces the index-join strategy). Production never runs full-corpus
    exact truth either — it estimates recall on a fixed-budget sample.
    The sample here is the LSHQ_SAMPLE hash-smallest doc ids (a global
    partial top-k: TakeOrdered, no full sort). BOTH sides then run on
    the sample: LSH candidacy is PAIRWISE-LOCAL (a pair is a candidate
    iff one of ITS OWN band digests matches), so restricting to the
    sample before pair generation yields exactly (full-corpus pairs) ∩
    (sample x sample) — the measured-first formulation that generated
    all corpus pairs and semi-joined after was value-identical and 16x
    at the 10x sweep (61M pairs built, 9k kept). The only corpus-size-
    dependent cost left is the TakeOrdered scan.

    Determinism: the sample is a total (h32(doc_id), doc_id) order's
    prefix; counts are integers; precision/recall are floor(1e6*a/b) on
    those integers (the mx1 rule)."""
    from aristoteles_spark.functions.text import h32

    d = fan_out(load_table(spark, sf_dir, "documents"))

    def build_sample():
        sample_ids = (
            d.select(
                "doc_id", h32(F.col("doc_id").cast("string")).alias("hk")
            )
            .orderBy("hk", "doc_id")
            .limit(LSHQ_SAMPLE)
            .select("doc_id")
        )
        return d.join(F.broadcast(sample_ids), "doc_id")

    # materialize the 500-row sample ONCE per invocation: both pair
    # operators issue several internal jobs (vocab/signature counts),
    # and each would otherwise re-run the corpus scan + TakeOrdered
    # underneath (measured 54s vs 9s at the 10x sweep). Round 10
    # (VERDICT r9 item 3): the round-9 session-sharing of the sample and
    # the exact-Jaccard ground-truth table is REMOVED — both are dd12's
    # own evaluation intermediates with no other consumer, so memoizing
    # them across runs was caching dd12's own result; the query now pays
    # for its truth table every time, like every other query pays for
    # its own plan.
    sample_docs = build_sample().persist()
    sample_docs.count()
    truth_pairs = ngram_jaccard_pairs(sample_docs, threshold=LSHQ_T)
    truth = truth_pairs.select(
        "doc_a", "doc_b", F.lit(1).alias("in_t")
    )
    # candidate side: signatures of the sample are a broadcast-semi-join
    # slice of the session-shared signature table (per-row purity again);
    # the id list comes off the PERSISTED sample so the TakeOrdered scan
    # isn't re-run
    sample_sigs = minhash_sig_table(spark, sf_dir).join(
        F.broadcast(sample_docs.select(F.col("doc_id").alias("doc"))), "doc"
    )
    cand = minhash_lsh_pairs(
        sample_docs, num_hashes=NUM_HASHES, bands=BANDS, threshold=LSHQ_T,
        sigs=sample_sigs,
    ).select("doc_a", "doc_b", F.lit(1).alias("in_c"))
    j = truth.join(cand, ["doc_a", "doc_b"], "full_outer")
    counts = j.agg(
        F.sum("in_t").cast("long").alias("n_true"),
        F.sum("in_c").cast("long").alias("n_lsh"),
        F.sum(
            (F.col("in_t").isNotNull() & F.col("in_c").isNotNull()).cast("long")
        )
        .cast("long")
        .alias("n_tp"),
    )
    out = counts.select(
        "n_true",
        "n_lsh",
        "n_tp",
        (F.col("n_lsh") - F.col("n_tp")).alias("n_fp"),
        (F.col("n_true") - F.col("n_tp")).alias("n_fn"),
        F.when(F.col("n_lsh") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(F.col("n_tp") * F.lit(1.0e6) / F.col("n_lsh")).cast("long")
        )
        .alias("precision_ppm"),
        F.when(F.col("n_true") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(F.col("n_tp") * F.lit(1.0e6) / F.col("n_true")).cast("long")
        )
        .alias("recall_ppm"),
    )
    return out, sample_docs


QUERIES = {
    "dd12_lsh_quality": q_lsh_quality,
    "dd1_exact_groups": q_exact,
    "dd10_containment": q_containment,
    "dd11_lsh_tuning": q_lsh_tuning,
    "p8_leakage_free_split": q_leakage_free_split,
    "dd2_normalized_groups": q_normalized,
    "dd3_jaccard_pairs": q_jaccard,
    "dd4_minhash_lsh_pairs": q_minhash,
    "nd1_incremental_neardup": q_incremental_neardup,
    "ln1_span_dedup": q_span_dedup,
    "ln2_substring_dedup": q_substring_dedup,
    "ln3_substring_remove_all": q_substring_remove_all,
    "ln4_substring_probe": q_substring_probe,
    "fp1_winnowing_fps": q_winnowing_fps,
    "dd5_simhash_sketches": q_simhash,
    "dd6_simhash_pairs": q_simhash_pairs,
    "dd7_dup_clusters": q_dup_clusters,
    "dd8_repetition_scrub": q_repetition_scrub,
    "dd9_cluster_representatives": q_cluster_representatives,
    "fz1_fuzzy_name_match": q_fuzzy_name_match,
}

# ------------------------------------------------------------------ oracles

from aristoteles_spark.functions.text import _minhash_constants  # noqa: E402

_MH = _minhash_constants(NUM_HASHES)
_sig_cols = ",\n    ".join(
    f"list_min(list_transform(base_h, h -> ({a} * h + {b}) & 4294967295)) AS s{i}"
    for i, (a, b) in enumerate(_MH)
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

from aristoteles_spark.queries.text import _GRAM as _CGRAM  # noqa: E402

CC_ITERS = 12  # 2x the measured sf0.1 convergence depth (6)


def minlabel_chain(k: int = CC_ITERS) -> str:
    """Fixed-iteration min-label propagation CTE chain over edge CTE
    ``e(a, b)`` (symmetric): l0 = node id; each step takes the min label
    across neighbors. Replaces the recursive reachability closure the
    round-1 oracles used — that closure materializes O(sum comp_size^2)
    rows (5.4M pairs -> quadratic blowup at sf0.1), while this is
    O(iters x edges). The caller's final SELECT must guard convergence
    by comparing l{k} with l{k+1} (poison label -1 on divergence), so
    an under-iterated oracle fails LOUDLY instead of silently agreeing.
    """
    # every CTE is MATERIALIZED: each l{t} is referenced twice by
    # l{t+1} and e is referenced by every step — default inlining would
    # re-expand the whole chain exponentially (observed: fd exhaustion
    # from re-reading the parquet per inlined copy)
    step = """, l{t} AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l{p} n LEFT JOIN (
    SELECT e.a AS node, min(x.lbl) AS mn
    FROM e JOIN l{p} x ON x.node = e.b GROUP BY e.a) m
    ON m.node = n.node
)"""
    chain = """, l0 AS MATERIALIZED (
  SELECT DISTINCT a AS node, a AS lbl FROM e
)"""
    for t in range(1, k + 2):  # k productive + 1 convergence probe
        chain += step.format(t=t, p=t - 1)
    chain += f""", comp AS (
  SELECT k.node,
         CASE WHEN k1.lbl = k.lbl THEN k.lbl ELSE -1 END AS cluster
  FROM l{k} k JOIN l{k + 1} k1 ON k1.node = k.node
)"""
    return chain



_LN_H32_DOC = (
    "CAST(concat('0x', substr(md5(concat('0', ':', "
    "CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)"
)

# the seeded ln corpus as standalone duckdb SQL over a `documents`
# view — shared by the oracle prefix AND st14's stream staging builder
LN_CORPUS_SQL = f"""SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {LN2_C1_BASE} AS doc_id, substr(text, 30, 200) AS text
  FROM documents WHERE doc_id % {LN2_MOD} = {LN2_C1_OFF}
  UNION ALL
  SELECT doc_id + {LN2_C2_BASE} AS doc_id,
         substr(text, 1, 120) || ' uq' || CAST(doc_id AS VARCHAR)
           || ' ' || substr(text, 180, 120) AS text
  FROM documents WHERE doc_id % {LN2_MOD} = {LN2_C2_OFF}"""

_LN_PREFIX = f"""
WITH corpus AS (
  {LN_CORPUS_SQL}
), t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM corpus
), wins AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, CAST(i AS INT) AS pos,
         md5(array_to_string(toks[i + 1 : i + {LN2_W}], ' ')) AS wh
  FROM t, LATERAL unnest(range(CAST(len(toks) - {LN2_W - 1} AS BIGINT))) u(i)
  WHERE len(toks) >= {LN2_W}
)"""


def _ln_sql(remove_all: bool, batch_only: bool = False) -> str:
    """Shared ln2/ln3/ln4 oracle: the variants differ ONLY in which
    occurrences of a duplicated window are flagged — every non-first
    (rn > 1, keep-first) vs every one in a count>=2 group (remove-all,
    the released Lee et al. tool's semantics). ``batch_only`` restricts
    the REPORTED docs to nd1's content-hash batch slice while the flag
    still ranks over the FULL corpus — the exact identity ln4's
    incremental probe must reproduce (probe == fresh full-corpus run
    restricted to the batch)."""
    flag = (
        "count(*) OVER (PARTITION BY wh) >= 2"
        if remove_all
        else "row_number() OVER (PARTITION BY wh ORDER BY doc_id, pos) > 1"
    )
    restrict = (
        f" AND {_LN_H32_DOC} % {NDSPLIT_MOD} = 0" if batch_only else ""
    )
    return f"""{_LN_PREFIX}, marked AS (
  SELECT doc_id, n_tokens, pos, {flag} AS is_flagged
  FROM wins
), flagged AS (
  SELECT doc_id, n_tokens, pos FROM marked WHERE is_flagged{restrict}
){_LN_TAIL}"""


# gaps-and-islands span merge over a `flagged` CTE + the final per-doc
# census — shared by every ExactSubstr oracle variant
_LN_TAIL = f""", brk AS (
  SELECT doc_id, n_tokens, pos,
         CASE WHEN pos > coalesce(max(pos + {LN2_W}) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS b
  FROM flagged
), g AS (
  SELECT doc_id, n_tokens, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS isl
  FROM brk
), spans AS (
  SELECT doc_id, min(n_tokens) AS n_tokens,
         min(pos) AS s, max(pos) + {LN2_W} AS e
  FROM g GROUP BY doc_id, isl
)
SELECT doc_id, min(n_tokens) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(e - s) AS BIGINT) AS removed_tokens,
       md5(string_agg(CAST(s AS VARCHAR) || ':' || CAST(e AS VARCHAR),
                      ',' ORDER BY s)) AS span_digest
FROM spans GROUP BY doc_id ORDER BY doc_id
"""


def _st14_sql() -> str:
    """st14 oracle — the per-doc streaming probe semantics: a batch
    window is flagged iff it occurs anywhere in HISTORY (every batch
    occurrence removed: history precedes the batch in keep-first order)
    or repeats WITHIN its own document (non-first removed). No cross-doc
    batch state, so the microbatch split cannot change the answer."""
    return f"""{_LN_PREFIX}, bw AS (
  SELECT doc_id, n_tokens, pos, wh FROM wins
  WHERE {_LN_H32_DOC} % {NDSPLIT_MOD} = 0
), hw AS (
  SELECT DISTINCT wh FROM wins WHERE {_LN_H32_DOC} % {NDSPLIT_MOD} <> 0
), flagged AS (
  SELECT doc_id, n_tokens, pos FROM (
    SELECT b.doc_id, b.n_tokens, b.pos,
           min(b.pos) OVER (PARTITION BY b.doc_id, b.wh) AS first_pos,
           h.wh AS hwh
    FROM bw b LEFT JOIN hw h ON h.wh = b.wh
  ) WHERE hwh IS NOT NULL OR pos <> first_pos
){_LN_TAIL}"""

ORACLE = {
    "dd1_exact_groups": (
        "SELECT md5(text) AS digest, count(*) AS n_docs, min(doc_id) AS keep_id "
        "FROM documents GROUP BY digest ORDER BY digest"
    ),
    "dd10_containment": f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents
), grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - {_CGRAM - 2}), s ->
    md5(array_to_string(list_slice(t, s, s + {_CGRAM - 1}), ' '))))) AS g
  FROM toks WHERE len(t) >= {_CGRAM}
), freq AS (
  SELECT g, count(*) AS k FROM grams GROUP BY g
), rare AS (
  SELECT doc_id, g FROM grams JOIN freq USING (g) WHERE k <= {DF_CAP}
), sizes AS (
  SELECT doc_id, count(*) AS n FROM rare GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b, n_common, sa.n AS n_a, sb.n AS n_b,
       CAST(n_common AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE)
         AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common * 5 >= 4 * least(sa.n, sb.n)
ORDER BY doc_a, doc_b
""",
    "dd9_cluster_representatives": None,  # filled below (_QUALITY import)
    "fz1_fuzzy_name_match": (
        "WITH n AS (SELECT DISTINCT p_name FROM part) "
        "SELECT a.p_name AS name_a, b.p_name AS name_b, "
        "levenshtein(a.p_name, b.p_name) AS dist "
        "FROM n a JOIN n b "
        "ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1) "
        "AND a.p_name < b.p_name "
        "AND levenshtein(a.p_name, b.p_name) <= 4 "
        "ORDER BY name_a, name_b"
    ),
    "dd8_repetition_scrub": (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks "
        "FROM documents), "
        "k AS (SELECT doc_id, toks, "
        "list_filter(toks, (x, i) -> i = 1 OR x <> toks[i - 1]) AS kept "
        "FROM t) "
        "SELECT doc_id, len(toks) AS n_tokens, len(kept) AS n_kept, "
        "array_to_string(kept, ' ') AS clean_text "
        "FROM k ORDER BY doc_id"
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
, pairs AS (
  SELECT doc_a, doc_b, i / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
  FROM inter JOIN sizes sa ON inter.doc_a = sa.doc JOIN sizes sb ON inter.doc_b = sb.doc
  WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.8
)
SELECT doc_a, count(*) AS n_dups, max(jaccard) AS max_jaccard
FROM pairs GROUP BY doc_a ORDER BY doc_a
""",
    "ln1_span_dedup": f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), b AS (
  SELECT doc_id, i AS idx,
         array_to_string(toks[i * {SPAN_W} + 1 : i * {SPAN_W} + {SPAN_W}], ' ') AS block
  FROM t, LATERAL unnest(range(CAST(ceil(len(toks) / {float(SPAN_W)}) AS BIGINT))) u(i)
), h AS (
  SELECT doc_id, idx, block, md5(block) AS bh FROM b
), marked AS (
  SELECT doc_id, idx, block,
         row_number() OVER (PARTITION BY bh ORDER BY doc_id, idx) = 1 AS is_kept
  FROM h
)
SELECT doc_id,
       count(*) AS n_blocks,
       CAST(sum(CASE WHEN is_kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       md5(coalesce(array_to_string(list(CASE WHEN is_kept THEN block END ORDER BY idx)
           FILTER (WHERE is_kept), ' '), '')) AS clean_digest
FROM marked GROUP BY doc_id ORDER BY doc_id
""",
    "ln2_substring_dedup": _ln_sql(remove_all=False),
    "ln4_substring_probe": _ln_sql(remove_all=False, batch_only=True),
    "ln3_substring_remove_all": _ln_sql(remove_all=True),
    "fp1_winnowing_fps": f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {FP_BASE} AS doc_id, substr(text, 25, 220) AS text
  FROM documents WHERE doc_id % {FP_MOD} = {FP_OFF}
), t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM corpus
), th AS (
  SELECT doc_id, len(toks) AS n,
         list_transform(toks, t -> {_h32('t')}) AS th
  FROM t
), g AS (
  SELECT doc_id,
         list_transform(range(1, n - {FP_K} + 2), i -> {_FP_POLY}) AS gh
  FROM th WHERE n >= {FP_K}
), w AS (
  SELECT doc_id, CAST(len(gh) AS BIGINT) AS n_grams, gh,
         list_distinct(list_transform(range(1, len(gh) - {FP_W} + 2), j ->
           list_max(list_transform(range(0, {FP_W}), o ->
             CASE WHEN gh[j + o] = list_min(gh[j : j + {FP_W} - 1])
                  THEN j + o ELSE 0 END)))) AS sel
  FROM g WHERE len(gh) >= {FP_W}
), perdoc AS (
  SELECT doc_id, n_grams,
         list_distinct(list_transform(sel, p -> gh[p])) AS fps
  FROM w
), ex AS (
  SELECT doc_id, n_grams, unnest(fps) AS fp FROM perdoc
), dfc AS (
  SELECT fp, count(*) AS dfx FROM ex GROUP BY fp
)
SELECT doc_id, min(n_grams) AS n_grams,
       CAST(count(*) AS BIGINT) AS n_fps,
       CAST(sum(CASE WHEN dfx >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       CAST(max(dfx) AS BIGINT) AS max_df
FROM ex JOIN dfc USING (fp) GROUP BY doc_id ORDER BY doc_id
""",
    "nd1_incremental_neardup": f"""
WITH hashed AS (
  SELECT doc_id AS doc, list_transform({_DTOKENS}, t -> {_h32('t')}) AS base_h
  FROM documents
), sigs AS (
  SELECT doc,
    {_sig_cols}
  FROM hashed
), banded AS (
  SELECT *,
    {_band_cols}
  FROM sigs
), cls AS (
  SELECT *, ({_h32("CAST(doc AS VARCHAR)")} % {NDSPLIT_MOD} = 0) AS is_batch
  FROM banded
), m AS (
  SELECT b.doc AS batch_doc, a.doc AS index_doc, {_est_sim} AS est_sim
  FROM cls a JOIN cls b ON NOT a.is_batch AND b.is_batch AND ({_band_match})
  WHERE {_est_sim} >= 0.5
), per AS (
  SELECT batch_doc, count(*) AS n_matches, max(est_sim) AS max_est_sim
  FROM m GROUP BY batch_doc
)
SELECT doc AS batch_doc,
       coalesce(n_matches, 0) AS n_matches,
       coalesce(max_est_sim, 0.0) AS max_est_sim,
       CASE WHEN n_matches IS NULL THEN 1 ELSE 0 END AS is_novel
FROM (SELECT doc FROM cls WHERE is_batch) LEFT JOIN per ON doc = per.batch_doc
ORDER BY batch_doc
""",
    "dd4_minhash_lsh_pairs": f"""
WITH hashed AS (
  SELECT doc_id AS doc, list_transform({_DTOKENS}, t -> {_h32('t')}) AS base_h
  FROM documents
), sigs AS (
  SELECT doc,
    {_sig_cols}
  FROM hashed
), banded AS (
  SELECT *,
    {_band_cols}
  FROM sigs
)
, pairs AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, {_est_sim} AS est_sim
  FROM banded a JOIN banded b ON a.doc < b.doc AND ({_band_match})
  WHERE {_est_sim} >= 0.5
)
SELECT doc_a, count(*) AS n_pairs, max(est_sim) AS max_est_sim
FROM pairs GROUP BY doc_a ORDER BY doc_a
""",
    "dd7_dup_clusters": f"""
WITH RECURSIVE hashed AS (
  SELECT doc_id AS doc, list_transform({_DTOKENS}, t -> {_h32('t')}) AS base_h
  FROM documents
), sigs AS (
  SELECT doc,
    {_sig_cols}
  FROM hashed
), banded AS (
  SELECT *,
    {_band_cols}
  FROM sigs
), pairs AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b
  FROM banded a JOIN banded b ON a.doc < b.doc AND ({_band_match})
  WHERE {_est_sim} >= 0.5
), e AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
){minlabel_chain()}
SELECT doc_id AS node, coalesce(cluster, doc_id) AS cluster
FROM documents LEFT JOIN comp ON doc_id = comp.node
ORDER BY node
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
SELECT doc, CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
  AS BIGINT) AS simhash
FROM bits GROUP BY doc ORDER BY doc
""",
    "dd6_simhash_pairs": f"""
WITH th AS (
  SELECT doc_id AS doc, {_h32('token')} AS h
  FROM (SELECT doc_id, unnest({_DTOKENS}) AS token FROM documents)
), bits AS (
  SELECT doc, j, SUM(((h >> j) & 1) * 2 - 1) AS s
  FROM th CROSS JOIN (SELECT unnest(range(32)) AS j) js
  GROUP BY doc, j
), sk AS (
  SELECT doc, SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS simhash
  FROM bits GROUP BY doc
), blocked AS (
  SELECT doc, simhash, i AS block_idx,
         (simhash >> (i * {_BWIDTH})) & {(1 << _BWIDTH) - 1} AS block_val
  FROM sk CROSS JOIN (SELECT unnest(range({_NBLOCKS})) AS i) bi
), pairs AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
    CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
  FROM blocked a
  JOIN blocked b ON a.block_idx = b.block_idx AND a.block_val = b.block_val AND a.doc < b.doc
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {MAX_HAMMING}
)
SELECT doc_a, count(*) AS n_pairs, min(hamming) AS min_hamming
FROM pairs GROUP BY doc_a ORDER BY doc_a
""",
}


# dd9 oracle needs the quality-score SQL transliteration from the text
# module (same fragment tx2 is checked against)
from aristoteles_spark.queries.text import _QUALITY  # noqa: E402

ORACLE["dd9_cluster_representatives"] = f"""
WITH scored AS (
  SELECT doc_id, md5(text) AS digest, {_QUALITY} AS q FROM documents
), ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY digest ORDER BY q DESC, doc_id) AS rn,
    count(*) OVER (PARTITION BY digest) AS n_members
  FROM scored
)
SELECT doc_id AS rep_doc, n_members, q AS rep_quality
FROM ranked WHERE rn = 1 ORDER BY rep_doc
"""

# p8's oracle reuses dd7's full cluster-labeling query as a CTE (the
# banded MinHash pairs + min-label propagation chain), then applies the
# same cluster-hash split and leak census.
_DD7_BODY = ORACLE["dd7_dup_clusters"].replace("ORDER BY node", "")
ORACLE["p8_leakage_free_split"] = f"""
WITH labels AS (
{_DD7_BODY}
), toks AS (
  SELECT doc_id, len({_TOKENS}) AS n_tok FROM documents
), lab AS (
  SELECT t.doc_id, t.n_tok, l.cluster,
         CASE WHEN l.b <= 7 THEN 'train' WHEN l.b = 8 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT node, cluster,
               {_h32("CAST(cluster AS VARCHAR)", "split")} % {SPLIT_BUCKETS} AS b
        FROM labels) l
  JOIN toks t ON t.doc_id = l.node
), leaky AS (
  SELECT CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_leaky_clusters
  FROM (SELECT cluster, count(DISTINCT split) AS k FROM lab GROUP BY cluster)
), base AS (
  SELECT split, count(*) AS n_docs, count(DISTINCT cluster) AS n_clusters,
         CAST(sum(n_tok) AS BIGINT) AS total_tokens
  FROM lab GROUP BY split
)
SELECT b.split, b.n_docs, b.n_clusters, b.total_tokens,
       leaky.n_leaky_clusters
FROM base b CROSS JOIN leaky ORDER BY split
"""

# dd11's oracle: same signature CTE as dd4, buckets grouped per band on
# the raw signature columns, then the per-band census.
_DD11_BANDS = " UNION ALL ".join(
    f"SELECT {bi} AS band, count(*) AS k FROM sigs GROUP BY "
    + ", ".join(f"s{bi * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
    for bi in range(BANDS)
)
ORACLE["dd11_lsh_tuning"] = f"""
WITH hashed AS (
  SELECT doc_id AS doc, list_transform({_DTOKENS}, t -> {_h32('t')}) AS base_h
  FROM documents
), sigs AS (
  SELECT doc,
    {_sig_cols}
  FROM hashed
), buckets AS (
  {_DD11_BANDS}
)
SELECT CAST(band AS INT) AS band, count(*) AS n_buckets,
       CAST(sum(k) AS BIGINT) AS n_docs,
       CAST(max(k) AS BIGINT) AS max_bucket,
       CAST(sum((k * (k - 1)) // 2) AS BIGINT) AS candidate_pairs
FROM buckets GROUP BY band ORDER BY band
"""

ORACLE["dd12_lsh_quality"] = f"""
WITH sample AS (
  SELECT doc_id FROM documents
  ORDER BY {_h32("CAST(doc_id AS VARCHAR)")}, doc_id LIMIT {LSHQ_SAMPLE}
), sdocs AS (
  SELECT d.doc_id, d.text FROM documents d JOIN sample s USING (doc_id)
), toks AS (
  SELECT doc_id AS doc, unnest({_DTOKENS}) AS token FROM sdocs
), sizes AS (
  SELECT doc, count(*) AS sz FROM toks GROUP BY doc
), inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS i
  FROM toks a JOIN toks b ON a.token = b.token AND a.doc < b.doc
  GROUP BY 1, 2
), truth AS (
  SELECT doc_a, doc_b
  FROM inter JOIN sizes sa ON inter.doc_a = sa.doc
             JOIN sizes sb ON inter.doc_b = sb.doc
  WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= {LSHQ_T}
), hashed AS (
  SELECT doc_id AS doc, list_transform({_DTOKENS}, t -> {_h32('t')}) AS base_h
  FROM sdocs
), sigs AS (
  SELECT doc,
    {_sig_cols}
  FROM hashed
), banded AS (
  SELECT *,
    {_band_cols}
  FROM sigs
), lsh AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b
  FROM banded a JOIN banded b ON a.doc < b.doc AND ({_band_match})
  WHERE {_est_sim} >= {LSHQ_T}
), j AS (
  SELECT coalesce(t.doc_a, l.doc_a) AS doc_a,
         coalesce(t.doc_b, l.doc_b) AS doc_b,
         (t.doc_a IS NOT NULL) AS in_t, (l.doc_a IS NOT NULL) AS in_c
  FROM truth t FULL OUTER JOIN lsh l
    ON t.doc_a = l.doc_a AND t.doc_b = l.doc_b
), c AS (
  SELECT CAST(sum(CASE WHEN in_t THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         CAST(sum(CASE WHEN in_c THEN 1 ELSE 0 END) AS BIGINT) AS n_lsh,
         CAST(sum(CASE WHEN in_t AND in_c THEN 1 ELSE 0 END) AS BIGINT) AS n_tp
  FROM j
)
SELECT n_true, n_lsh, n_tp, n_lsh - n_tp AS n_fp, n_true - n_tp AS n_fn,
       CASE WHEN n_lsh = 0 THEN 0
            ELSE CAST(floor(n_tp * 1.0e6 / n_lsh) AS BIGINT) END
         AS precision_ppm,
       CASE WHEN n_true = 0 THEN 0
            ELSE CAST(floor(n_tp * 1.0e6 / n_true) AS BIGINT) END
         AS recall_ppm
FROM c
"""
