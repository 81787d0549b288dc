"""Text-analysis queries on the documents table + duckdb oracles.

Language-ID, quality scoring, token counting, fingerprinting — each a pure
column-expression pipeline (functions/text.py) with a value-exact SQL
transliteration.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aristoteles_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS_EN,
    fingerprint,
    langid_predict,
    mean_token_len,
    punct_ratio,
    quality_score,
    stopword_ratio,
    tokens,
)
from aristoteles_spark.sources.parquet_source import fan_out, load_table

_TOKENS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"


def q_token_stats(spark, sf_dir):
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = tokens("text")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("len_chars"),
        mean_token_len(toks).alias("mean_tok_len"),
    ).orderBy("doc_id")


def q_quality(spark, sf_dir):
    # two-stage projection: tokenizer + punct + stopword scan run ONCE,
    # the composite score reuses them (2x cheaper per row AND ~6x less
    # codegen than inlining the full expression tree per output column)
    d = fan_out(load_table(spark, sf_dir, "documents"))
    staged = d.select(
        "doc_id",
        "text",
        tokens("text").alias("toks"),
        punct_ratio("text").alias("punct_ratio"),
    ).withColumn("stopword_ratio", stopword_ratio(F.col("toks")))
    return staged.select(
        "doc_id",
        "punct_ratio",
        "stopword_ratio",
        quality_score(
            "text",
            toks=F.col("toks"),
            punct=F.col("punct_ratio"),
            sw_ratio=F.col("stopword_ratio"),
        ).alias("quality"),
    ).orderBy("doc_id")


def q_langid(spark, sf_dir):
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", langid_predict(tokens("text")).alias("pred_lang")).orderBy("doc_id")


def q_fingerprint(spark, sf_dir):
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", fingerprint("text").alias("fp")).orderBy("doc_id")


def q_regex_features(spark, sf_dir):
    d = fan_out(load_table(spark, sf_dir, "documents"))
    upper_stripped = F.regexp_replace("text", "[^A-Z]", "")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "[0-9]+", 0).alias("first_num"),
        F.when(
            F.length("text") > 0, F.length(upper_stripped) / F.length("text")
        )
        .otherwise(F.lit(0.0))
        .alias("upper_ratio"),
        F.col("text").contains("the").cast("int").alias("has_the"),
    ).orderBy("doc_id")


def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document. tf and df are computed in one
    exploded pass each; idf joins back on the token (shuffle on token —
    the natural key); top-k per doc via WindowGroupLimit (map-side
    partial top-k, no full sort).

    The idf is the RAW rarity ratio (n+1)/(df+1), not its log: JVM
    Math.log and libm ln differ by 1 ulp on some inputs (the round-2
    sf0.1 sweep caught exactly that here), so a log-idf score can't be
    value-hash-compared across engines — and a 1-ulp score difference
    can even flip a near-tie ranking. The ratio is an exact rational
    (one correctly-rounded division + multiply, engine-identical) and
    is monotone in the same direction, so the per-doc ranking it
    induces is a valid tf-idf-family ordering."""
    from pyspark.sql import Window

    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.select("doc_id", "token").distinct().groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = d.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * ((F.col("n_docs") + 1) / (F.col("df") + 1)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "rn", "token", "tfidf")
        .orderBy("doc_id", "rn")
    )


# GPT-2-style pretokenizer shape: contractions, space-prefixed letter/digit
# runs, punctuation runs. Alternation-only pattern (no lookarounds) so Java
# regex and RE2 agree byte-for-byte.
_BPE_PAT = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def q_bpe_token_count(spark, sf_dir):
    """BPE-ish token counting — the pretokenizer pass of an LLM data
    pipeline (whitespace token count alongside for the ratio)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_BPE_PAT)).alias("n_bpe"),
        F.size(tokens("text")).alias("n_ws"),
    ).orderBy("doc_id")


def q_curation_pipeline(spark, sf_dir):
    """End-to-end curation composite: keep each exact-dup cluster's
    representative (min doc_id per content digest), score quality and
    language in the same scan, keep good English docs, report the surviving
    mix per source. One digest shuffle + one tiny group-by — the shape of a
    real pretraining-mix job."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    digest = F.md5(F.col("text").cast("binary"))
    keep = (
        d.select(digest.alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    scored = d.join(keep, "doc_id").select(
        "doc_id",
        "source",
        quality_score("text").alias("q"),
        langid_predict(tokens("text")).alias("lang"),
    )
    return (
        scored.filter((F.col("q") >= 0.5) & (F.col("lang") == "en"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            # not F.avg: a float mean is summation-order dependent across
            # engines. Quantize q to 12 dp (exact for a [0,1] score — far
            # inside double precision), sum exactly, divide once.
            (
                F.sum(F.col("q").cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_quality"),
        )
        .orderBy("source")
    )


def q_bigram_topk(spark, sf_dir):
    """Corpus top-50 bigrams: adjacent-token pairs built in-row with
    zip_with over two array slices (pure codegen, no Python), then one
    explode + partial-agg count and a TakeOrdered top-k — the n-gram LM /
    collocation-mining primitive. Hot bigrams ('of the') are absorbed by
    map-side partial aggregation."""
    t = tokens("text")
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(50)
    )


def q_clean_normalize(spark, sf_dir):
    """Text cleaning — the first stage of any training-data pipeline:
    strip control characters, collapse whitespace runs, trim. All
    codegen'd regexp_replace (no UDF); the character classes are written
    with explicit hex/char ranges so Java regex (Spark) and RE2 (duckdb
    oracle) agree. Reports per-doc cleaned length + changed flag."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    ctrl = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
    ws = "[ \\t\\r\\n]+"
    cleaned = F.trim(
        F.regexp_replace(F.regexp_replace(F.col("text"), ctrl, ""), ws, " ")
    )
    return (
        d.select(
            "doc_id",
            F.length(cleaned).alias("clean_len"),
            F.lower(F.substring(cleaned, 1, 40)).alias("preview"),
            (cleaned != F.col("text")).alias("changed"),
        )
        .orderBy("doc_id")
    )


# Chunking geometry: 64-token windows every 48 tokens (16-token overlap).
_CHUNK, _STRIDE = 64, 48
# Packing budget: tokens per training sequence.
_PACK_BUDGET = 2048


def q_chunking(spark, sf_dir):
    """Fixed-window document chunking with overlap (chunk=64, stride=48)
    — the splitting step ahead of tokenization in an LLM data pipeline.
    Chunk starts are generated in-row with `sequence` and materialized by
    one posexplode; zero shuffle until the presentation sort. Each chunk
    carries its token count and an md5 digest of its joined tokens (the
    chunk-level dedup key downstream)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    withT = d.select("doc_id", tokens("text").alias("t")).filter(F.size("t") > 0)
    starts = F.sequence(F.lit(1), F.size("t"), F.lit(_STRIDE))
    chunks = F.transform(starts, lambda s: F.slice(F.col("t"), s, _CHUNK))
    return (
        withT.select("doc_id", F.posexplode(chunks).alias("chunk_id", "c"))
        .select(
            "doc_id",
            "chunk_id",
            F.size("c").alias("n_toks"),
            F.md5(F.concat_ws(" ", "c").cast("binary")).alias("digest"),
        )
        .orderBy("doc_id", "chunk_id")
    )


def q_sequence_packing(spark, sf_dir):
    """Sequence packing: concatenate documents in shard order and cut at
    fixed token budgets (2048) — how pretraining batches are formed. The
    pack a document belongs to is where its FIRST token lands in the
    concatenated stream: pack_id = floor(exclusive_running_tokens /
    budget). One window shuffle partitioned by the shard key (`source`) —
    each shard packs independently, so at scale parallelism = #shards —
    then a small groupBy that reuses the same partitioning."""
    from pyspark.sql import Window

    d = fan_out(load_table(spark, sf_dir, "documents"))
    base = d.select("doc_id", "source", F.size(tokens("text")).alias("n_tok"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    packed = base.withColumn(
        "pack_id", F.floor(prev / F.lit(_PACK_BUDGET)).cast("int")
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "pack_id")
    )


_GRAM = 8  # decontamination n-gram width


def _gram_hashes(t):
    """Distinct md5 hashes of all 8-token shingles of token array `t` —
    in-row `sequence`+`transform` (codegen, no UDF)."""
    n = F.size(t)
    return F.when(
        n >= _GRAM,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (_GRAM - 1)),
                lambda s: F.md5(F.concat_ws(" ", F.slice(t, s, _GRAM)).cast("binary")),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def q_contamination(spark, sf_dir):
    """Train/eval decontamination: flag training documents sharing any
    8-token shingle with a held-out eval slice (doc_id % 7 == 0) — the
    benchmark-leakage check every LLM data pipeline runs before training.
    Gram hashes are built in-row; the eval side is a fraction of the
    corpus (in production it is the tiny benchmark set), so its exploded
    gram set is broadcast — the big train side never shuffles. Reports
    per contaminated train doc the count of distinct shared grams and of
    eval docs hit."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    grams = d.select(
        "doc_id", F.explode(_gram_hashes(tokens("text"))).alias("g")
    )
    eval_g = grams.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("eval_id"), "g"
    )
    train_g = grams.filter(F.col("doc_id") % 7 != 0)
    return (
        train_g.join(F.broadcast(eval_g), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_shared_grams"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
        .orderBy("doc_id")
    )


# PII patterns: written in the common Java-regex / RE2 subset (character
# classes + bounded repeats, no lookaround) so Spark and the duckdb
# oracle execute the IDENTICAL pattern text.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IP = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
_PII_PHONE = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"


def q_pii_redaction(spark, sf_dir):
    """PII scrubbing — the redaction stage every training-data pipeline
    runs before release: emails / IPv4s / phone numbers replaced with
    typed placeholders, with per-doc match counts for audit. Pure
    codegen regexp_replace/regexp_count, zero shuffle. The test corpus
    is synthetic words, so deterministic PII is appended per row (both
    engines build the identical augmented text) — the oracle check is
    non-vacuous: every row has >=3 real redactions."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 tel 555-867-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _PII_EMAIL, "<EMAIL>"),
            _PII_IP, "<IP>",
        ),
        _PII_PHONE, "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_count(aug, F.lit(_PII_IP)).alias("n_ips"),
        F.regexp_count(aug, F.lit(_PII_PHONE)).alias("n_phones"),
        F.right(red, F.lit(60)).alias("tail_preview"),
    ).orderBy("doc_id")


def q_perplexity_filter(spark, sf_dir):
    """Perplexity-proxy quality filtering (the CCNet-style stage that
    scores documents under a corpus n-gram LM and drops the tails): an
    add-one-smoothed bigram model is fit on the corpus itself — bigram
    counts c2, unigram counts c1, vocab size V, all plain
    partial-aggregated groupBys — and each document is scored by its
    smoothed transition probabilities p = (c2+1)/(c1+V).

    Two scores, both chosen for bit-exact engine portability (JVM
    Math.log and libm ln disagree by 1 ulp on some inputs — measured —
    so transcendental outputs can't be value-hash-compared):
    - avg_prob: mean p. Each p is a single IEEE division (correctly
      rounded, identical in both engines); a distributed double SUM is
      order-dependent, so the per-doc reduction collects (pos, p),
      sorts in-row, and LEFT-FOLDS sequentially with F.aggregate — the
      same fold the oracle states via list_reduce(list(.. ORDER BY
      pos)).
    - surprisal_bits: sum of floor(log2(c1+V)) - floor(log2(c2+1)),
      an integer log-likelihood proxy computed EXACTLY via binary
      digit counts (length(bin(n)) in both engines) — no float at all.
    Shuffles: two model aggs + one doc agg, all map-side partial; the
    count joins stream the exploded bigrams once."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    t = tokens("text")
    toks = d.select("doc_id", t.alias("t"))
    n = F.size("t")
    bg_arr = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(
            F.element_at("t", i).alias("w1"),
            F.concat_ws(
                " ", F.element_at("t", i), F.element_at("t", i + 1)
            ).alias("bg"),
        ),
    )
    bgs = (
        toks.filter(n >= 2)
        .select("doc_id", F.posexplode(bg_arr).alias("pos", "b"))
        .select("doc_id", "pos", "b.w1", "b.bg")
    )
    uni = (
        toks.select(F.explode("t").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni.count()  # scalar model constant (vocab size)
    c2 = bgs.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    num = F.col("c2") + 1
    den = F.col("c1") + F.lit(vocab)
    scored = (
        bgs.join(c2, "bg")
        .join(uni, "w1")
        .select(
            "doc_id",
            "pos",
            (num / den).alias("p"),
            (F.length(F.bin(den)) - F.length(F.bin(num))).alias("bits"),
        )
    )
    folded = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "p"))),
            F.lit(0.0),
            lambda acc, x: acc + x["p"],
        ).alias("sum_p"),
        F.sum("bits").cast("long").alias("surprisal_bits"),
    )
    return folded.select(
        "doc_id",
        "n_bigrams",
        (F.col("sum_p") / F.col("n_bigrams")).alias("avg_prob"),
        "surprisal_bits",
    ).orderBy("doc_id")


def q_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty — the memorization-risk metric
    between pairwise dedup (dd*) and train/eval decontamination (ct1):
    for each document, the fraction of its distinct 8-gram shingles
    that also occur in at least one OTHER document. ONE exploded pass
    (round 10, guide §1.2): the gram-frequency count is a window over
    the gram key instead of a groupBy + join-back — the earlier
    formulation re-ran the tokenize+shingle subtree for each side of the
    join (2 corpus passes, measured 0.8–1.0 s each of nv1's 2.2 s);
    count(*) OVER (PARTITION BY g) is the same exact integer k on the
    same single exchange. The ratio is an exact integer division (single
    correctly-rounded double op, engine-identical)."""
    from pyspark.sql import Window

    d = fan_out(load_table(spark, sf_dir, "documents"))
    grams = d.select(
        "doc_id", F.explode(_gram_hashes(tokens("text"))).alias("g")
    )
    k = F.count(F.lit(1)).over(Window.partitionBy("g"))
    return (
        grams.select("doc_id", k.alias("k"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared"),
            (
                F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("dup_fraction"),
        )
        .orderBy("doc_id")
    )


def q_corpus_report(spark, sf_dir):
    """Corpus card: the one-row dataset summary a pipeline publishes
    with a release — size, vocabulary, duplication, language mix,
    quality yield. Composes the inventory's per-doc operators (digest
    dedup, lang-ID, quality score) into three independent aggregates
    (per-doc stats, vocabulary census, duplicate census) joined as
    1-row frames. All outputs are integer counts: per-doc doubles
    (quality) feed deterministic COMPARISONS, never a float SUM, so the
    report is engine-exact by construction."""
    from aristoteles_spark.functions.text import (
        langid_predict,
        quality_score,
        tokens,
    )

    d = fan_out(load_table(spark, sf_dir, "documents"))
    t = tokens("text")
    per_doc = d.select(
        "doc_id",
        F.size(t).alias("n_tok"),
        F.md5(F.col("text").cast("binary")).alias("digest"),
        langid_predict(t).alias("lang"),
        quality_score("text").alias("q"),
    )
    base = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("n_english"),
        F.sum(F.when(F.col("q") > 0.5, 1).otherwise(0))
        .cast("long")
        .alias("n_high_quality"),
    )
    vocab = (
        d.select(F.explode(t).alias("w"))
        .agg(F.count_distinct("w").alias("vocab_size"))
    )
    dup = (
        per_doc.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_exact_groups"),
            F.sum(F.when(F.col("k") > 1, F.col("k")).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
        )
    )
    return base.crossJoin(vocab).crossJoin(dup).select(
        "n_docs",
        "total_tokens",
        "vocab_size",
        "n_exact_groups",
        "n_dup_docs",
        "n_english",
        "n_high_quality",
    )


def q_negative_samples(spark, sf_dir):
    """Contrastive-training negative sampling: k=3 pseudo-random negative
    partner documents per document via a deterministic affine hash over
    the corpus size, self-matches re-rolled to the next id. Row-local
    arithmetic (one explode, zero shuffle besides the presentation sort) —
    the pair-generation step of contrastive/embedding training. The
    modular products stay within int64 here; a corpus where n*multiplier
    approaches 2^63 would split the multiply with repeated pmod."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    n = d.count()
    if n == 0:
        # no corpus -> no pairs; % 0 in the affine hash would raise
        # driver-side (round-6 empty-input sweep)
        return d.select(
            "doc_id",
            F.lit(1).alias("j"),
            F.col("doc_id").alias("neg_id"),
        ).limit(0)
    base = d.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.lit(3))).alias("j")
    )
    raw = F.pmod(
        F.pmod("doc_id", F.lit(n)) * F.lit(2654435761 % n)
        + F.col("j") * F.lit(40503),
        F.lit(n),
    )
    neg = F.when(raw == F.col("doc_id"), F.pmod(raw + 1, F.lit(n))).otherwise(raw)
    return base.select(
        "doc_id", "j", neg.cast("long").alias("neg_id")
    ).orderBy("doc_id", "j")


def q_sentence_stats(spark, sf_dir):
    """Sentence segmentation stats per document — the unit the
    quality/readability stage of a text pipeline works in: split on
    terminal punctuation runs ([.!?]+), trim, drop empties; report
    sentence count, total sentence characters, and the longest
    sentence. Pure in-row codegen (split + transform + filter +
    aggregate), zero shuffle, all-integer outputs — engine-exact by
    construction. The regex lives in the Java∩RE2 subset both engines
    parse identically (same constraint as tx12)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    sents = F.filter(
        F.transform(F.split(F.col("text"), r"[.!?]+"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    lens = F.transform(sents, lambda s: F.length(s))
    return d.select(
        "doc_id",
        F.size(sents).alias("n_sentences"),
        F.coalesce(
            F.aggregate(lens, F.lit(0), lambda a, x: a + x), F.lit(0)
        ).alias("total_sent_chars"),
        F.coalesce(F.array_max(lens), F.lit(0)).alias("max_sent_chars"),
    ).orderBy("doc_id")


def q_length_buckets(spark, sf_dir):
    """Length-bucketed batch forming (the padding-efficiency op every
    training loader runs): documents grouped into power-of-two token-
    length buckets, reporting per bucket the docs, token mass, bucket
    max, and the padding waste of pad-to-bucket-max batching — the
    number that justifies bucketing over naive global padding. The
    bucket id is ``length(bin(n_tok))`` (integer floor-log2 + 1 via the
    binary string — no transcendental log2, which differs by 1 ulp
    across libm builds). One partial-agg shuffle of a tiny key."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    n_tok = F.size(tokens("text"))
    b = d.select(
        F.greatest(n_tok, F.lit(1)).alias("n_tok")
    ).select("n_tok", F.expr("CAST(length(bin(n_tok)) AS INT)").alias("bucket"))
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
            F.max("n_tok").alias("max_tok"),
            (F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok"))
            .cast("long")
            .alias("padding_waste"),
        )
        .orderBy("bucket")
    )


CT2_BITS = 4096  # bloom size: 128 x 32-bit words, built as an ARRAY
CT2_WORDS = CT2_BITS // 32


def q_bloom_decontamination(spark, sf_dir):
    """Two-phase decontamination: a Bloom filter over the eval 8-gram
    set pre-screens train grams, and only Bloom candidates reach the
    exact semi-join — the composition that makes ct1 cheap at 100 TB
    (the filter is a few KB broadcast to every executor; the exact join
    sees only candidate grams). The final counts must equal the exact
    single-phase answer — Bloom can only over-admit, and the verify
    join removes every false positive — so the oracle (which runs the
    SAME two phases in SQL) pins both the filter arithmetic and the
    no-false-negative property. The filter is an ARRAY of 128 32-bit
    words (built per-word with bit_or, assembled with a dense range
    left-join so empty words are zeros), indexed with element_at on
    both engines — sizing the filter never grows the expression tree.
    Reports per train doc: bloom candidates vs exact shared grams."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    grams = d.select(
        "doc_id", F.explode(_gram_hashes(tokens("text"))).alias("g")
    )
    # the distinct eval gram set is the SMALL side (the benchmark set in
    # production) and feeds two consumers (filter build + verify join);
    # materialize it once rather than re-exploding the corpus per use
    from aristoteles_spark.operators.barrier import audit_barrier

    eval_g = audit_barrier(
        grams.filter(F.col("doc_id") % 7 == 0).select("g").distinct()
    )
    train_g = grams.filter(F.col("doc_id") % 7 != 0)

    from aristoteles_spark.functions.text import h32

    def pos(col, seed):
        return F.pmod(h32(col, seed), F.lit(CT2_BITS))

    contrib = eval_g.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.shiftright(pos(F.col("g"), s), 5).alias("w"),
                        pos(F.col("g"), s).bitwiseAND(F.lit(31)).alias("b"),
                    )
                    for s in (1, 2)
                ]
            )
        ).alias("x")
    ).select(F.col("x.w").alias("w"), F.col("x.b").alias("b"))
    words_sparse = contrib.groupBy("w").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))")).alias("bits")
    )
    words = (
        spark.range(CT2_WORDS)
        .withColumnRenamed("id", "w")
        .join(words_sparse, "w", "left")
        .select("w", F.coalesce("bits", F.lit(0)).alias("bits"))
        .groupBy()
        .agg(F.expr("array_sort(collect_list(struct(w, bits)))").alias("ws"))
        .select(F.expr("transform(ws, x -> x.bits)").alias("words"))
    )

    probed = (
        train_g.crossJoin(F.broadcast(words))
        .withColumn("p1", pos(F.col("g"), 1))
        .withColumn("p2", pos(F.col("g"), 2))
    )
    _bit = (
        "((element_at(words, CAST(shiftright({p}, 5) AS INT) + 1)"
        " >> CAST({p} & 31 AS INT)) & 1)"
    )
    hit = F.expr(f"{_bit.format(p='p1')} * {_bit.format(p='p2')}")
    # Bloom survivors are small by construction (that is the point of
    # the filter); barrier them so the candidate agg and the exact
    # verify join don't each re-run the train-side explosion + probe
    candidates = audit_barrier(probed.filter(hit == 1).select("doc_id", "g"))
    verified = candidates.join(eval_g, "g", "left_semi")
    return (
        candidates.groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_candidates"))
        .join(
            verified.groupBy("doc_id").agg(
                F.count_distinct("g").alias("n_shared_grams")
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            "n_candidates",
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
        )
        .orderBy("doc_id")
    )


# Shipped-tokenizer artifact: 12 merges trained once by
# operators/bpe.train_bpe(documents, "text", n_merges=12) on the sf0.01
# corpus (deterministic: count-desc / pair-asc tie-break). Fixed literals
# — exactly how a production pipeline applies a tokenizer (the merge
# table ships with the model; training it is operators/bpe.py, pinned
# against a pure-Python reference in tests/test_bpe.py).
_BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
    ("h", "</w>"), ("a", "t"), ("l", "u"), ("i", "n"),
]


def q_bpe_encode(spark, sf_dir):
    """tx14 — apply a trained BPE merge table to the whole corpus: the
    tokenizer-apply pass every pretraining pipeline runs before packing.

    Plan (100 TB shape): pure per-row codegen — the sentinel-wrapped
    replace chain (operators/bpe.py:bpe_tokens_replace_expr; one
    replace per merge rule, whole-stage codegen) — zero shuffles before
    the final sort. The higher-order aggregate() formulation evaluates
    interpreted and measured 35x at the 10x sweep; a long merge list
    would switch to the Arrow-batched bpe_encode_pandas seam.

    Determinism: tokens are exact strings; the digest is md5 of the
    space-joined token stream — no floats anywhere."""
    from aristoteles_spark.operators.bpe import bpe_tokens_replace_expr

    d = fan_out(load_table(spark, sf_dir, "documents"))
    base = d.select(
        "doc_id", bpe_tokens_replace_expr(F.col("text"), _BPE_MERGES).alias("toks")
    )
    return base.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.md5(F.array_join("toks", " ").cast("binary")).alias("digest"),
    ).orderBy("doc_id")


def _bpe_word_merge_sql() -> str:
    """Per-word BPE merge chain as duckdb SQL over a word variable ``w``:
    the word becomes a \x01-wrapped \x01\x01-joined symbol string; one
    left-to-right non-overlapping merge pass == one replace() of the
    wrapped pair (both engines' replace consumes matches left-to-right
    without re-scanning the replacement, exactly the pending-accumulator
    fold's semantics). The corpus contains no \x01 bytes (checked), so
    the sentinel is collision-free. Shared by tx14 and tv1."""
    X = chr(1)
    s = (
        "('" + X + "' || array_to_string(list_concat(string_split(w, ''),"
        " ['</w>']), '" + X + X + "') || '" + X + "')"
    )
    for a, b in _BPE_MERGES:
        s = (
            "replace(" + s + ", '" + X + a + X + X + b + X + "', '"
            + X + a + b + X + "')"
        )
    return s


def _bpe_oracle_sql() -> str:
    X = chr(1)
    s = _bpe_word_merge_sql()
    return f"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     w -> w <> '') AS ws
  FROM documents
), enc AS (
  SELECT doc_id,
         flatten(list_transform(ws,
             w -> string_split(trim({s}, '{X}'), '{X}{X}'))) AS toks
  FROM words
)
SELECT doc_id, len(toks) AS n_tokens,
       md5(array_to_string(toks, ' ')) AS digest
FROM enc ORDER BY doc_id
"""


def q_bpe_roundtrip(spark, sf_dir):
    """tx15 — BPE decode / detokenize round-trip census (the inverse of
    tx14, round-7 verdict item 6): every document is encoded with the
    shipped merge table and decoded back (operators/bpe.py:
    bpe_decode_expr — merge-table-free: merges only concatenate within
    a word, so word-end markers fully delimit the inverse). Per source:
    docs, docs surviving EXACT round-trip (must be all — the encode's
    only lossy step is its own lowercase+whitespace normalization,
    which the comparison target applies identically), and total token
    count. The byte-level identity is additionally pytest-pinned.

    Plan (100 TB shape): per-doc work is the tx14 codegen replace chain
    + three string ops for the decode; ONE partial-aggregated groupBy
    on the tiny source key."""
    from aristoteles_spark.operators.bpe import (
        bpe_decode_expr,
        bpe_tokens_replace_expr,
    )

    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = bpe_tokens_replace_expr(F.col("text"), _BPE_MERGES)
    norm = F.array_join(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != ""), " "
    )
    per = d.select(
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        (bpe_decode_expr(toks) == norm).cast("long").alias("rt_ok"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("rt_ok").alias("n_roundtrip_exact"),
        F.sum("n_tokens").alias("total_tokens"),
    ).orderBy("source")


def _bpe_roundtrip_oracle_sql() -> str:
    """tx15: tx14's per-word merge chain, decoded back by splitting the
    concatenated token stream at word-end markers — compared against
    the same lowercase+whitespace normalization the encode applies."""
    X = chr(1)
    s = _bpe_word_merge_sql()
    return f"""
WITH words AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     w -> w <> '') AS ws
  FROM documents
), enc AS (
  SELECT doc_id, source, ws,
         flatten(list_transform(ws,
             w -> string_split(trim({s}, '{X}'), '{X}{X}'))) AS toks
  FROM words
), per AS (
  SELECT source, CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN array_to_string(
                list_filter(string_split(array_to_string(toks, ''),
                                         '</w>'), w -> w <> ''), ' ')
              = array_to_string(ws, ' ') THEN 1 ELSE 0 END AS rt_ok
  FROM enc
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(rt_ok) AS BIGINT) AS n_roundtrip_exact,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM per GROUP BY source ORDER BY source
"""


def q_tokenizer_fertility(spark, sf_dir):
    """tv1 — tokenizer-fit census: per (source, lang), corpus totals and
    the two numbers that say whether a tokenizer suits a corpus —
    fertility (BPE tokens per whitespace word) and bytes per token —
    computed with the SHIPPED merge table actually applied (tx14's
    sentinel-replace chain, whole-stage codegen). The readout a
    pretraining team checks per language/source before committing a
    tokenizer to a 100 TB run: fertility spikes mean the vocabulary
    under-serves that slice (compute cost and effective context shrink).

    Scale design: all per-doc work is in-row codegen (replace chain +
    size/octet_length); ONE partial-aggregated groupBy on the tiny
    (source, lang) key. Ratios come from the summed integers as
    floor(1e6 * a / b) — a single exact double division + floor,
    cross-engine-exact (the mx1 rule)."""
    from aristoteles_spark.operators.bpe import bpe_tokens_replace_expr

    d = fan_out(load_table(spark, sf_dir, "documents"))
    per_doc = d.select(
        "source",
        "lang",
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != ""
            )
        ).alias("n_words"),
        F.size(bpe_tokens_replace_expr(F.col("text"), _BPE_MERGES)).alias(
            "n_tokens"
        ),
        F.octet_length("text").alias("n_bytes"),
    )
    totals = per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("words"),
        F.sum("n_tokens").cast("long").alias("tokens"),
        F.sum("n_bytes").cast("long").alias("bytes"),
    )
    return totals.select(
        "source",
        "lang",
        "n_docs",
        "words",
        "tokens",
        "bytes",
        F.when(F.col("words") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(F.col("tokens") * F.lit(1.0e6) / F.col("words")).cast("long")
        )
        .alias("fertility_ppm"),
        F.when(F.col("tokens") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(F.col("bytes") * F.lit(1.0e6) / F.col("tokens")).cast("long")
        )
        .alias("bytes_per_token_ppm"),
    ).orderBy("source", "lang")


# Shipped-vocabulary artifact for the OOV census: the 20 highest-
# frequency corpus tokens (trained once at sf0.01, fixed literals —
# how a tokenizer vocabulary ships). The synthetic corpus has 31
# distinct tokens, so the remaining 11 are genuinely out-of-vocabulary.
VO1_VOCAB = [
    "join", "hash", "row", "batch", "scan", "column", "customer",
    "filter", "small", "slow", "merge", "order", "vector", "line",
    "table", "data", "agg", "value", "key", "stream",
]


def q_oov_census(spark, sf_dir):
    """vo1 — out-of-vocabulary census: per (source, lang), how many
    token occurrences fall outside the shipped vocabulary — tv1's
    complement (fertility says how finely the tokenizer splits; OOV
    says what it cannot represent at all). The per-slice readout
    checked before committing a tokenizer to a new corpus source.

    Scale design: membership is an in-row filter against a broadcast
    literal array (a real 50k-entry vocabulary becomes one broadcast
    array — same plan); ONE tiny-key partial agg; oov_ppm =
    floor(1e6*a/b) on summed integers."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = tokens("text")
    vocab = F.array(*[F.lit(t) for t in VO1_VOCAB])
    per_doc = d.select(
        "source",
        "lang",
        F.size(toks).alias("n_toks"),
        F.size(
            F.filter(toks, lambda t: ~F.array_contains(vocab, t))
        ).alias("n_oov"),
    )
    totals = per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("tokens"),
        F.sum("n_oov").cast("long").alias("oov_tokens"),
    )
    return totals.select(
        "source",
        "lang",
        "n_docs",
        "tokens",
        "oov_tokens",
        F.when(F.col("tokens") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(F.col("oov_tokens") * F.lit(1.0e6) / F.col("tokens"))
            .cast("long")
        )
        .alias("oov_ppm"),
    ).orderBy("source", "lang")


QUERIES = {
    "vo1_oov_census": q_oov_census,
    "tv1_tokenizer_fertility": q_tokenizer_fertility,
    "tx14_bpe_encode": q_bpe_encode,
    "tx15_bpe_roundtrip": q_bpe_roundtrip,
    "tx13_sentence_stats": q_sentence_stats,
    "pk2_length_buckets": q_length_buckets,
    "ct2_bloom_decontamination": q_bloom_decontamination,
    "ns1_negative_samples": q_negative_samples,
    "tx1_token_stats": q_token_stats,
    "tx2_quality": q_quality,
    "tx3_langid": q_langid,
    "tx4_fingerprint": q_fingerprint,
    "tx5_regex_features": q_regex_features,
    "tx6_tfidf_top_terms": q_tfidf_top_terms,
    "tx7_bpe_token_count": q_bpe_token_count,
    "cp1_curation_pipeline": q_curation_pipeline,
    "tx8_bigram_topk": q_bigram_topk,
    "tx9_clean_normalize": q_clean_normalize,
    "tx10_chunking": q_chunking,
    "pk1_sequence_packing": q_sequence_packing,
    "ct1_contamination": q_contamination,
    "tx12_pii_redaction": q_pii_redaction,
    "px1_perplexity_filter": q_perplexity_filter,
    "cr1_corpus_report": q_corpus_report,
    "nv1_ngram_novelty": q_ngram_novelty,
}


def _sw_array(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_MEAN_TOK = (
    f"CASE WHEN len({_TOKENS}) > 0 THEN "
    f"list_sum(list_transform({_TOKENS}, t -> length(t))) / CAST(len({_TOKENS}) AS DOUBLE) "
    "ELSE 0.0 END"
)
_PUNCT = (
    "CASE WHEN length(text) > 0 THEN "
    "length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) / CAST(length(text) AS DOUBLE) "
    "ELSE 0.0 END"
)
_SW_RATIO = (
    f"CASE WHEN len({_TOKENS}) > 0 THEN "
    f"len(list_filter({_TOKENS}, t -> list_contains({_sw_array(STOPWORDS_EN)}, t))) "
    f"/ CAST(len({_TOKENS}) AS DOUBLE) ELSE 0.0 END"
)
_QUALITY = (
    f"(least(length(text) / 500.0, 1.0) "
    f"+ (1.0 - least(({_PUNCT}) * 5, 1.0)) "
    f"+ least(({_SW_RATIO}) * 4, 1.0) "
    f"+ (CASE WHEN ({_MEAN_TOK}) >= 3.0 AND ({_MEAN_TOK}) <= 10.0 THEN 1.0 ELSE 0.5 END)) / 4"
)

_LANG_SCORES = {
    lang: f"len(list_intersect(list_distinct({_TOKENS}), {_sw_array(markers)}))"
    for lang, markers in LANG_MARKERS.items()
}
_BEST = "greatest(" + ", ".join(_LANG_SCORES.values()) + ")"
_PRED_CASES = " ".join(
    f"WHEN ({_LANG_SCORES[lang]}) = ({_BEST}) THEN '{lang}'" for lang in LANG_MARKERS
)
_PRED = f"CASE WHEN ({_BEST}) > 0 THEN (CASE {_PRED_CASES} END) ELSE 'und' END"

def _ct2_h(seed: int, expr: str = "g") -> str:
    h = f"CAST(concat('0x', substr(md5(concat('{seed}:', {expr})), 1, 8)) AS BIGINT)"
    return f"({h} % {CT2_BITS})"


def _fertility_oracle_sql() -> str:
    X = chr(1)
    s = _bpe_word_merge_sql()
    return f"""
WITH words AS (
  SELECT source, lang,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     w -> w <> '') AS ws,
         octet_length(encode(text)) AS n_bytes
  FROM documents
), per_doc AS (
  SELECT source, lang, len(ws) AS n_words,
         len(flatten(list_transform(ws,
             w -> string_split(trim({s}, '{X}'), '{X}{X}')))) AS n_tokens,
         n_bytes
  FROM words
), totals AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_words) AS BIGINT) AS words,
         CAST(sum(n_tokens) AS BIGINT) AS tokens,
         CAST(sum(n_bytes) AS BIGINT) AS bytes
  FROM per_doc GROUP BY source, lang
)
SELECT source, lang, n_docs, words, tokens, bytes,
       CASE WHEN words = 0 THEN 0
            ELSE CAST(floor(tokens * 1.0e6 / words) AS BIGINT)
       END AS fertility_ppm,
       CASE WHEN tokens = 0 THEN 0
            ELSE CAST(floor(bytes * 1.0e6 / tokens) AS BIGINT)
       END AS bytes_per_token_ppm
FROM totals ORDER BY source, lang
"""


_VO1_VOCAB_SQL = "[" + ", ".join(f"'{t}'" for t in VO1_VOCAB) + "]"

ORACLE = {
    "vo1_oov_census": f"""
WITH t AS (
  SELECT source, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
), per_doc AS (
  SELECT source, lang, len(toks) AS n_toks,
         len(list_filter(toks,
             x -> NOT list_contains({_VO1_VOCAB_SQL}, x))) AS n_oov
  FROM t
), totals AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_toks) AS BIGINT) AS tokens,
         CAST(sum(n_oov) AS BIGINT) AS oov_tokens
  FROM per_doc GROUP BY source, lang
)
SELECT source, lang, n_docs, tokens, oov_tokens,
       CASE WHEN tokens = 0 THEN 0
            ELSE CAST(floor(oov_tokens * 1.0e6 / tokens) AS BIGINT) END
         AS oov_ppm
FROM totals ORDER BY source, lang
""",
    "tv1_tokenizer_fertility": _fertility_oracle_sql(),
    "tx14_bpe_encode": _bpe_oracle_sql(),
    "tx15_bpe_roundtrip": _bpe_roundtrip_oracle_sql(),
    "ct2_bloom_decontamination": f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents
), grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - {_GRAM - 2}), s ->
    md5(array_to_string(list_slice(t, s, s + {_GRAM - 1}), ' '))))) AS g
  FROM toks WHERE len(t) >= {_GRAM}
), eval_g AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0
), train_g AS (
  SELECT doc_id, g FROM grams WHERE doc_id % 7 <> 0
), contrib AS (
  SELECT h // 32 AS w,
         bit_or(CAST(1 AS BIGINT) << CAST(h % 32 AS INT)) AS bits
  FROM (
    SELECT {_ct2_h(1)} AS h FROM eval_g
    UNION ALL SELECT {_ct2_h(2)} FROM eval_g
  ) GROUP BY w
), bloom AS (
  SELECT list(coalesce(bits, 0) ORDER BY r.r) AS words
  FROM range({CT2_WORDS}) r(r) LEFT JOIN contrib ON contrib.w = r.r
), probe AS (
  SELECT doc_id, g, {_ct2_h(1)} AS p1, {_ct2_h(2)} AS p2 FROM train_g
), cand AS (
  SELECT doc_id, g FROM probe CROSS JOIN bloom
  WHERE ((words[CAST(p1 // 32 AS INT) + 1] >> CAST(p1 % 32 AS INT)) & 1)
      * ((words[CAST(p2 // 32 AS INT) + 1] >> CAST(p2 % 32 AS INT)) & 1) = 1
)
SELECT c.doc_id, count(DISTINCT c.g) AS n_candidates,
       count(DISTINCT CASE WHEN e.g IS NOT NULL THEN c.g END)
         AS n_shared_grams
FROM cand c LEFT JOIN eval_g e ON e.g = c.g
GROUP BY c.doc_id ORDER BY c.doc_id
""",
    "pk2_length_buckets": f"""
WITH b AS (
  SELECT greatest(len({_TOKENS}), 1) AS n_tok FROM documents
), k AS (
  SELECT n_tok, CAST(length(bin(n_tok)) AS INT) AS bucket FROM b
)
SELECT bucket, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS sum_tok,
       CAST(max(n_tok) AS BIGINT) AS max_tok,
       CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS padding_waste
FROM k GROUP BY bucket ORDER BY bucket
""",
    "tx13_sentence_stats": """
WITH s AS (
  SELECT doc_id,
         list_filter(list_transform(string_split_regex(text, '[.!?]+'),
                     x -> trim(x)), x -> x <> '') AS sents
  FROM documents
)
SELECT doc_id, CAST(len(sents) AS INT) AS n_sentences,
       CAST(coalesce(list_sum(list_transform(sents, x -> length(x))), 0)
            AS INT) AS total_sent_chars,
       CAST(coalesce(list_max(list_transform(sents, x -> length(x))), 0)
            AS INT) AS max_sent_chars
FROM s ORDER BY doc_id
""",
    "tx1_token_stats": (
        f"SELECT doc_id, len({_TOKENS}) AS n_tokens, "
        f"len(list_distinct({_TOKENS})) AS n_distinct, "
        f"length(text) AS len_chars, {_MEAN_TOK} AS mean_tok_len "
        "FROM documents ORDER BY doc_id"
    ),
    "tx2_quality": (
        f"SELECT doc_id, {_PUNCT} AS punct_ratio, {_SW_RATIO} AS stopword_ratio, "
        f"{_QUALITY} AS quality FROM documents ORDER BY doc_id"
    ),
    "tx3_langid": f"SELECT doc_id, {_PRED} AS pred_lang FROM documents ORDER BY doc_id",
    "tx4_fingerprint": (
        f"SELECT doc_id, md5(array_to_string({_TOKENS}, ' ')) AS fp "
        "FROM documents ORDER BY doc_id"
    ),
    "tx5_regex_features": (
        "SELECT doc_id, "
        "coalesce(regexp_extract(text, '[0-9]+'), '') AS first_num, "
        "CASE WHEN length(text) > 0 THEN "
        "length(regexp_replace(text, '[^A-Z]', '', 'g')) / CAST(length(text) AS DOUBLE) "
        "ELSE 0.0 END AS upper_ratio, "
        "CASE WHEN contains(text, 'the') THEN 1 ELSE 0 END AS has_the "
        "FROM documents ORDER BY doc_id"
    ),
    "tx7_bpe_token_count": (
        f"SELECT doc_id, len(regexp_extract_all(text, '{_BPE_PAT.replace(chr(39), chr(39) * 2)}')) AS n_bpe, "
        f"len({_TOKENS}) AS n_ws FROM documents ORDER BY doc_id"
    ),
    "cp1_curation_pipeline": f"""
WITH keep AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), scored AS (
  SELECT d.doc_id, d.source, {_QUALITY} AS q, {_PRED} AS lang
  FROM documents d JOIN keep USING (doc_id)
)
SELECT source, count(*) AS n_kept,
       CAST(sum(CAST(q AS DECIMAL(18,12))) AS DOUBLE) / count(*) AS avg_quality
FROM scored WHERE q >= 0.5 AND lang = 'en'
GROUP BY source ORDER BY source
""",
    "tx6_tfidf_top_terms": f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
), df AS (
  SELECT token, count(*) AS df FROM (SELECT DISTINCT doc_id, token FROM toks)
  GROUP BY token
), scored AS (
  SELECT tf.doc_id, tf.token,
         tf * (((SELECT count(*) FROM documents) + 1) / CAST(df + 1 AS DOUBLE)) AS tfidf
  FROM tf JOIN df ON tf.token = df.token
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
  FROM scored
)
SELECT doc_id, rn, token, tfidf FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn
""",
    "tx9_clean_normalize": (
        "SELECT doc_id, length(c) AS clean_len, "
        "lower(substring(c, 1, 40)) AS preview, c <> text AS changed FROM ("
        "  SELECT doc_id, text, trim(regexp_replace(regexp_replace(text, "
        "  '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g'), "
        "  '[ \\t\\r\\n]+', ' ', 'g')) AS c FROM documents) "
        "ORDER BY doc_id"
    ),
    "tx10_chunking": f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents
), starts AS (
  SELECT doc_id, t, unnest(range(1, len(t) + 1, {_STRIDE})) AS s
  FROM toks WHERE len(t) > 0
), ch AS (
  SELECT doc_id, CAST((s - 1) // {_STRIDE} AS INT) AS chunk_id,
         list_slice(t, s, least(s + {_CHUNK} - 1, len(t))) AS c
  FROM starts
)
SELECT doc_id, chunk_id, len(c) AS n_toks, md5(array_to_string(c, ' ')) AS digest
FROM ch ORDER BY doc_id, chunk_id
""",
    "pk1_sequence_packing": f"""
WITH base AS (
  SELECT doc_id, source, len({_TOKENS}) AS n_tok FROM documents
), packed AS (
  SELECT source, doc_id, n_tok,
         CAST(floor(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / {_PACK_BUDGET}.0) AS INT) AS pack_id
  FROM base
)
SELECT source, pack_id, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM packed GROUP BY source, pack_id ORDER BY source, pack_id
""",
    "ns1_negative_samples": """
WITH nn AS (SELECT count(*) AS n FROM documents),
js AS (SELECT unnest(range(1, 4)) AS j),
b AS (SELECT doc_id, j, n,
      ((doc_id % n) * (2654435761 % n) + j * 40503) % n AS r
      FROM documents CROSS JOIN js CROSS JOIN nn)
SELECT doc_id, CAST(j AS INT) AS j,
       CAST(CASE WHEN r = doc_id THEN (r + 1) % n ELSE r END AS BIGINT) AS neg_id
FROM b ORDER BY doc_id, j
""",
    "ct1_contamination": f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents
), grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - {_GRAM - 2}), s ->
    md5(array_to_string(list_slice(t, s, s + {_GRAM - 1}), ' '))))) AS g
  FROM toks WHERE len(t) >= {_GRAM}
)
SELECT t.doc_id, count(DISTINCT t.g) AS n_shared_grams,
       count(DISTINCT e.doc_id) AS n_eval_docs
FROM grams t JOIN grams e ON t.g = e.g
WHERE t.doc_id % 7 <> 0 AND e.doc_id % 7 = 0
GROUP BY t.doc_id ORDER BY t.doc_id
""",
    "nv1_ngram_novelty": f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents
), grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - {_GRAM - 2}), s ->
    md5(array_to_string(list_slice(t, s, s + {_GRAM - 1}), ' '))))) AS g
  FROM toks WHERE len(t) >= {_GRAM}
), freq AS (
  SELECT g, count(*) AS k FROM grams GROUP BY g
)
SELECT doc_id, count(*) AS n_grams,
       CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)
         AS dup_fraction
FROM grams JOIN freq USING (g)
GROUP BY doc_id ORDER BY doc_id
""",
    "cr1_corpus_report": f"""
WITH per_doc AS (
  SELECT doc_id, len({_TOKENS}) AS n_tok, md5(text) AS digest,
         {_PRED} AS lang, {_QUALITY} AS q
  FROM documents
), base AS (
  SELECT count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_english,
         CAST(sum(CASE WHEN q > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_high_quality
  FROM per_doc
), vocab AS (
  SELECT count(DISTINCT w) AS vocab_size
  FROM (SELECT unnest({_TOKENS}) AS w FROM documents)
), dup AS (
  SELECT count(*) AS n_exact_groups,
         CAST(sum(CASE WHEN k > 1 THEN k ELSE 0 END) AS BIGINT)
           AS n_dup_docs
  FROM (SELECT digest, count(*) AS k FROM per_doc GROUP BY digest)
)
SELECT n_docs, total_tokens, vocab_size, n_exact_groups, n_dup_docs,
       n_english, n_high_quality
FROM base CROSS JOIN vocab CROSS JOIN dup
""",
    "px1_perplexity_filter": f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents
), uni AS (
  SELECT w1, count(*) AS c1 FROM (SELECT unnest(t) AS w1 FROM toks) GROUP BY w1
), v AS (
  SELECT count(*) AS vocab FROM uni
), bgs AS (
  SELECT doc_id, i AS pos, t[i] AS w1, t[i] || ' ' || t[i + 1] AS bg
  FROM toks, unnest(range(1, len(t))) AS r(i) WHERE len(t) >= 2
), c2 AS (
  SELECT bg, count(*) AS c2 FROM bgs GROUP BY bg
), scored AS (
  SELECT doc_id, pos,
         (c2.c2 + 1) / CAST(uni.c1 + v.vocab AS DOUBLE) AS p,
         length(bin(uni.c1 + v.vocab)) - length(bin(c2.c2 + 1)) AS bits
  FROM bgs JOIN c2 USING (bg) JOIN uni USING (w1) CROSS JOIN v
), folded AS (
  SELECT doc_id, count(*) AS n_bigrams,
         0.0 + list_reduce(list(p ORDER BY pos), (a, b) -> a + b) AS sum_p,
         CAST(sum(bits) AS BIGINT) AS surprisal_bits
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_bigrams, sum_p / n_bigrams AS avg_prob, surprisal_bits
FROM folded ORDER BY doc_id
""",
    "tx12_pii_redaction": f"""
WITH aug AS (
  SELECT doc_id,
    text || ' contact user' || doc_id || '@example.com or 10.0.'
         || (doc_id % 256) || '.7 tel 555-867-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS a
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(a, '{_PII_EMAIL}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(a, '{_PII_IP}')) AS INT) AS n_ips,
  CAST(len(regexp_extract_all(a, '{_PII_PHONE}')) AS INT) AS n_phones,
  right(regexp_replace(regexp_replace(regexp_replace(a,
    '{_PII_EMAIL}', '<EMAIL>', 'g'), '{_PII_IP}', '<IP>', 'g'),
    '{_PII_PHONE}', '<PHONE>', 'g'), 60) AS tail_preview
FROM aug ORDER BY doc_id
""",
    "tx8_bigram_topk": f"""
WITH toks AS (
  SELECT {_TOKENS} AS t FROM documents
), bg AS (
  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))
    AS bigram
  FROM toks WHERE len(t) >= 2
)
SELECT bigram, count(*) AS n FROM bg
GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50
""",
}
