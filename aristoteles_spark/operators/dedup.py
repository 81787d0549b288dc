"""Deduplication operators for large-scale document corpora.

Every variant is a DataFrame composition designed for the 100 TB shape:

- exact:       hash-groupBy on a content digest — one shuffle on the digest,
               map-side partial agg keeps it skew-tolerant (identical docs
               hash to one key; a hot key means real duplicates, which the
               min-aggregation handles without collecting rows).
- ngram Jaccard: inverted-index self-join (doc,token) — the classic
               candidate-generation shuffle keyed by token; frequent-token
               pruning caps the worst-case fanout.
- MinHash+LSH: per-doc signatures computed IN-ROW (no shuffle), then one
               explode×bands shuffle to bucket candidates; pair verification
               on the signature, not the raw text.
- SimHash:     per-doc 32-bit sketch in-row; near-dup pairs via banded
               prefix blocking + Hamming filter.

Hashes are md5-derived (functions/text.py:h32) so results are engine-
portable and oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aristoteles_spark.functions.text import (
    distinct_tokens,
    fingerprint,
    h32,
    minhash_signature,
    simhash32,
)


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by content digest; keep the min id as the representative.

    Returns (digest, n_docs, keep_id). One shuffle on the digest.
    """
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def normalized_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on the normalized-token fingerprint (case/punct/ws
    insensitive)."""
    return (
        df.select(fingerprint(text_col).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    max_token_freq: int | None = None,
) -> DataFrame:
    """Candidate pairs by token-inverted-index join + exact Jaccard.

    jaccard(A,B) = |A∩B| / (|A|+|B|-|A∩B|) over distinct token sets.
    ``max_token_freq`` drops tokens appearing in more than that many docs
    (stopword-like tokens explode the join at scale; dropping them only
    loses pairs whose entire overlap is ubiquitous tokens).
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    # AllPairs/PPJoin prefix filtering — EXACT for the given threshold.
    # A naive token-inverted-index join explodes on ubiquitous tokens
    # (a token present in all N docs contributes N^2 candidate rows).
    # Instead, sort each doc's tokens by global rarity and index only the
    # first |A| - ceil(t*|A|) + 1 (the "prefix"): any pair with J >= t
    # provably shares its globally-smallest common token within both
    # prefixes, and prefix tokens are the RAREST ones, so the index join
    # fans out minimally. Verification is an in-row array_intersect.
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(distinct_tokens(text_col)).alias("token")
    )
    if max_token_freq is not None:
        freq0 = toks.groupBy("token").agg(F.count("*").alias("df"))
        toks = toks.join(
            F.broadcast(freq0.filter(F.col("df") <= max_token_freq).select("token")), "token"
        )
    # persist: consumed by the df-count aggregation AND the probe side of
    # the rarity join — without it the tokenize+explode runs twice
    toks = toks.persist()
    freq = toks.groupBy("token").agg(F.count("*").alias("df"))
    # per-doc token array sorted by (rarity, token): struct sort is
    # lexicographic on fields, giving one global total order. The rarity
    # join is left to Catalyst/AQE (measured: forcing a broadcast of freq
    # was slower here — the probe side re-shuffles by doc right after
    # anyway, so saving the token shuffle buys nothing).
    docs = (
        toks.join(freq, "token")
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("df", "token"))).alias("st"))
        .select(
            "doc",
            F.transform("st", lambda x: x["token"]).alias("toks"),
            F.size("st").alias("sz"),
        )
        .persist()  # consumed by the prefix index and twice in verification
    )
    prefix_len = F.col("sz") - F.ceil(F.col("sz") * threshold).cast("int") + 1
    index = docs.select(
        "doc", "sz", F.explode(F.slice("toks", 1, prefix_len)).alias("token")
    )
    a, b = index.alias("a"), index.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc") < F.col("b.doc"))
            # size filter: J >= t forces t*max(|A|,|B|) <= min(|A|,|B|)
            & (F.col("a.sz") >= threshold * F.col("b.sz"))
            & (F.col("b.sz") >= threshold * F.col("a.sz")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    da = docs.select(F.col("doc").alias("doc_a"), F.col("toks").alias("toks_a"), F.col("sz").alias("sz_a"))
    db = docs.select(F.col("doc").alias("doc_b"), F.col("toks").alias("toks_b"), F.col("sz").alias("sz_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    return (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .withColumn(
            "jaccard",
            inter / (F.col("sz_a") + F.col("sz_b") - inter).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", num_hashes: int = 16
) -> DataFrame:
    """(id, sig array<long>) — computed in-row, zero shuffle."""
    return df.select(
        F.col(id_col).alias("doc"),
        minhash_signature(distinct_tokens(text_col), num_hashes).alias("sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH-banded candidate pairs with signature-estimated similarity.

    Signature rows are grouped into ``bands`` bands of num_hashes/bands
    values; docs sharing any band's digest become candidates (one shuffle
    keyed by (band, digest)); est_sim = matching signature positions /
    num_hashes. Returns (doc_a, doc_b, est_sim), doc_a < doc_b.
    """
    rows_per_band = num_hashes // bands
    # persist: the self-join consumes the signatures on BOTH sides; without
    # this, Spark recomputes the full tokenize+hash subtree twice. At scale
    # signatures would be written to a table between the two stages.
    sigs = minhash_signatures(df, text_col, id_col, num_hashes).persist()
    band_digest = [
        F.md5(
            F.array_join(
                F.transform(
                    F.slice("sig", b * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).cast("binary")
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sigs.select(
        "doc",
        "sig",
        F.posexplode(F.array(*band_digest)).alias("band_idx", "digest"),
    )
    a, b_ = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.digest") == F.col("b.digest"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return cand.select(
        "doc_a", "doc_b", (matches / F.lit(float(num_hashes))).alias("est_sim")
    ).filter(F.col("est_sim") >= threshold)


def simhash_sketches(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash bigint) — 32-bit sketch per doc, in-row."""
    return df.select(
        F.col(id_col).alias("doc"), simhash32(distinct_tokens(text_col)).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance with banded blocking.

    The 32-bit sketch splits into (max_hamming+1) blocks; by pigeonhole any
    pair within max_hamming agrees on >=1 whole block, so candidates are
    generated by a block-equality join (shuffle keyed by (block_idx,
    block_value)) instead of a cross join. Returns (doc_a, doc_b, hamming).
    """
    nblocks = max_hamming + 1
    width = 32 // nblocks + (1 if 32 % nblocks else 0)
    sk = simhash_sketches(df, text_col, id_col)
    blocks = F.array(
        *[
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit((1 << width) - 1))
            for i in range(nblocks)
        ]
    )
    blocked = sk.select("doc", "simhash", F.posexplode(blocks).alias("block_idx", "block_val"))
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
