"""BPE trainer/tokenizer tests: the distributed trainer must produce
EXACTLY the merges of an independent pure-Python reference
implementation of the published algorithm on the same corpus, and the
two application seams (expression chain vs Arrow-batched Python) must
tokenize identically."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from aristoteles_spark.operators.bpe import (
    _END,
    bpe_encode_pandas,
    bpe_tokens_expr,
    train_bpe,
)

CORPUS = [
    "the cat sat on the mat",
    "the cats eat the fish",
    "low lower lowest",
    "newer newest new news",
    "the the the banana bandana",
    "low low low low",
]


def _reference_train(texts: list[str], n_merges: int, min_count: int = 2):
    """Independent reference: classic BPE (frequency table of words,
    argmax adjacent pair with (count DESC, pair ASC) tie-break,
    left-to-right non-overlapping merge)."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                vocab[tuple(list(w) + [_END])] += 1
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), _n = best
        merges.append((a, b))
        new_vocab: Counter = Counter()
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], "text string")


class TestTraining:
    def test_matches_reference_implementation(self, spark, corpus_df):
        got = train_bpe(corpus_df, "text", n_merges=12)
        want = _reference_train(CORPUS, 12)
        assert got == want

    def test_min_pair_count_stops_early(self, spark, corpus_df):
        got = train_bpe(corpus_df, "text", n_merges=500, min_pair_count=3)
        want = _reference_train(CORPUS, 500, min_count=3)
        assert got == want
        assert len(got) < 500

    def test_merges_on_real_documents_table(self, spark):
        """Smoke at realistic shape: trains on the sf0.001 documents
        corpus and agrees with the reference."""
        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        texts = [r.text for r in df.select("text").collect()]
        got = train_bpe(df, "text", n_merges=8)
        want = _reference_train(texts, 8)
        assert got == want


class TestApplication:
    def test_expression_and_pandas_seams_agree(self, spark, corpus_df):
        merges = train_bpe(corpus_df, "text", n_merges=10)
        via_expr = corpus_df.select(
            bpe_tokens_expr(F.col("text"), merges).alias("tokens")
        ).collect()
        via_pandas = (
            corpus_df.select("text")
            .mapInPandas(bpe_encode_pandas(merges), "tokens array<string>")
            .collect()
        )
        assert [r.tokens for r in via_expr] == [r.tokens for r in via_pandas]

    def test_tokens_reconstruct_text(self, spark, corpus_df):
        merges = train_bpe(corpus_df, "text", n_merges=10)
        rows = corpus_df.select(
            "text", bpe_tokens_expr(F.col("text"), merges).alias("tokens")
        ).collect()
        for r in rows:
            rebuilt = "".join(r.tokens).replace(_END, " ").strip()
            assert rebuilt == " ".join(r.text.lower().split())

    def test_trained_merges_compress(self, spark, corpus_df):
        """More merges -> no more tokens (monotone non-increasing)."""
        merges = train_bpe(corpus_df, "text", n_merges=12)
        n0 = corpus_df.select(
            F.size(bpe_tokens_expr(F.col("text"), [])).alias("n")
        ).agg(F.sum("n")).first()[0]
        n1 = corpus_df.select(
            F.size(bpe_tokens_expr(F.col("text"), merges)).alias("n")
        ).agg(F.sum("n")).first()[0]
        assert n1 < n0


def test_replace_chain_matches_aggregate_fold(spark):
    """The codegen scale path (sentinel-wrapped replace chain) must
    tokenize EXACTLY like the aggregate() pending-accumulator fold for
    any merge table, including same-symbol merges (aaa -> [aa, a])."""
    from pyspark.sql import functions as F

    from aristoteles_spark.operators.bpe import (
        bpe_tokens_expr,
        bpe_tokens_replace_expr,
    )

    texts = CORPUS + [
        "aaa aaaa baaab", "x", "", "  ", "low lowest slow",
        # round 6 (whole-string regex construction): edge shapes that
        # exercise trim/collapse/wrap/end-mark independently
        "  leading", "trailing  ", "\tmixed \n ws\r\n", "a", "a b",
        "über café",  # multi-byte chars wrap per CHARACTER, not byte
        "a.b (c)* [d]+ $e^",  # regex specials are data, not pattern
    ]
    merges = [("a", "a"), ("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"), ("low", "</w>")]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    bad = df.select(
        bpe_tokens_expr(F.col("text"), merges).alias("a"),
        bpe_tokens_replace_expr(F.col("text"), merges).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    assert bad.count() == 0


def _encode_word_ref(word, merges):
    """Independent pure-Python reference: sequential left-to-right
    non-overlapping merges (the published apply semantics)."""
    syms = list(word) + [_END]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_replace_chain_fuzzed_against_python_reference(spark):
    """Hypothesis fuzz over the round-6 whole-string regex construction:
    random texts (whitespace shapes, multi-byte chars, regex
    metacharacters — everything except the reserved \\x01-\\x03
    sentinels) x random sequential merge tables must tokenize exactly
    like the pure-Python reference. Batched: each example is ONE
    dataframe so the fuzz costs a handful of Spark jobs, not hundreds."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from aristoteles_spark.operators.bpe import bpe_tokens_replace_expr

    alphabet = st.sampled_from(list("abcé9 .()[]$^\\|*+?\t\n\r"))
    texts = st.lists(st.text(alphabet, max_size=24), min_size=1, max_size=8)
    sym = st.sampled_from(["a", "b", "c", "é", "9", ".", "aa", "ab", "a.", _END])
    merges = st.lists(st.tuples(sym, sym), max_size=6)

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(texts, merges)
    def run(ts, ms):
        df = spark.createDataFrame([(t,) for t in ts], "text string")
        got = [
            r.toks
            for r in df.select(
                bpe_tokens_replace_expr(F.col("text"), ms).alias("toks")
            ).collect()
        ]
        want = [
            [tok for w in t.lower().split() for tok in _encode_word_ref(w, ms)]
            for t in ts
        ]
        assert got == want, (ts, ms)

    run()


class TestDecode:
    def test_roundtrip_byte_identity_on_documents_table(self, spark):
        """tx15's property at the byte level: decode(encode(text)) ==
        lowercase(text) with whitespace collapsed, for EVERY document
        in the real test table."""
        from aristoteles_spark.operators.bpe import (
            bpe_decode_expr,
            bpe_tokens_replace_expr,
        )
        from aristoteles_spark.queries.text import _BPE_MERGES

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        toks = bpe_tokens_replace_expr(F.col("text"), _BPE_MERGES)
        norm = F.array_join(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != ""),
            " ",
        )
        bad = d.select(
            (bpe_decode_expr(toks) == norm).alias("ok")
        ).filter(~F.col("ok"))
        assert bad.count() == 0

    def test_roundtrip_random_texts_and_merges(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from aristoteles_spark.operators.bpe import (
            bpe_decode_expr,
            bpe_tokens_replace_expr,
        )

        alpha = st.text(alphabet="abc ", min_size=0, max_size=30)
        texts = st.lists(alpha, min_size=1, max_size=4)
        sym = st.sampled_from(["a", "b", "c", "ab", "bc", "</w>"])
        merges = st.lists(st.tuples(sym, sym), min_size=0, max_size=6)

        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(texts, merges)
        def run(ts, ms):
            df = spark.createDataFrame([(t,) for t in ts], "text string")
            rows = df.select(
                bpe_decode_expr(
                    bpe_tokens_replace_expr(F.col("text"), ms)
                ).alias("d"),
                F.array_join(
                    F.filter(
                        F.split(F.lower("text"), r"\s+"), lambda w: w != ""
                    ),
                    " ",
                ).alias("norm"),
            ).collect()
            assert all(r.d == r.norm for r in rows), (ts, ms)

        run()
