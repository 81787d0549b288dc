"""Distributed byte-pair-encoding (BPE) tokenizer training.

The real thing, not a regex approximation (tx7 covers that as an
oracle-checked query): iterative highest-frequency adjacent-pair
merging over the corpus, trained DISTRIBUTED —

1. the corpus collapses to a (word, count) frequency table (one
   shuffle; vocabulary is orders of magnitude smaller than the corpus,
   and every later iteration works on the vocab table only);
2. each iteration counts weighted adjacent symbol pairs (in-row
   zip_with over the symbol array, explode, map-side-combined groupBy)
   and picks the argmax with a deterministic (count DESC, pair ASC)
   tie-break via a single TakeOrdered(1);
3. the winning pair is merged into the symbol arrays IN-ROW with a
   Catalyst ``aggregate`` scan (pending-symbol accumulator — the
   classic left-to-right non-overlapping merge), no Python in the loop;
4. ``localCheckpoint`` every few rounds truncates the growing lineage
   (the same discipline as the connected-components loop).

Training cost: n_merges × (one explode+groupBy over the VOCAB + one
1-row TakeOrdered). Applying a trained merge table to new text uses
the same in-row merge expression chain (pure codegen) — or, for long
merge lists, the Arrow-batched ``bpe_encode_pandas`` seam.

The trained merges are exactly classic BPE (Sennrich et al. 2016,
published algorithm): ``tests/test_bpe.py`` pins equality against an
independent pure-Python reference on the same corpus.

The reference has no tokenizer (weather floats only); this serves the
engine's text-pipeline surface (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_END = "</w>"  # word-end marker, per the published algorithm


def _merge_pair_expr(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) into a+b
    over a symbol array — a single Catalyst aggregate() scan with a
    (output, pending) accumulator; '' marks no pending symbol."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit("").alias("pend"),
        ),
        lambda acc, s: F.when(
            (acc["pend"] == F.lit(a)) & (s == F.lit(b)),
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit("").alias("pend"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["pend"] == F.lit(""), acc["out"]
                ).otherwise(F.concat(acc["out"], F.array(acc["pend"]))).alias(
                    "out"
                ),
                s.alias("pend"),
            )
        ),
        lambda acc: F.when(acc["pend"] == F.lit(""), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        ),
    )


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) over whitespace-split lowercased words — the only
    corpus-sized shuffle in training."""
    return (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges; returns them in training order."""
    words = word_freq_table(df, text_col).select(
        F.concat(
            F.split(F.col("word"), ""),  # characters
            F.array(F.lit(_END)),
        ).alias("syms"),
        "cnt",
    )
    words = words.persist()
    words.count()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pairs = words.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
            "cnt",
        ).groupBy("p").agg(F.sum("cnt").alias("n"))
        best = pairs.orderBy(
            F.col("n").desc(), F.col("p.a"), F.col("p.b")
        ).first()
        if best is None or best["n"] < min_pair_count:
            break
        a, b = best["p"]["a"], best["p"]["b"]
        merges.append((a, b))
        prev = words
        words = words.select(
            _merge_pair_expr(F.col("syms"), a, b).alias("syms"), "cnt"
        )
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()  # truncate lineage
        else:
            words = words.persist()
        words.count()
        prev.unpersist()
    words.unpersist()
    return merges


def bpe_tokens_expr(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Tokenize one (lowercased, whitespace-split) text column with a
    trained merge list — a pure expression chain (one aggregate() scan
    per merge), suitable for short merge lists; flattens per-word
    symbol arrays into one token array."""
    words = F.filter(
        F.split(F.lower(text), r"\s+"), lambda w: w != F.lit("")
    )
    syms = F.transform(
        words, lambda w: F.concat(F.split(w, ""), F.array(F.lit(_END)))
    )
    for a, b in merges:
        syms = F.transform(syms, lambda s: _merge_pair_expr(s, a, b))
    return F.flatten(syms)


def bpe_encode_pandas(merges: list[tuple[str, str]]):
    """Arrow-batched tokenizer for LONG merge lists: returns a
    mapInPandas-compatible ``(iterator of pdf with 'text') -> iterator
    of pdf with 'tokens'`` function. Applies merges SEQUENTIALLY in
    training order — the same semantics as ``bpe_tokens_expr``'s
    expression chain by construction, so the two seams are
    interchangeable (pinned by tests). The seam mirrors the multimodal
    codec stages."""

    def encode_word(word: str) -> list[str]:
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

    def fn(it):
        import pandas as pd

        for pdf in it:
            toks = [
                [
                    t
                    for w in str(x).lower().split()
                    for t in encode_word(w)
                ]
                for x in pdf["text"]
            ]
            yield pd.DataFrame({"tokens": toks})

    return fn


# sentinels for the replace-chain tokenizer; absent from any text corpus
# that survived curation (control bytes) — callers on untrusted bytes
# should strip \x00-\x08 first (hx1's extractor already does for HTML)
_S = "\x01"   # symbol boundary
_W = "\x02"  # word boundary
_T = "\x03"  # transient symbol separator for the final split


def bpe_tokens_replace_expr(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Tokenize with a trained merge table as a REPLACE CHAIN — the
    scale path. ``bpe_tokens_expr``'s per-word ``aggregate()`` scans
    evaluate as interpreted higher-order lambdas (12 chained per-word
    folds measured 35x at the 10x sweep); this formulation is the same
    algorithm as a flat string pipeline in whole-stage codegen:

    each word becomes ``\x01 c1 \x01\x01 c2 ... \x01\x01 </w> \x01``
    (every symbol wrapped in sentinels), one merge pass == one
    ``replace`` of the wrapped pair (left-to-right non-overlapping ==
    the pending-accumulator fold's semantics, and exactly what the SQL
    oracle does), then the sentinels collapse into one split.

    Equality with ``bpe_tokens_expr`` is pinned in tests/test_bpe.py.

    Construction (round 6): four WHOLE-STRING compiled regex passes —
    trim, collapse whitespace to the word sentinel, wrap every char in
    symbol sentinels, insert the wrapped ``</w>`` at word ends. The
    previous per-word formulation (split -> filter HOF -> transform HOF
    with a lookaround regexp_replace per word -> array_join) evaluated
    the transform lambda INTERPRETED per word (HOFs never codegen —
    the §8.7 cliff), which was the measured dominant cost of tv1/tx14's
    100x CPU wall. Whole-string regexp_replace is one compiled pattern
    per pass inside whole-stage codegen; output strings are pinned
    byte-identical to the per-word construction (tests/test_bpe.py)."""
    t = F.regexp_replace(F.lower(text), r"^\s+|\s+$", "")
    t = F.regexp_replace(t, r"\s+", _W)
    # wrap every in-word char c as \x01 c \x01 — adjacent symbols then
    # share a \x01\x01 boundary, exactly the per-word wrapped form
    t = F.regexp_replace(t, f"([^{_W}])", _S + "$1" + _S)
    # word end: the char before a word sentinel / end-of-string is
    # always the word's final \x01 — append the wrapped </w> there
    s = F.regexp_replace(t, f"(?<={_S})(?={_W}|$)", _S + _END + _S)
    for a, b in merges:
        s = F.replace(s, F.lit(_S + a + _S + _S + b + _S), F.lit(_S + a + b + _S))
    s = F.replace(s, F.lit(_S + _S), F.lit(_T))
    s = F.replace(s, F.lit(_S), F.lit(""))
    return F.filter(F.split(s, f"[{_W}{_T}]"), lambda t: t != F.lit(""))


def bpe_decode_expr(toks: Column) -> Column:
    """Detokenize a BPE token array back to text (tx15) — the exact
    inverse of the encode pass up to its normalization: merges only
    ever concatenate symbols WITHIN a word (the </w> marker is the
    word's last symbol), so decoding is merge-table-free and O(bytes):
    concatenate the token stream, split at the word-end markers, join
    the recovered words with single spaces. decode(encode(t)) equals
    lowercase(t) with whitespace collapsed — byte-identical, pinned in
    tests/test_bpe.py and census-checked across the corpus by tx15.

    Plan: three codegen string ops per row (join/split/join), zero
    shuffle — runs at scan speed at any corpus size."""
    words = F.filter(
        F.split(F.array_join(toks, ""), _END), lambda w: w != F.lit("")
    )
    return F.array_join(words, " ")
