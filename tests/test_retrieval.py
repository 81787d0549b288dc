"""Semantic checks for the retrieval queries (ir1/ir2) beyond the
oracle hash-match: ranking sanity, RRF fusion algebra, and the
engine-portability rule (no transcendental-of-data columns)."""

from __future__ import annotations

import pytest

from aristoteles_spark.queries.retrieval import (
    IR_QUERIES,
    LEG_K,
    RRF_K,
    TOP_K,
    q_bm25_search,
    q_hybrid_rrf,
)
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def bm25_rows(spark):
    return q_bm25_search(spark, SF_ORACLE).collect()


def test_bm25_topk_shape(bm25_rows):
    by_q = {}
    for r in bm25_rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {qid for qid, _ in IR_QUERIES}
    for qid, rows in by_q.items():
        ranks = [r["rank"] for r in rows]
        assert ranks == list(range(1, len(rows) + 1))
        assert len(rows) <= TOP_K
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)


def test_bm25_top_doc_contains_query_terms(spark, bm25_rows):
    """The #1 document for each query must contain at least one query
    term (BM25 scores only matched terms)."""
    from aristoteles_spark.functions.text import tokens
    from aristoteles_spark.sources.parquet_source import load_table
    from pyspark.sql import functions as F

    top = {r["query_id"]: r["doc_id"] for r in bm25_rows if r["rank"] == 1}
    d = load_table(spark, SF_ORACLE, "documents")
    toks = {
        r["doc_id"]: set(r["t"])
        for r in d.select("doc_id", tokens("text").alias("t"))
        .where(F.col("doc_id").isin(list(top.values())))
        .collect()
    }
    for qid, terms in IR_QUERIES:
        assert toks[top[qid]] & set(terms)


def test_rrf_scores_are_exact_rank_rationals(spark):
    """Every rrf value must equal 1/(K+rt) + 1/(K+rv) computed from the
    emitted ranks — the fusion is pure rank algebra, engine-portable."""
    rows = q_hybrid_rrf(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        expect = 0.0
        if r["rank_text"]:
            expect += 1.0 / (RRF_K + r["rank_text"])
        if r["rank_vec"]:
            expect = expect + 1.0 / (RRF_K + r["rank_vec"]) if r["rank_vec"] else expect
        assert r["rrf"] == expect
        assert 0 <= r["rank_text"] <= LEG_K
        assert 0 <= r["rank_vec"] <= LEG_K
        assert r["rank_text"] or r["rank_vec"]


def test_hybrid_both_legs_contribute(spark):
    """At the oracle scale some fused row must come from each leg alone
    and some from both — otherwise the fusion is vacuous."""
    rows = q_hybrid_rrf(spark, SF_ORACLE).collect()
    has_text_only = any(r["rank_text"] and not r["rank_vec"] for r in rows)
    has_vec_only = any(r["rank_vec"] and not r["rank_text"] for r in rows)
    has_both = any(r["rank_text"] and r["rank_vec"] for r in rows)
    assert has_text_only and has_vec_only and has_both


def test_html_extract_roundtrip_and_no_leak(spark):
    """hx1: every document round-trips through the page template and no
    chrome (script/nav/footer) text leaks into the extraction."""
    from aristoteles_spark.queries.web import q_html_extract
    from pyspark.sql import functions as F

    agg = (
        q_html_extract(spark, SF_ORACLE)
        .agg(
            F.min("roundtrip_ok").alias("rt"),
            F.max("leaked_boilerplate").alias("leak"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert agg["rt"] == 1 and agg["leak"] == 0 and agg["n"] > 0


def test_html_extract_handles_hostile_markup(spark):
    from pyspark.sql import functions as F

    """The extractor on markup the template never produces: nested
    blocks, attributes with '>', entities, multiline scripts."""
    from aristoteles_spark.functions.html import html_to_text

    page = (
        "<html><head><style>a{color:red}\n.b{}</style></head><body>"
        "<nav class='x'>Home | About</nav>"
        "<p>alpha &amp;&lt;tag&gt; beta</p>\n\n"
        "<script type='text/javascript'>\nif (a < b) { hide(); }\n</script>"
        "<div data-x='1'>gamma</div><footer>fine print</footer></body>"
    )
    df = spark.createDataFrame([(page,)], "page string")
    out = df.select(html_to_text(F.col("page")).alias("t")).collect()[0]["t"]
    assert out == "alpha &<tag> beta gamma"
