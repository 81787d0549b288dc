"""HTML boilerplate extraction as pure Catalyst column expressions.

The web-corpus stage between WARC ingest (io11) and text curation
(tx*/dd*): strip script/style/chrome blocks, drop tags, unescape the
core entities, normalize whitespace. All regexp/replace chains — JVM
codegen, zero Python, and every pattern is RE2-compatible (no
backreferences, no lookaround) so the duckdb oracle runs the IDENTICAL
pattern text. (Reference scope check: /root/reference/aristoteles has no
text processing at all — this is engine-extension surface.)

At 100 TB these run inside whole-stage codegen over the scan. The regex
cost is linear per byte; nothing here shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# block elements whose CONTENT is boilerplate, stripped wholesale.
# Expanded per-tag because RE2 (the oracle engine) has no backreferences.
_BLOCK_TAGS = ["script", "style", "head", "nav", "footer", "header", "aside"]

_WS = "[ \t\r\n]+"


def html_escape(c: Column) -> Column:
    """Minimal escaping for embedding text in HTML (&, <, > — & first)."""
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def html_unescape(c: Column) -> Column:
    """Inverse of html_escape (&amp; LAST, so &amp;lt; round-trips)."""
    c = F.replace(c, F.lit("&lt;"), F.lit("<"))
    c = F.replace(c, F.lit("&gt;"), F.lit(">"))
    return F.replace(c, F.lit("&amp;"), F.lit("&"))


def html_to_text(c: Column) -> Column:
    """Boilerplate-stripped visible text of an HTML page.

    Order matters: block contents go first (their text must never leak
    into the output), then remaining tags become spaces (so adjacent
    paragraphs don't concatenate), then entity unescape, then whitespace
    normalization."""
    for tag in _BLOCK_TAGS:
        c = F.regexp_replace(c, f"(?s)<{tag}[^>]*>.*?</{tag}>", " ")
    c = F.regexp_replace(c, "<[^>]+>", " ")
    c = html_unescape(c)
    return F.trim(F.regexp_replace(c, _WS, " "))


def html_title(c: Column) -> Column:
    return F.regexp_extract(c, "(?s)<title[^>]*>(.*?)</title>", 1)


# ------------------------------------------------------------- SQL twins
# duckdb transliterations using the IDENTICAL regex pattern text (RE2
# compiles the same escapes); replace() is plain substring replace in
# both engines.


def sql_escape(expr: str) -> str:
    return (
        "replace(replace(replace(" + expr + ", '&', '&amp;'), "
        "'<', '&lt;'), '>', '&gt;')"
    )


def sql_unescape(expr: str) -> str:
    return (
        "replace(replace(replace(" + expr + ", '&lt;', '<'), "
        "'&gt;', '>'), '&amp;', '&')"
    )


def sql_to_text(expr: str) -> str:
    for tag in _BLOCK_TAGS:
        expr = (
            f"regexp_replace({expr}, '(?s)<{tag}[^>]*>.*?</{tag}>', ' ', 'g')"
        )
    expr = f"regexp_replace({expr}, '<[^>]+>', ' ', 'g')"
    expr = sql_unescape(expr)
    return f"trim(regexp_replace({expr}, '[ \\t\\r\\n]+', ' ', 'g'))"


def sql_title(expr: str) -> str:
    return f"coalesce(regexp_extract({expr}, '(?s)<title[^>]*>(.*?)</title>', 1), '')"
