"""Web-corpus text extraction: HTML page -> visible text.

hx1 closes the loop between the WARC container format (io11) and the
text-curation stages (tx*/dd*): documents are rendered into a
deterministic HTML page template (title/script/style/nav/footer chrome
around escaped paragraph content), then recovered with the
functions/html.py extractor. The output asserts, per document, that

* the extracted text round-trips to the whitespace-normalized original
  (the extractor loses nothing), and
* none of the chrome leaks (script bodies, nav labels, footer copy) —
  the boilerplate-removal guarantee.

Both the page construction AND the extraction are plain
replace/regexp_replace chains, so the duckdb oracle runs the identical
transformation text — the extractor itself is what's being
cross-checked, not a fixture.

Scale shape: a pure per-row codegen pipeline over the scan — no shuffle,
no UDF; at 100 TB this runs at parquet-scan speed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aristoteles_spark.functions.html import (
    html_escape,
    html_title,
    html_to_text,
    sql_escape,
    sql_title,
    sql_to_text,
)
from aristoteles_spark.sources.parquet_source import fan_out, load_table

_PRE = (
    '<html><head><title>Doc '
)
_MID = (
    '</title><script>var x=1;</script><style>p{margin:0}</style></head>'
    '<body><nav><a href="/">home</a> | <a href="/about">about</a></nav><p>'
)
_POST = '</p><footer>&copy; 2026 example corp</footer></body></html>'


def q_html_extract(spark, sf_dir):
    d = fan_out(load_table(spark, sf_dir, "documents"))
    page = F.concat(
        F.lit(_PRE),
        F.col("doc_id").cast("string"),
        F.lit(_MID),
        F.replace(html_escape(F.col("text")), F.lit("\n"), F.lit("</p><p>")),
        F.lit(_POST),
    )
    staged = d.select(
        "doc_id",
        "text",
        page.alias("page"),
    ).select(
        "doc_id",
        "text",
        html_title(F.col("page")).alias("title"),
        html_to_text(F.col("page")).alias("extracted"),
    )
    norm = F.trim(F.regexp_replace("text", "[ \t\r\n]+", " "))
    return staged.select(
        "doc_id",
        "title",
        F.length("extracted").alias("n_chars"),
        F.md5(F.col("extracted").cast("binary")).alias("digest"),
        (F.col("extracted") == norm).cast("int").alias("roundtrip_ok"),
        (
            F.col("extracted").contains("example corp")
            | F.col("extracted").contains("var x=1")
            | F.col("extracted").contains("home")
        ).cast("int").alias("leaked_boilerplate"),
    ).orderBy("doc_id")


_PAGE_SQL = (
    "concat('" + _PRE + "', CAST(doc_id AS VARCHAR), '" + _MID.replace("'", "''")
    + "', replace(" + sql_escape("text") + ", chr(10), '</p><p>'), '"
    + _POST.replace("'", "''") + "')"
)

_HX1_SQL = f"""
WITH staged AS (
  SELECT doc_id, text,
         {sql_title('page')} AS title,
         {sql_to_text('page')} AS extracted
  FROM (SELECT doc_id, text, {_PAGE_SQL} AS page FROM documents)
)
SELECT doc_id, title,
       length(extracted) AS n_chars,
       md5(extracted) AS digest,
       CAST(extracted = trim(regexp_replace(text, '[ \\t\\r\\n]+', ' ', 'g')) AS INT)
         AS roundtrip_ok,
       CAST((contains(extracted, 'example corp')
             OR contains(extracted, 'var x=1')
             OR contains(extracted, 'home')) AS INT) AS leaked_boilerplate
FROM staged ORDER BY doc_id
"""

QUERIES = {"hx1_html_extract": q_html_extract}
ORACLE = {"hx1_html_extract": _HX1_SQL}
