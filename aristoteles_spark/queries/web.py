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
from aristoteles_spark.functions.url import (
    canonical_url,
    sql_canonical_url,
    sql_url_host,
    url_host,
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

def _messy_url():
    """Deterministic messy-URL synthesis from (doc_id, source) — the
    crawl-side noise canonical_url must normalize away: mixed-case
    scheme/host, sporadic `www.`, default and non-default ports,
    duplicate and trailing slashes, shuffled query parameters, utm_*
    tracking params, fragments. The construction is plain concat/CASE,
    mirrored literally in the oracle SQL (the hx1 pattern: the
    *canonicalizer* is what's under test, not a fixture)."""
    did = F.col("doc_id")
    scheme = F.when(did % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http"))
    host = F.concat(
        F.when(did % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.when(did % 3 == 0, F.lit(".Example.COM")).otherwise(F.lit(".example.com")),
    )
    port = (
        F.when((did % 5 == 0) & (did % 2 == 0), F.lit(":443"))
        .when(did % 5 == 0, F.lit(":80"))
        .when(did % 10 == 7, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.when(did % 9 == 0, F.lit("/a//")).otherwise(F.lit("/a/")),
        (did % 50).cast("string"),
        F.when(did % 7 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    base = F.concat(F.lit("id="), (did % 25).cast("string"))
    utm = F.concat(F.lit("utm_source=feed&utm_campaign=c"), (did % 3).cast("string"))
    query = F.concat(
        F.when(did % 4 == 1, F.concat(utm, F.lit("&"), base))
        .when(did % 2 == 1, F.concat(base, F.lit("&"), utm))
        .otherwise(base),
        F.when(did % 11 == 0, F.lit("&ref=rss")).otherwise(F.lit("")),
    )
    frag = F.when(did % 13 == 0, F.concat(F.lit("#s"), (did % 6).cast("string"))).otherwise(
        F.lit("")
    )
    return F.concat(scheme, F.lit("://"), host, port, path, F.lit("?"), query, frag)


def q_url_canonicalize(spark, sf_dir):
    """url1 — canonical-URL dedup census per domain: documents get a
    deterministic messy URL, the canonicalizer collapses the noise, and
    the census counts how many raw variants fold into how many
    canonical pages per (canonical) host.

    Scale shape: the synthesis + canonicalization chain is pure per-row
    codegen over the scan (regexp/split/sort/join — no UDF); the census
    is one partial aggregate keyed by (domain, canonical_url) then one
    keyed by domain — both map-side combinable. At 100 TB this is the
    cheapest dedup key available and the standard first pass before
    content-level dedup (dd1/dd4)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    u = d.select(
        url_host(_messy_url()).alias("domain"),
        canonical_url(_messy_url()).alias("curl"),
    )
    per_page = u.groupBy("domain", "curl").agg(F.count(F.lit(1)).alias("n_variants"))
    return (
        per_page.groupBy("domain")
        .agg(
            F.sum("n_variants").cast("long").alias("n_raw"),
            F.count(F.lit(1)).alias("n_canonical"),
            (F.sum("n_variants") - F.count(F.lit(1))).cast("long").alias("n_dup_rows"),
            F.max(F.col("n_variants")).cast("long").alias("max_variants"),
            F.min("curl").alias("sample_url"),
        )
        .orderBy("domain")
    )


_URL_SQL = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END || '://'"
    " || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END || source"
    " || CASE WHEN doc_id % 3 = 0 THEN '.Example.COM' ELSE '.example.com' END"
    " || CASE WHEN doc_id % 5 = 0 AND doc_id % 2 = 0 THEN ':443'"
    "         WHEN doc_id % 5 = 0 THEN ':80'"
    "         WHEN doc_id % 10 = 7 THEN ':8080' ELSE '' END"
    " || CASE WHEN doc_id % 9 = 0 THEN '/a//' ELSE '/a/' END"
    " || CAST(doc_id % 50 AS VARCHAR)"
    " || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END || '?'"
    " || CASE WHEN doc_id % 4 = 1 THEN"
    "      'utm_source=feed&utm_campaign=c' || CAST(doc_id % 3 AS VARCHAR)"
    "      || '&id=' || CAST(doc_id % 25 AS VARCHAR)"
    "    WHEN doc_id % 2 = 1 THEN"
    "      'id=' || CAST(doc_id % 25 AS VARCHAR)"
    "      || '&utm_source=feed&utm_campaign=c' || CAST(doc_id % 3 AS VARCHAR)"
    "    ELSE 'id=' || CAST(doc_id % 25 AS VARCHAR) END"
    " || CASE WHEN doc_id % 11 = 0 THEN '&ref=rss' ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN '#s' || CAST(doc_id % 6 AS VARCHAR)"
    "    ELSE '' END)"
)

_URL1_SQL = f"""
WITH u AS (
  SELECT {sql_url_host(_URL_SQL)} AS domain,
         {sql_canonical_url(_URL_SQL)} AS curl
  FROM documents
), per_page AS (
  SELECT domain, curl, CAST(count(*) AS BIGINT) AS n_variants
  FROM u GROUP BY domain, curl
)
SELECT domain,
       CAST(sum(n_variants) AS BIGINT) AS n_raw,
       CAST(count(*) AS BIGINT) AS n_canonical,
       CAST(sum(n_variants) - count(*) AS BIGINT) AS n_dup_rows,
       CAST(max(n_variants) AS BIGINT) AS max_variants,
       min(curl) AS sample_url
FROM per_page GROUP BY domain ORDER BY domain
"""



# ---------------------------------------------------------------------------
# dom1: domain-blocklist filtering (the crawl pipeline's first URL gate)
# ---------------------------------------------------------------------------

# deterministic multi-label host per document; the varying label (source)
# sits LEFTMOST so the static blocklist can name the deeper suffixes.
# (doc_id + n_chars) mixes the tld choice so per-source block rates differ.
_HOST_SECTIONS = ["news", "ads", "blog", "shop"]
_HOST_TLDS = ["example.com", "example.net"]
# registrable blocklist entries (label-suffix semantics: an entry blocks
# the exact host AND every subdomain of it). Deliberately disjoint so a
# host matches at most one entry.
_BLOCKLIST = ["ads.example.com", "ads.example.net", "shop.example.net"]


def _host_col():
    sec = _HOST_SECTIONS
    tld = _HOST_TLDS
    section = (
        F.when(F.col("doc_id") % 4 == 0, sec[0])
        .when(F.col("doc_id") % 4 == 1, sec[1])
        .when(F.col("doc_id") % 4 == 2, sec[2])
        .otherwise(sec[3])
    )
    t = F.when((F.col("doc_id") + F.col("n_chars")) % 2 == 0, tld[0]).otherwise(tld[1])
    return F.concat_ws(".", F.col("source"), section, t)


_HOST_SQL = (
    "(source || '.' || CASE doc_id % 4 WHEN 0 THEN 'news' WHEN 1 THEN 'ads'"
    " WHEN 2 THEN 'blog' ELSE 'shop' END || '.'"
    " || CASE (doc_id + n_chars) % 2 WHEN 0 THEN 'example.com'"
    "    ELSE 'example.net' END)"
)


def q_domain_blocklist(spark, sf_dir):
    """dom1 — URL/domain blocklist gate with subdomain-suffix semantics
    (an entry blocks the exact host and every host under it): the first
    filter a crawl pipeline applies, before any content is even fetched.

    Scale shape: suffix matching is NOT a LIKE join (that is a cross
    product with a per-pair string scan). Each host explodes into its
    label suffixes IN-ROW (bounded by label count, here 3) and the
    blocklist probe becomes a plain broadcast SEMI equi-join on the
    suffix string — with a million-entry production blocklist the same
    plan holds (hash join on the suffix, blocklist side broadcast or
    shuffled by entry). The census is two map-side-combinable partial
    aggregates joined on the tiny per-source key set.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    hosts = d.select("doc_id", "source", _host_col().alias("host"))
    labels = F.split(F.col("host"), r"\.")
    # label suffixes of depth >= 2 ("ads.example.com" matches the entry,
    # "com" alone must not): slice from each start position to the end
    sfx = hosts.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(labels) - F.lit(1)),
                lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
            )
        ).alias("sfx"),
    )
    bl = spark.createDataFrame([(e,) for e in _BLOCKLIST], "sfx string")
    # entries are disjoint (no entry is a suffix of another), so each
    # host contributes at most one matching suffix row: the semi-join
    # output IS the per-doc blocked set, no distinct needed
    blocked = (
        sfx.join(F.broadcast(bl), "sfx", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_blocked"))
    )
    totals = hosts.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        totals.join(blocked, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_blocked", F.lit(0)).alias("n_blocked"),
            (F.col("n_docs") - F.coalesce("n_blocked", F.lit(0))).alias("n_passed"),
        )
        .orderBy("source")
    )


_DOM1_SQL = f"""
WITH h AS (
  SELECT source, {_HOST_SQL} AS host FROM documents
), v AS (
  SELECT source,
         CASE WHEN {" OR ".join(
             f"(host = '{e}' OR host LIKE '%.{e}')" for e in _BLOCKLIST
         )} THEN 1 ELSE 0 END AS blocked
  FROM h
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(blocked) AS BIGINT) AS n_blocked,
       CAST(count(*) - sum(blocked) AS BIGINT) AS n_passed
FROM v GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# tq1: per-domain contribution cap (the C4/RefinedWeb anti-monoculture rule)
# ---------------------------------------------------------------------------

_DOMAIN_CAP = 3  # keep at most K docs per domain (tiny so sf0.001 drops too)


def q_domain_cap(spark, sf_dir):
    """tq1 — cap any single domain's contribution to the corpus at K
    documents, keeping the highest-quality ones (longest first,
    deterministic id tie-break): the standard guard against a single
    crawler-friendly site dominating the training mixture.

    Scale shape: totals come from a map-side-combinable partial agg
    (skew-immune — a 10M-doc domain partial-aggregates like any other),
    and the keep-set uses a rank window whose ONLY window function is
    row_number filtered to <= K, which Spark executes as
    WindowGroupLimit: each map partition ships at most K rows PER DOMAIN
    into the exchange, so the hot domain never materializes in one task.
    The two K-row-per-domain frames join on the tiny domain key set.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    dom = d.select(
        F.concat_ws(
            ".",
            F.col("source"),
            F.when((F.col("doc_id") + F.col("n_chars")) % 2 == 0,
                   _HOST_TLDS[0]).otherwise(_HOST_TLDS[1]),
        ).alias("domain"),
        "doc_id",
        "n_chars",
    )
    totals = dom.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    w = Window.partitionBy("domain").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    kept = (
        dom.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _DOMAIN_CAP)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
    )
    return (
        totals.join(kept, "domain")
        .select(
            "domain",
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept")).alias("n_dropped"),
            "kept_chars",
            "total_chars",
        )
        .orderBy("domain")
    )


_TQ1_SQL = f"""
WITH dom AS (
  SELECT source || '.' || CASE (doc_id + n_chars) % 2 WHEN 0
           THEN 'example.com' ELSE 'example.net' END AS domain,
         doc_id, n_chars
  FROM documents
), ranked AS (
  SELECT domain, n_chars,
         ROW_NUMBER() OVER (PARTITION BY domain
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM dom
), totals AS (
  SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM dom GROUP BY domain
), kept AS (
  SELECT domain, CAST(count(*) AS BIGINT) AS n_kept,
         CAST(sum(n_chars) AS BIGINT) AS kept_chars
  FROM ranked WHERE rn <= {_DOMAIN_CAP} GROUP BY domain
)
SELECT t.domain, t.n_docs, k.n_kept,
       CAST(t.n_docs - k.n_kept AS BIGINT) AS n_dropped,
       k.kept_chars, t.total_chars
FROM totals t JOIN kept k ON t.domain = k.domain
ORDER BY t.domain
"""


QUERIES = {
    "hx1_html_extract": q_html_extract,
    "url1_url_canonicalize": q_url_canonicalize,
    "dom1_domain_blocklist": q_domain_blocklist,
    "tq1_domain_cap": q_domain_cap,
}
ORACLE = {
    "hx1_html_extract": _HX1_SQL,
    "url1_url_canonicalize": _URL1_SQL,
    "dom1_domain_blocklist": _DOM1_SQL,
    "tq1_domain_cap": _TQ1_SQL,
}
