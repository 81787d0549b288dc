"""URL canonicalization — the web-corpus dedup key.

Web-scale crawls (CommonCrawl / RefinedWeb / FineWeb pipelines) dedup
and group by a *canonical* URL: scheme+host lowercased, `www.` and
default ports stripped, fragments dropped, tracking parameters removed,
remaining query parameters sorted, duplicate slashes collapsed and the
trailing slash normalized. The reference has no web surface (scope
check: /root/reference/aristoteles/aristoteles.py:229-346); SURVEY §7.4
extension.

Every rule is a plain regexp/split/sort/join chain, so there is a
bit-identical ANSI-SQL transliteration (`sql_canonical_url`) for oracle
checking — same pattern as functions/html.py. All Catalyst expressions:
per-row codegen at scan speed, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# parameter prefixes stripped as tracking noise
TRACKING_PREFIX = "utm_"


def url_host(url: Column) -> Column:
    """Canonical host: lowercased, port and leading ``www.`` stripped."""
    hostport = F.lower(F.regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    host = F.regexp_replace(hostport, ":[0-9]+$", "")
    return F.regexp_replace(host, "^www\\.", "")


def canonical_url(url: Column) -> Column:
    u = F.regexp_replace(url, "#.*", "")  # fragment never survives
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract(u, "^[A-Za-z]+://([^/?]+)", 1))
    host = F.regexp_replace(F.regexp_replace(hostport, ":[0-9]+$", ""), "^www\\.", "")
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = F.when(
        (port == "")
        | ((scheme == F.lit("http")) & (port == "80"))
        | ((scheme == F.lit("https")) & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    rawpath = F.regexp_extract(u, "^[A-Za-z]+://[^/?]+(/[^?]*)?", 1)
    path = F.regexp_replace(rawpath, "/{2,}", "/")
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, "\\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.startswith(TRACKING_PREFIX),
        )
    )
    qs = F.array_join(params, "&")
    qsuffix = F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs))
    return F.concat(scheme, F.lit("://"), host, keep_port, path, qsuffix)


def sql_url_host(url: str) -> str:
    """duckdb transliteration of :func:`url_host` over a SQL expression."""
    hostport = f"lower(regexp_extract({url}, '^[A-Za-z]+://([^/?#]+)', 1))"
    host = f"regexp_replace({hostport}, ':[0-9]+$', '')"
    return f"regexp_replace({host}, '^www\\.', '')"


def sql_canonical_url(url: str) -> str:
    """duckdb transliteration of :func:`canonical_url`.

    Mirrors the Spark chain operation-for-operation; duckdb's
    regexp_replace needs the explicit 'g' flag where Spark replaces all
    matches by default (only the slash-collapse rule has >1 match — the
    fragment/port/trailing-slash patterns match at most once)."""
    u = f"regexp_replace({url}, '#.*', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z]+)://', 1))"
    hostport = f"lower(regexp_extract({u}, '^[A-Za-z]+://([^/?]+)', 1))"
    host = (
        f"regexp_replace(regexp_replace({hostport}, ':[0-9]+$', ''),"
        f" '^www\\.', '')"
    )
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    keep_port = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80')"
        f" OR ({scheme} = 'https' AND {port} = '443')"
        f" THEN '' ELSE ':' || {port} END"
    )
    # COALESCE: duckdb's regexp_extract yields NULL for a group that
    # did not participate in the match; Spark yields '' — align on ''
    rawpath = f"COALESCE(regexp_extract({u}, '^[A-Za-z]+://[^/?]+(/[^?]*)?', 1), '')"
    path = f"regexp_replace({rawpath}, '/{{2,}}', '/', 'g')"
    path = f"regexp_replace({path}, '/+$', '')"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    query = f"COALESCE(regexp_extract({u}, '\\?(.*)$', 1), '')"
    # outer COALESCE: duckdb's array_to_string of an EMPTY list is NULL
    # (Spark's array_join is ''); inner chain is NULL-free otherwise
    qs = (
        f"COALESCE(array_to_string(list_sort(list_filter(string_split({query}, '&'),"
        f" p -> p <> '' AND NOT starts_with(p, '{TRACKING_PREFIX}'))), '&'), '')"
    )
    qsuffix = f"CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END"
    return f"{scheme} || '://' || {host} || {keep_port} || {path} || {qsuffix}"
