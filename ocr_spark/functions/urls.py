"""URL parsing and canonicalization expressions.

Crawl pipelines key almost everything on URLs: dedup before fetch,
host-level politeness and skew handling, domain-level quality priors.
These are pure JVM expressions (regexp_extract / regexp_replace /
higher-order array ops — RE2-safe patterns only, no lookaround) with
byte-identical ANSI-SQL twins, so every derived column is oracle-checkable.

Canonicalization policy (the common crawl-dedup convention, documented
because it IS a policy choice): lowercase scheme+host, strip userinfo,
ports, fragments and a leading ``www.``, default the empty path to ``/``,
drop ``utm_*`` tracking params, and sort the remaining query params so
param order never splits a dedup key. ``registered_domain`` is the naive
last-two-labels grouping key (a full public-suffix list is a data file,
not a parser change; documented out of scope).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_scheme(c) -> Column:
    """Lowercased scheme, '' when absent."""
    return F.lower(F.regexp_extract(_col(c), r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))


def url_authority(c) -> Column:
    """Raw authority (may carry userinfo/port), '' when absent. Anchored
    to a LEADING scheme so a schemeless/relative input carrying an
    embedded absolute URL ('/redirect?to=http://evil.com/') never yields
    the embedded host as its authority."""
    return F.regexp_extract(
        _col(c), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1
    )


def url_host(c) -> Column:
    """Canonical host: authority minus userinfo and port, lowercased,
    trailing dot and leading ``www.`` stripped."""
    h = F.regexp_replace(url_authority(c), r"^[^@]*@", "")
    h = F.lower(F.regexp_replace(h, r":[0-9]*$", ""))
    h = F.regexp_replace(h, r"\.$", "")
    return F.regexp_replace(h, r"^www\.", "")


def url_path(c) -> Column:
    """Path component; '/' when empty. Scheme-anchored like
    ``url_authority`` so embedded URLs in relative inputs don't donate a
    path."""
    p = F.regexp_extract(
        _col(c), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query(c) -> Column:
    """Raw query string (no '?'), '' when absent. The leading ``[^?#]*``
    anchors on the FIRST '?' before any fragment: a greedy ``[^#]*``
    would re-anchor on a literal '?' inside the query (legal per RFC
    3986) and drop every param before it, and a bare ``\\?([^#]*)``
    would match a '?' inside the fragment ('/p#frag?x=1') and leak
    fragment content into the canonical query."""
    return F.regexp_extract(_col(c), r"^[^?#]*\?([^#]*)", 1)


def url_query_canonical(c) -> Column:
    """Query with utm_* params dropped and the rest sorted."""
    parts = F.filter(
        F.split(url_query(c), "&"),
        lambda x: (x != "") & ~x.startswith("utm_"),
    )
    return F.array_join(F.array_sort(parts), "&")


def registered_domain(c) -> Column:
    """Last two host labels ('example.org'); the whole host when it has
    fewer than two labels."""
    h = url_host(c)
    d = F.regexp_extract(h, r"[^.]+\.[^.]+$", 0)
    return F.when(d == "", h).otherwise(d)


def url_canonicalize(c) -> Column:
    """scheme://host/path[?sorted-query] under the module's policy."""
    q = url_query_canonical(c)
    return F.concat(
        url_scheme(c),
        F.lit("://"),
        url_host(c),
        url_path(c),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


# --- exact SQL twins (DuckDB dialect; kept adjacent so drift is visible) ---

SQL_URL_SCHEME = "lower(regexp_extract({c}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
_SQL_AUTH = "regexp_extract({c}, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)"
SQL_URL_HOST = (
    "regexp_replace(regexp_replace(lower(regexp_replace(regexp_replace("
    + _SQL_AUTH
    + ", '^[^@]*@', ''), ':[0-9]*$', '')), '\\.$', ''), '^www\\.', '')"
)
SQL_URL_PATH = (
    "CASE WHEN regexp_extract({c}, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    " = '' THEN '/' "
    "ELSE regexp_extract({c}, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) END"
)
SQL_URL_QUERY = "regexp_extract({c}, '^[^?#]*\\?([^#]*)', 1)"
SQL_URL_QUERY_CANON = (
    # coalesce: DuckDB's array_to_string yields NULL (not '') on an empty list
    "coalesce(array_to_string(list_sort([p for p in string_split("
    + SQL_URL_QUERY
    + ", '&') if p <> '' AND NOT starts_with(p, 'utm_')]), '&'), '')"
)
SQL_REGISTERED_DOMAIN = (
    "CASE WHEN regexp_extract(" + SQL_URL_HOST + ", '[^.]+\\.[^.]+$', 0) = ''"
    " THEN " + SQL_URL_HOST
    + " ELSE regexp_extract(" + SQL_URL_HOST + ", '[^.]+\\.[^.]+$', 0) END"
)
SQL_URL_CANON = (
    SQL_URL_SCHEME
    + " || '://' || "
    + SQL_URL_HOST
    + " || "
    + SQL_URL_PATH
    + " || CASE WHEN "
    + SQL_URL_QUERY_CANON
    + " = '' THEN '' ELSE '?' || "
    + SQL_URL_QUERY_CANON
    + " END"
)
