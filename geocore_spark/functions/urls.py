"""URL functions for crawl pipelines — pure Column expressions.

A crawl corpus keys everything by URL (the pages table's primary column,
BASELINE input_hint); dedup and frontier scheduling need canonical forms.
All of these are regexp/array Column expressions — whole-stage codegen,
no UDF — and each has an exact ANSI-SQL twin for the DuckDB oracle.

Scope notes (documented approximations):
- ``normalize_url`` assumes scheme://host[:port][/path][?query][#frag]
  inputs (http/https); it lowercases scheme+host, strips fragments and
  default ports, defaults an empty path to "/", and sorts query params
  bytewise. It does NOT percent-decode or resolve dot-segments.
- ``registrable_domain`` is the naive last-two-labels rule; a real
  deployment loads the Public Suffix List as a broadcast dim and joins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def url_host(url: Column) -> Column:
    """Lowercased host[:port] component."""
    after = F.regexp_replace(url, _SCHEME_RE, "")
    return F.lower(F.regexp_extract(after, r"^([^/?#]+)", 1))


def normalize_url(url: Column) -> Column:
    """Canonical URL: lower scheme+host, no fragment, no default port,
    '/' for the empty path, query params sorted bytewise."""
    nofrag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME_RE, 1))
    after = F.regexp_replace(nofrag, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    pathq = F.regexp_replace(after, r"^[^/?]+", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.regexp_extract(pathq, r"\?(.*)$", 1)
    sorted_qs = F.array_join(F.array_sort(F.split(qs, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_qs)),
    )


def registrable_domain(url: Column) -> Column:
    """Naive registrable domain: last two host labels (no PSL)."""
    host = F.regexp_replace(url_host(url), r":\d+$", "")
    labels = F.split(host, r"\.")
    return F.when(
        F.size(labels) <= 2, host
    ).otherwise(F.array_join(F.slice(labels, -2, 2), "."))


def url_path_depth(url: Column) -> Column:
    """Number of non-empty path segments."""
    after = F.regexp_replace(F.regexp_replace(url, r"[#?].*$", ""), _SCHEME_RE, "")
    path = F.regexp_replace(after, r"^[^/]+", "")
    return F.size(F.filter(F.split(path, "/"), lambda x: x != ""))


def normalize_url_sql(url: str) -> str:
    """ANSI-SQL (DuckDB) twin of :func:`normalize_url` — identical steps."""
    nofrag = f"regexp_replace({url}, '#.*$', '')"
    scheme = f"lower(regexp_extract({nofrag}, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))"
    after = f"regexp_replace({nofrag}, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '')"
    hostport = f"lower(regexp_extract({after}, '^([^/?]+)', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    pathq = f"regexp_replace({after}, '^[^/?]+', '')"
    path_raw = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    path = f"CASE WHEN {path_raw} = '' THEN '/' ELSE {path_raw} END"
    qs = f"regexp_extract({pathq}, '\\?(.*)$', 1)"
    sorted_qs = f"array_to_string(list_sort(string_split({qs}, '&')), '&')"
    return (
        f"({scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {qs} = '' THEN '' ELSE '?' || {sorted_qs} END)"
    )
