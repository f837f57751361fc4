"""robots.txt evaluation for crawl pipelines.

Completes the frontier stack (streaming/frontier.py schedules fetches;
this decides which URLs may be fetched at all). Simplified Robots
Exclusion Protocol, documented subset:

- the ``User-agent: *`` group's ``Disallow`` rules (case-insensitive
  field names, ``#`` comments, blank-line group separation);
- a URL is allowed unless its path starts with any disallow prefix;
  ``Disallow:`` with an empty value allows everything;
- ``Allow`` precedence and wildcards are NOT implemented (documented —
  deployments needing full REP swap the parser, the join shape stays).

Parsing is an Arrow-batched pandas UDF (text parsing, cold path — one
robots body per host, not per page); the allow decision is a pure
Column expression over the parsed rule arrays, so the per-URL hot path
stays in codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geocore_spark.functions.urls import url_host


def parse_robots_text(body: str) -> list[str]:
    """Disallow path-prefixes of the ``*`` group (deterministic)."""
    rules: list[str] = []
    active = False
    in_ua_run = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            active = False
            in_ua_run = False
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_ua_run:
                active = False  # a new group header run starts
                in_ua_run = True
            if value == "*":
                active = True
        else:
            in_ua_run = False
            if field == "disallow" and active and value:
                rules.append(value)
    return rules


def parse_robots_udf():
    @F.pandas_udf("array<string>")
    def _parse(body: pd.Series) -> pd.Series:
        return body.map(lambda b: parse_robots_text(b or ""))

    return _parse


def url_path(url: Column) -> Column:
    """Path+query component used for robots matching ('/' when empty)."""
    after = F.regexp_replace(
        F.regexp_replace(url, r"#.*$", ""), r"^[A-Za-z][A-Za-z0-9+.\-]*://", ""
    )
    p = F.regexp_replace(after, r"^[^/]+", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def is_allowed(path: Column, rules: Column) -> Column:
    """True unless the path starts with any disallow prefix — pure
    Column (exists over the rule array; JVM-side)."""
    return F.when(rules.isNull(), F.lit(True)).otherwise(
        ~F.exists(rules, lambda r: path.startswith(r))
    )


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Keep URLs allowed by their host's robots.txt.

    ``robots`` is (host, robots_txt) — one row per host (a crawl's
    robots cache, tiny relative to the URL stream, so it broadcasts;
    hosts with no robots row allow everything via the left join's null
    rules). Parse runs once per host, never per URL.

    BOTH join keys are normalized to the lowercase bare host (port
    stripped): the failure mode of a key mismatch is allow-everything —
    a cache row keyed 'Example.com' or a URL carrying ':8080' would
    silently bypass every disallow rule if either side joined verbatim.
    """
    bare = F.regexp_replace(F.lower(F.col(host_col)), r":\d+$", "")
    rules = robots.select(
        bare.alias("__rkey"),
        parse_robots_udf()(F.col(body_col)).alias("__rules"),
    )
    with_host = urls.withColumn(
        "__host", F.regexp_replace(url_host(F.col(url_col)), r":\d+$", "")
    )
    joined = with_host.join(
        F.broadcast(rules), with_host["__host"] == rules["__rkey"], "left"
    ).drop("__rkey")
    return (
        joined.filter(is_allowed(url_path(F.col(url_col)), F.col("__rules")))
        .drop("__host", "__rules")
    )
