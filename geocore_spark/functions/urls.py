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
- ``registrable_domain`` applies the Public Suffix List rule over a
  bundled multi-label-suffix snapshot (PSL_MULTI_LABEL); a deployment with
  the full PSL passes its entries via ``extra_suffixes``.
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


#: Bundled snapshot SUBSET of the Public Suffix List's multi-label entries
#: (publicsuffix.org — public data). The full PSL is a runtime file a
#: deployment loads (``extra_suffixes``) and ships as a broadcast-size
#: literal set; this subset covers the high-traffic ccTLD second-level
#: registries plus common hosted-site suffixes, and the rule degrades to
#: the standard 1-label default for unknown TLDs (the PSL's own "*" rule).
PSL_MULTI_LABEL: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk", "plc.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in",
    "co.kr", "or.kr", "re.kr", "go.kr",
    "com.mx", "org.mx", "gob.mx",
    "com.tr", "org.tr", "gov.tr",
    "com.ar", "org.ar", "com.sg", "org.sg", "edu.sg",
    "co.za", "org.za", "web.za",
    "co.nz", "org.nz", "net.nz", "govt.nz",
    "com.hk", "com.tw", "org.tw", "com.my", "com.ph", "com.vn", "com.eg",
    "co.id", "or.id", "co.th", "or.th", "co.il", "org.il",
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com", "appspot.com",
    "web.app", "pages.dev", "netlify.app", "vercel.app", "s3.amazonaws.com",
)


def registrable_domain(
    url: Column, extra_suffixes: tuple[str, ...] = ()
) -> Column:
    """Registrable domain (eTLD+1) per the Public Suffix List rule.

    Host labels after the longest matching public suffix plus one: a host
    under a listed multi-label suffix (``a.b.co.uk``) keeps THREE labels;
    otherwise the standard last-two-labels default applies. Pure Column
    (split + isin — codegen'd); pass the full PSL's multi-label entries as
    ``extra_suffixes`` when available.
    """
    suffixes = PSL_MULTI_LABEL + tuple(extra_suffixes)
    sufs2 = [s for s in suffixes if s.count(".") == 1]
    sufs3 = [s for s in suffixes if s.count(".") == 2]
    host = F.regexp_replace(url_host(url), r":\d+$", "")
    labels = F.split(host, r"\.")
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    last4 = F.array_join(F.slice(labels, -4, 4), ".")
    out = F.when(F.size(labels) <= 2, host)
    if sufs3:
        # 3-label suffixes (s3.amazonaws.com): suffix + one label = 4
        # labels kept; a host that IS the suffix passes through whole.
        out = out.when((F.size(labels) >= 4) & last3.isin(*sufs3), last4).when(
            last3.isin(*sufs3), host
        )
    if sufs2:
        out = out.when(last2.isin(*sufs2), last3)
    return out.otherwise(last2)


def registrable_domain_sql(host_sql: str, extra_suffixes: tuple[str, ...] = ()) -> str:
    """ANSI-SQL (DuckDB) twin of :func:`registrable_domain`, over a host
    expression (port already stripped)."""
    suffixes = PSL_MULTI_LABEL + tuple(extra_suffixes)
    sufs2 = [s for s in suffixes if s.count(".") == 1]
    sufs3 = [s for s in suffixes if s.count(".") == 2]
    labels = f"string_split({host_sql}, '.')"
    last2 = f"array_to_string({labels}[-2:], '.')"
    last3 = f"array_to_string({labels}[-3:], '.')"
    last4 = f"array_to_string({labels}[-4:], '.')"
    sql = f"(CASE WHEN len({labels}) <= 2 THEN {host_sql} "
    if sufs3:
        in3 = ", ".join(f"'{s}'" for s in sufs3)
        sql += (
            f"WHEN len({labels}) >= 4 AND {last3} IN ({in3}) THEN {last4} "
            f"WHEN {last3} IN ({in3}) THEN {host_sql} "
        )
    if sufs2:
        in2 = ", ".join(f"'{s}'" for s in sufs2)
        sql += f"WHEN {last2} IN ({in2}) THEN {last3} "
    return sql + f"ELSE {last2} END)"


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


#: Mild default URL blocklist keywords (the FineWeb/RefinedWeb URL-filter
#: shape: substring keyword hits anywhere in the lowercased URL). Real
#: deployments pass their full curated list — the operator takes the list
#: as a parameter precisely because blocklists are policy, not code.
URL_BLOCK_KEYWORDS: tuple[str, ...] = ("porn", "xxx", "casino", "viagra", "escort")


def url_signals(
    url: Column,
    keywords: tuple[str, ...] = URL_BLOCK_KEYWORDS,
    max_len: int = 512,
    max_params: int = 8,
    max_depth: int = 10,
    digit_pct_max: int = 40,
) -> Column:
    """URL-level quality signals + keep flag as one pure-Column struct —
    the URL-filtering stage of the published web-curation recipes
    (RefinedWeb, Penedo et al. 2023, arXiv:2306.01116 §3.1; FineWeb,
    Penedo et al. 2024, arXiv:2406.17557): blocklist keyword hits,
    IP-literal hosts, digit-heavy hosts, oversized URLs, parameter soup
    and path-depth extremes are all crawler-trap / spam markers that are
    cheaper to drop at the URL than after fetching the page.

    Returns ``struct(url_len, host_len, host_digits, is_ip_host,
    n_params, depth, kw_hits, keep)`` — all INT; the digit-ratio
    threshold is an integer cross-multiplication (digits * 100 <=
    host_len * pct), so no float appears and the DuckDB twin
    (:func:`url_signals_sql`) is value-exact. Null url -> null fields
    (a filter on ``keep = 1`` drops such rows, the conservative policy).
    """
    low = F.lower(url)
    host = F.regexp_replace(url_host(url), r":\d+$", "")
    host_len = F.length(host)
    host_digits = host_len - F.length(F.regexp_replace(host, r"[0-9]", ""))
    is_ip = host.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$").cast("int")
    nofrag = F.regexp_replace(url, r"#.*$", "")
    qs = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    n_params = F.when(qs == "", F.lit(0)).otherwise(F.size(F.split(qs, "&")))
    depth = url_path_depth(url)
    url_len = F.length(url)
    kw_hits = None
    for kw in keywords:
        hit = low.contains(kw).cast("int")
        kw_hits = hit if kw_hits is None else kw_hits + hit
    if kw_hits is None:
        kw_hits = F.when(url.isNotNull(), F.lit(0))
    keep = (
        (kw_hits == 0)
        & (is_ip == 0)
        & (host_digits * 100 <= host_len * F.lit(int(digit_pct_max)))
        & (url_len <= F.lit(int(max_len)))
        & (n_params <= F.lit(int(max_params)))
        & (depth <= F.lit(int(max_depth)))
    ).cast("int")
    return F.struct(
        url_len.cast("int").alias("url_len"),
        host_len.cast("int").alias("host_len"),
        host_digits.cast("int").alias("host_digits"),
        is_ip.alias("is_ip_host"),
        n_params.cast("int").alias("n_params"),
        depth.cast("int").alias("depth"),
        kw_hits.cast("int").alias("kw_hits"),
        keep.alias("keep"),
    )


def url_signals_sql(
    url: str,
    keywords: tuple[str, ...] = URL_BLOCK_KEYWORDS,
    max_len: int = 512,
    max_params: int = 8,
    max_depth: int = 10,
    digit_pct_max: int = 40,
) -> dict[str, str]:
    """DuckDB twins of :func:`url_signals`'s fields, as named SQL exprs
    (regexp_replace carries the 'g' flag — DuckDB replaces only the first
    match by default, Spark replaces all)."""
    low = f"lower({url})"
    host = (
        f"regexp_replace(lower(regexp_extract(regexp_replace(regexp_replace({url}, "
        "'#.*$', ''), '^[A-Za-z][A-Za-z0-9+.\\-]*://', ''), '^([^/?#]+)', 1)), "
        "':[0-9]+$', '')"
    )
    host_len = f"len({host})"
    host_digits = f"(len({host}) - len(regexp_replace({host}, '[0-9]', '', 'g')))"
    is_ip = (
        f"CAST(regexp_matches({host}, "
        "'^[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}$') AS INT)"
    )
    nofrag = f"regexp_replace({url}, '#.*$', '')"
    qs = f"regexp_extract({nofrag}, '\\?(.*)$', 1)"
    n_params = f"(CASE WHEN {qs} = '' THEN 0 ELSE len(string_split({qs}, '&')) END)"
    path = (
        f"regexp_replace(regexp_replace(regexp_replace({url}, '[#?].*$', ''), "
        "'^[A-Za-z][A-Za-z0-9+.\\-]*://', ''), '^[^/]+', '')"
    )
    depth = f"len(list_filter(string_split({path}, '/'), x -> x <> ''))"
    for kw in keywords:
        if "'" in kw:
            raise ValueError(f"keyword contains a quote: {kw!r}")
    # NULL guard: DuckDB's CASE WHEN contains(NULL,..) falls to ELSE 0,
    # but Spark's null.contains sums to NULL — mirror the NULL
    kw_sum = (
        "("
        + " + ".join(
            f"(CASE WHEN contains({low}, '{kw}') THEN 1 ELSE 0 END)"
            for kw in keywords
        )
        + ")"
        if keywords
        else "0"
    )
    kw_hits = f"(CASE WHEN {url} IS NULL THEN NULL ELSE {kw_sum} END)"
    keep = (
        f"(CASE WHEN {kw_hits} = 0 AND {is_ip} = 0 "
        f"AND {host_digits} * 100 <= {host_len} * {int(digit_pct_max)} "
        f"AND len({url}) <= {int(max_len)} AND {n_params} <= {int(max_params)} "
        f"AND {depth} <= {int(max_depth)} THEN 1 WHEN {url} IS NULL THEN NULL "
        "ELSE 0 END)"
    )
    return {
        "url_len": f"CAST(len({url}) AS INT)",
        "host_len": f"CAST({host_len} AS INT)",
        "host_digits": f"CAST({host_digits} AS INT)",
        "is_ip_host": is_ip,
        "n_params": f"CAST({n_params} AS INT)",
        "depth": f"CAST({depth} AS INT)",
        "kw_hits": f"CAST({kw_hits} AS INT)",
        "keep": f"CAST({keep} AS INT)",
    }
