"""URL canonicalization Column functions."""

from pyspark.sql import functions as F

from geocore_spark.functions import urls


def _norm(spark, raw):
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    return [r["n"] for r in df.select(urls.normalize_url(F.col("url")).alias("n")).collect()]


def test_normalize_url_cases(spark):
    got = _norm(
        spark,
        [
            "HTTP://Example.COM:80/a/b?z=1&a=2#frag",
            "https://example.com:443/",
            "https://example.com",
            "http://h9.example/p/1",
            "https://Example.com/a?b=2&a=1&a=0",
            "http://example.com:8080/x",
        ],
    )
    assert got == [
        "http://example.com/a/b?a=2&z=1",
        "https://example.com/",
        "https://example.com/",
        "http://h9.example/p/1",
        "https://example.com/a?a=0&a=1&b=2",
        "http://example.com:8080/x",  # non-default port kept
    ]


def test_normalize_idempotent(spark):
    raw = ["HTTP://A.B:80/p?x=2&y=1#f", "https://c.d/e/f?q=1"]
    once = _norm(spark, raw)
    twice = _norm(spark, once)
    assert once == twice


def test_host_domain_depth(spark):
    df = spark.createDataFrame(
        [("https://Sub.News.Example.co:8443/a/b/c?x=1#y",)], "url string"
    )
    r = df.select(
        urls.url_host(F.col("url")).alias("h"),
        urls.registrable_domain(F.col("url")).alias("d"),
        urls.url_path_depth(F.col("url")).alias("n"),
    ).first()
    assert r["h"] == "sub.news.example.co:8443"
    assert r["d"] == "example.co"
    assert r["n"] == 3


def test_registrable_domain_psl_rule(spark):
    """PSL multi-label suffixes keep three labels; unknown TLDs default to
    two; bare/short hosts pass through; extra_suffixes extends the set."""
    cases = [
        ("https://www.example.co.uk/x", "example.co.uk"),
        ("https://a.b.example.com.au", "example.com.au"),
        ("https://deep.sub.example.com/x", "example.com"),
        ("https://user.github.io/repo", "user.github.io"),
        ("https://example.org", "example.org"),
        ("https://localhost:8080/", "localhost"),
        ("https://x.y.z.co.jp:443/p", "z.co.jp"),
        # 3-label suffix: suffix + one label = four labels kept
        ("https://bucket.s3.amazonaws.com/key", "bucket.s3.amazonaws.com"),
        ("https://a.bucket.s3.amazonaws.com/key", "bucket.s3.amazonaws.com"),
        # the bare suffix itself passes through whole
        ("https://s3.amazonaws.com/", "s3.amazonaws.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["d"] for r in df.select(urls.registrable_domain(F.col("url")).alias("d")).collect()]
    assert got == [w for _, w in cases]
    # extra suffix extends the rule
    df2 = spark.createDataFrame([("https://a.b.custom.tld/x",)], "url string")
    r = df2.select(
        urls.registrable_domain(F.col("url"), extra_suffixes=("custom.tld",)).alias("d")
    ).first()
    assert r["d"] == "b.custom.tld"


def test_registrable_domain_column_matches_python_model_grid(spark):
    """One Spark job over a generated host grid: the Column PSL expression
    must agree with the straightforward Python model on every host —
    including hosts whose last two labels ARE a listed suffix and hosts
    deeper than three labels."""
    import itertools

    suffix_samples = [
        "com", "org", "co.uk", "github.io", "com.au", "zz", "s3.amazonaws.com"
    ]
    prefixes = [[], ["example"], ["a", "example"], ["x", "y", "example"]]
    hosts = [
        ".".join(p + s.split("."))
        for p, s in itertools.product(prefixes, suffix_samples)
    ]

    def model(host):
        parts = host.split(".")
        if len(parts) <= 2:
            return host
        if ".".join(parts[-3:]) in urls.PSL_MULTI_LABEL:
            return ".".join(parts[-4:]) if len(parts) >= 4 else host
        if ".".join(parts[-2:]) in urls.PSL_MULTI_LABEL:
            return ".".join(parts[-3:])
        return ".".join(parts[-2:])

    df = spark.createDataFrame([(f"https://{h}/p",) for h in hosts], "url string")
    got = [
        r["d"]
        for r in df.select(urls.registrable_domain(F.col("url")).alias("d")).collect()
    ]
    assert got == [model(h) for h in hosts]


def test_normalize_idempotent_generated(spark):
    """Idempotence over a generated grid of messy URLs (one Spark job)."""
    import itertools

    schemes = ["http", "HTTPS", "HtTp"]
    hosts = ["A.b.C", "x.example.COM:8080", "h.io:80", "y.z:443"]
    paths = ["", "/", "/a/b", "/a%20b/c"]
    queries = ["", "?b=2&a=1", "?z=9&z=1&a="]
    frags = ["", "#f", "#a?b=1"]
    raw = [
        f"{s}://{h}{p}{q}{fr}"
        for s, h, p, q, fr in itertools.product(schemes, hosts, paths, queries, frags)
    ]
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    once = [
        r["n"] for r in df.select(urls.normalize_url(F.col("url")).alias("n")).collect()
    ]
    df2 = spark.createDataFrame([(u,) for u in once], "url string")
    twice = [
        r["n"] for r in df2.select(urls.normalize_url(F.col("url")).alias("n")).collect()
    ]
    assert once == twice


def test_url_signals_rules(spark):
    from geocore_spark.functions.urls import url_signals

    rows = [
        ("clean", "https://host1.example.com/p/1?z=1"),
        ("kw", "https://host1.example.com/casino/promo?z=1"),
        ("ip", "https://10.0.3.7/p/1?z=1"),
        ("digits", "https://h123456789012.example.com/p/1?z=1"),
        ("long", "https://host1.example.com/p/" + "x" * 520 + "?z=1"),
        ("params", "https://host1.example.com/p/1?" + "&".join(f"k{i}=1" for i in range(9))),
        ("deep", "https://host1.example.com/a/b/c/d/e/f/g/h/i/j/k?z=1"),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "tag string, url string")
    from pyspark.sql import functions as F

    got = {
        r["tag"]: r
        for r in df.select("tag", url_signals(F.col("url")).alias("s"))
        .select("tag", "s.*")
        .collect()
    }
    assert got["clean"]["keep"] == 1
    for tag in ("kw", "ip", "digits", "long", "params", "deep"):
        assert got[tag]["keep"] == 0, tag
    assert got["kw"]["kw_hits"] == 1
    assert got["ip"]["is_ip_host"] == 1
    assert got["digits"]["host_digits"] * 100 > got["digits"]["host_len"] * 40
    assert got["long"]["url_len"] > 512
    assert got["params"]["n_params"] == 9
    assert got["deep"]["depth"] == 11
    assert got["null"]["keep"] is None  # null url -> null keep (filter drops)
