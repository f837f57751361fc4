"""robots.txt parsing + URL filtering."""

from pyspark.sql import functions as F

from geocore_spark.functions import robots

ROBOTS_A = """
# comment
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Disallow: /private/
Disallow: /tmp
User-agent: other
Disallow: /other/
"""

ROBOTS_EMPTY_DISALLOW = """
User-agent: *
Disallow:
"""


def test_parse_star_group_only():
    assert robots.parse_robots_text(ROBOTS_A) == ["/private/", "/tmp"]
    assert robots.parse_robots_text(ROBOTS_EMPTY_DISALLOW) == []
    assert robots.parse_robots_text("") == []
    assert robots.parse_robots_text("User-agent: *\nDISALLOW: /X/") == ["/X/"]


def test_robots_filter(spark):
    urls = spark.createDataFrame(
        [
            ("https://a.com/ok/page",),
            ("https://a.com/private/x",),
            ("https://a.com/tmpfile",),  # prefix match: /tmp blocks /tmpfile
            ("https://b.com/private/x",),  # no robots row -> allowed
            ("https://c.com/anything",),  # empty disallow -> allowed
        ],
        "url string",
    )
    rob = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("c.com", ROBOTS_EMPTY_DISALLOW)],
        "host string, robots_txt string",
    )
    kept = {r["url"] for r in robots.robots_filter(urls, rob).collect()}
    assert kept == {
        "https://a.com/ok/page",
        "https://b.com/private/x",
        "https://c.com/anything",
    }


def test_is_allowed_pure_column_plan(spark):
    """The per-URL decision must not involve a Python UDF (only the
    per-host parse does)."""
    urls = spark.createDataFrame([("https://a.com/x",)], "url string")
    rob = spark.createDataFrame([("a.com", "User-agent: *\nDisallow: /y")],
                                "host string, robots_txt string")
    out = robots.robots_filter(urls, rob)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the filter side is codegen'd; the only python eval is the parse
    # projection on the broadcast (host-count-sized) side
    assert plan.count("BatchEvalPython") + plan.count("ArrowEvalPython") <= 1
