"""robots.txt engine: RFC 9309-subset parser + longest-match decisions,
and the broadcast-join Spark filter."""

from pyspark.sql import Row

from weblog_pipeline import robots


def test_parser_groups_and_comments():
    txt = """
# global rules
User-agent: *
Disallow: /private/
Allow: /private/ok

User-agent: badbot
User-agent: otherbot
Disallow: /

Sitemap: https://x/sitemap.xml
"""
    g = robots.parse_robots(txt)
    assert g["*"] == [(False, "/private/"), (True, "/private/ok")]
    assert g["badbot"] == [(False, "/")]
    assert g["otherbot"] == [(False, "/")]


def test_longest_match_and_ties():
    g = robots.parse_robots(
        "User-agent: *\nDisallow: /a/\nAllow: /a/b\nDisallow: /a/b"
    )
    assert robots.is_allowed(g, "crawler", "/a/x") is False
    # /a/b matched by both Allow and Disallow of equal length -> allow wins
    assert robots.is_allowed(g, "crawler", "/a/b1") is True
    assert robots.is_allowed(g, "crawler", "/c") is True  # no match


def test_agent_specific_group_overrides_star():
    g = robots.parse_robots(
        "User-agent: crawler\nAllow: /\n\nUser-agent: *\nDisallow: /"
    )
    assert robots.is_allowed(g, "crawler", "/x") is True
    assert robots.is_allowed(g, "stranger", "/x") is False


def test_empty_disallow_and_rule_before_agent():
    g = robots.parse_robots("Disallow: /lost\nUser-agent: *\nDisallow:\n")
    assert g["*"] == []  # empty Disallow = no rule; orphan rule dropped
    assert robots.is_allowed(g, "any", "/lost") is True


def test_spark_filter_broadcast_join(spark):
    pages = spark.createDataFrame(
        [
            Row(url="https://a.com/keep/1"),
            Row(url="https://a.com/blocked/2"),
            Row(url="https://b.com/anything"),  # no robots row -> allowed
        ]
    )
    rob = spark.createDataFrame(
        [Row(host="a.com", robots_txt="User-agent: *\nDisallow: /blocked/")]
    )
    out = {r["url"]: r["allowed"] for r in robots.robots_filter(pages, rob).collect()}
    assert out == {
        "https://a.com/keep/1": 1,
        "https://a.com/blocked/2": 0,
        "https://b.com/anything": 1,
    }
    plan = robots.robots_filter(pages, rob)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
