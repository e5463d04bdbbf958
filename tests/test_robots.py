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


def test_sitemap_build_parse_roundtrip():
    from weblog_pipeline import sitemap

    urls = [f"https://h/{i}" for i in range(5)]
    xml = sitemap.build_sitemap(urls)
    assert sitemap.parse_sitemap(xml) == urls
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sitemap.parse_sitemap("<urlset><url>broken")


def test_sitemap_coverage_spark(spark):
    from pyspark.sql import functions as F

    from weblog_pipeline import sitemap

    pages = spark.createDataFrame(
        [(f"https://d{i % 2}.com/p/{i}",) for i in range(10)], "url string"
    )
    doc = F.regexp_extract(F.col("url"), r"/p/(\d+)$", 1).cast("long")
    maps = sitemap.sitemaps_from_pages(pages, doc % 3 == 0)  # 0,3,6,9 adv
    crawled = pages.where(doc % 5 != 0)  # 0,5 withheld
    got = {r["host"]: (r["n_advertised"], r["n_crawled"], r["n_matched"])
           for r in sitemap.sitemap_coverage(crawled, maps).collect()}
    # d0 hosts evens 0,2,4,6,8: adv {0,6}, crawled {2,4,6,8}, matched {6}
    assert got["d0.com"] == (2, 4, 1)
    # d1 hosts odds 1,3,5,7,9: adv {3,9}, crawled {1,3,7,9}, matched {3,9}
    assert got["d1.com"] == (2, 4, 2)


def test_sitemap_coverage_dedups_recrawled_urls(spark):
    from pyspark.sql import functions as F

    from weblog_pipeline import sitemap

    # the same url crawled twice must count once
    pages = spark.createDataFrame(
        [("https://d.com/p/1",), ("https://d.com/p/1",), ("https://d.com/p/2",)],
        "url string",
    )
    maps = sitemap.sitemaps_from_pages(pages.distinct(), F.lit(True))
    got = sitemap.sitemap_coverage(pages, maps).collect()[0]
    assert (got["n_advertised"], got["n_crawled"], got["n_matched"]) == (2, 2, 2)
