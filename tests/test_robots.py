"""robots.txt politeness (sources/robots.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from i2o_transform_spark.sources.robots import check_allowed, parse_robots

BODY = """# comment line
User-agent: kgbot
User-agent: otherbot
Disallow: /a
Allow: /a/ok

User-agent: *
Disallow: /b
Unknown-directive: zz
"""


def _rules(spark, rows):
    return parse_robots(spark.createDataFrame(rows, ["host", "body"]))


def _decide(spark, rules, urls, agent="kgbot"):
    fr = spark.createDataFrame([(u,) for u in urls], ["url"])
    return {
        r["url"]: (r["allowed"], r["matched_rule"])
        for r in check_allowed(fr, rules, agent).collect()
    }


def test_group_numbering_and_shared_ua_lines(spark):
    rules = _rules(spark, [("h", BODY)])
    ua = {(r["group_id"], r["agent"]) for r in rules.where(
        F.col("kind") == "user_agent").collect()}
    assert ua == {(1, "kgbot"), (1, "otherbot"), (2, "*")}
    other = [r for r in rules.collect() if r["kind"] == "other"]
    assert len(other) == 1 and other[0]["value"] == "zz"


def test_agent_election_exact_beats_star(spark):
    rules = _rules(spark, [("h", BODY)])
    got = _decide(spark, rules, [
        "https://h/a/ok/x", "https://h/a/no", "https://h/b/deep",
    ])
    # kgbot's group: /a disallowed except /a/ok; /b rule belongs to *
    assert got["https://h/a/ok/x"] == (True, "/a/ok")
    assert got["https://h/a/no"] == (False, "/a")
    assert got["https://h/b/deep"] == (True, None)
    # an unknown agent falls to the * group
    got2 = _decide(spark, rules, ["https://h/b/deep", "https://h/a/no"],
                   agent="nobody")
    assert got2["https://h/b/deep"] == (False, "/b")
    assert got2["https://h/a/no"] == (True, None)


def test_tie_allow_wins_and_empty_disallow(spark):
    body = "User-agent: *\nDisallow: /xy\nAllow: /xy\n"
    rules = _rules(spark, [("h", body)])
    assert _decide(spark, rules, ["https://h/xy/1"])[
        "https://h/xy/1"] == (True, "/xy")
    rules2 = _rules(spark, [("h", "User-agent: *\nDisallow:\n")])
    assert _decide(spark, rules2, ["https://h/any"])[
        "https://h/any"] == (True, None)


def test_no_robots_and_rules_all_miss(spark):
    rules = _rules(spark, [("h", "User-agent: *\nDisallow: /zz\n")])
    got = _decide(spark, rules, [
        "https://h/other", "https://unknownhost/x", "https://h",
    ])
    assert got["https://h/other"] == (True, None)
    assert got["https://unknownhost/x"] == (True, None)
    assert got["https://h"] == (True, None)  # bare host -> path '/'


def test_wildcard_rules_refused_or_quarantined(spark):
    body = "User-agent: *\nDisallow: /a*$\n"
    with pytest.raises(Exception):
        _rules(spark, [("h", body)]).collect()
    soft = parse_robots(
        spark.createDataFrame([("h", body)], ["host", "body"]),
        strict=False,
    )
    kinds = {r["kind"] for r in soft.collect()}
    assert "unsupported" in kinds


def test_sitemap_and_crawl_delay_surfaced(spark):
    rules = _rules(spark, [("h", BODY + "Sitemap: https://h/sm.xml\n"
                                        "Crawl-delay: 3\n")])
    got = {r["kind"]: r["value"] for r in rules.collect()}
    assert got["sitemap"] == "https://h/sm.xml"
    assert got["crawl_delay"] == "3"
