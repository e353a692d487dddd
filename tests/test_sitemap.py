"""Sitemap source (sources/sitemap.py)."""

from __future__ import annotations

from i2o_transform_spark.sources.sitemap import parse_sitemaps

URLSET = (
    '<?xml version="1.0"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>https://e/a?x=1&amp;y=&amp;lt;2</loc>"
    "<lastmod>2024-01-02T03:04:05Z</lastmod>"
    "<changefreq>daily</changefreq><priority>0.85</priority></url>"
    "<url><loc>https://e/b</loc></url></urlset>"
)
INDEX = (
    "<sitemapindex><sitemap><loc>https://e/s1.xml</loc>"
    "<lastmod>2024-02-03</lastmod></sitemap>"
    "<sitemap><loc>https://e/s2.xml</loc></sitemap></sitemapindex>"
)


def _parse(spark, rows):
    df = spark.createDataFrame(rows, ["url", "xml"])
    return sorted(
        map(tuple, parse_sitemaps(df).collect()),
        key=lambda r: (r[0], r[2] if r[2] is not None else -1),
    )


def test_urlset_fields_and_unescape(spark):
    rows = _parse(spark, [("u", URLSET)])
    assert rows[0] == ("u", "urlset", 0, "https://e/a?x=1&y=&lt;2",
                       "2024-01-02T03:04:05Z", "daily", 850000)
    assert rows[1] == ("u", "urlset", 1, "https://e/b", None, None, None)


def test_index_and_unknown_kinds(spark):
    rows = _parse(spark, [("i", INDEX), ("j", "not xml at all")])
    assert rows[:2] == [
        ("i", "index", 0, "https://e/s1.xml", "2024-02-03", None, None),
        ("i", "index", 1, "https://e/s2.xml", None, None, None),
    ]
    assert rows[2] == ("j", "unknown", None, None, None, None, None)


def test_bad_priority_is_null_not_error(spark):
    xml = ("<urlset><url><loc>https://e/x</loc>"
           "<priority>very high</priority></url></urlset>")
    rows = _parse(spark, [("u", xml)])
    assert rows[0][6] is None


def test_plan_is_narrow_and_jvm_only(spark):
    df = spark.createDataFrame([("u", URLSET)], ["url", "xml"])
    plan = (parse_sitemaps(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure JVM: no Arrow/Python eval nodes
