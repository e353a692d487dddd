"""Sitemap source — crawl seed management for the KG builder's ingest
frontier: parse sitemap.org XML (``<urlset>`` page lists and
``<sitemapindex>`` sitemap-of-sitemaps) into a typed URL frontier frame.

Spark-first shape: the sitemap grammar is FLAT (one level of ``<url>`` /
``<sitemap>`` blocks, no recursion inside a document), so unlike the
HTML walkers this parses with pure JVM ``regexp_extract_all`` +
``posexplode`` + per-block ``regexp_extract`` — whole-stage codegen,
zero Python, zero shuffle.  Index files are emitted as ``kind='index'``
rows whose ``loc`` is the child sitemap URL; the caller loops fetch →
parse until no index rows remain (driver-side loop over WAVES of
fetches, never over rows).

Fields per entry: ``loc`` (XML-unescaped), ``lastmod`` (verbatim W3C
datetime string — casting is the caller's choice), ``changefreq``, and
``priority_ppm`` (integer ppm per the repo's no-floats rule; NULL when
absent or unparseable).  Out-of-profile inputs (no urlset/sitemapindex
root) yield kind='unknown' with zero entries rather than silent empties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_URL_BLOCK = r"(?is)<url\s*>(.*?)</url\s*>"
_SM_BLOCK = r"(?is)<sitemap\s*>(.*?)</sitemap\s*>"


def _tag(block: Column, tag: str) -> Column:
    got = F.regexp_extract(
        block, rf"(?is)<{tag}\s*>\s*(.*?)\s*</{tag}\s*>", 1
    )
    return F.when(got != "", got)


def _xml_unescape(c: Column) -> Column:
    """The five XML predefined entities — &amp; LAST so escaped escapes
    (&amp;lt;) decode to the literal entity text, not twice."""
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def parse_sitemaps(
    sitemaps: DataFrame,
    xml_col: str = "xml",
    key_col: str = "url",
) -> DataFrame:
    """(url, xml) -> one row per sitemap entry:
    (sitemap_url, kind, entry_index, loc, lastmod, changefreq,
    priority_ppm).

    kind='urlset' rows are crawlable page URLs; kind='index' rows are
    child sitemap URLs to fetch next; kind='unknown' marks documents
    with neither root (one row, NULL loc) so junk is visible, not
    dropped."""
    xml = F.col(xml_col).cast("string")
    kind = (
        F.when(xml.rlike(r"(?is)<\s*sitemapindex[\s>]"), F.lit("index"))
        .when(xml.rlike(r"(?is)<\s*urlset[\s>]"), F.lit("urlset"))
        .otherwise(F.lit("unknown"))
    )
    block_re = F.when(
        F.col("kind") == "index", F.lit(_SM_BLOCK)
    ).otherwise(F.lit(_URL_BLOCK))
    base = sitemaps.select(
        F.col(key_col).cast("string").alias("sitemap_url"),
        kind.alias("kind"),
        xml.alias("_xml"),
    )
    exploded = base.select(
        "sitemap_url",
        "kind",
        F.posexplode_outer(
            F.when(
                F.col("kind") != "unknown",
                F.regexp_extract_all("_xml", block_re, F.lit(1)),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("entry_index", "_block"),
    )
    b = F.col("_block")
    return exploded.select(
        "sitemap_url",
        "kind",
        F.col("entry_index").cast("long").alias("entry_index"),
        _xml_unescape(_tag(b, "loc")).alias("loc"),
        _tag(b, "lastmod").alias("lastmod"),
        _tag(b, "changefreq").alias("changefreq"),
        (_tag(b, "priority").try_cast("decimal(8,6)") * 1000000)
        .cast("long")
        .alias("priority_ppm"),
    )
