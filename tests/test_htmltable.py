"""HTML table extraction (sources/htmltable) + semantic type inference
(profile.infer_column_types): walker fidelity, entity decode, header
election, ragged rows, class election."""

from __future__ import annotations

from pyspark.sql import functions as F

from i2o_transform_spark.operators.profile import infer_column_types
from i2o_transform_spark.sources.htmltable import (
    extract_tables,
    tables_to_attr_values,
)

P = "url string, html string"


def rows(df):
    cols = sorted(df.columns)
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


def test_walker_two_tables_with_markup(spark):
    html = (
        "<html><p>noise</p>"
        "<table><tr><th>a</th><th>b</th></tr>"
        "<tr><td>1</td><td><b>x</b></td></tr></table>"
        "<div><table><tr><td>only</td></tr></table></div></html>"
    )
    got = rows(extract_tables(
        spark.createDataFrame([("u", html)], P), keep=["url"]
    ))
    # (cell, col_idx, is_header, row_idx, table_idx, url) sorted-col order
    assert ("a", 0, True, 0, 0, "u") in got
    assert ("b", 1, True, 0, 0, "u") in got
    assert ("1", 0, False, 1, 0, "u") in got
    assert ("x", 1, False, 1, 0, "u") in got      # nested <b> stripped
    assert ("only", 0, False, 0, 1, "u") in got   # second table
    assert len(got) == 5


def test_entity_decode_and_ragged_rows(spark):
    html = (
        "<table><tr><td>a &amp; b</td><td>&lt;tag&gt;</td></tr>"
        "<tr><td>&quot;q&quot;</td></tr></table>"
    )
    got = rows(extract_tables(spark.createDataFrame([("u", html)], P),
                              keep=["url"]))
    cells = {r[0] for r in got}
    assert cells == {"a & b", "<tag>", '"q"'}
    # ragged second row has a single cell at col 0
    assert ('"q"', 0, False, 1, 0, "u") in got


def test_attr_values_header_election_and_anon_drop(spark):
    html = (
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>1</td><td>x</td></tr>"
        "<tr><td>2</td><td>y</td></tr></table>"
        "<table><tr><td>anon</td></tr></table>"  # headerless: dropped
    )
    av = tables_to_attr_values(
        extract_tables(spark.createDataFrame([("u", html)], P),
                       keep=["url"]),
        keep=["url"],
    )
    got = rows(av)
    assert got == {
        ("k", 0, "u", "1"), ("k", 0, "u", "2"),
        ("v", 0, "u", "x"), ("v", 0, "u", "y"),
    }


def test_type_inference_classes(spark):
    av = spark.createDataFrame(
        [("i", "42"), ("i", "-7"),
         ("d", "2024-01-31"),
         ("f", "3.14"),
         ("b", "TRUE"), ("b", "false"),
         ("u", "https://ex.org/p?q=1"),
         ("e", "a@b.co"),
         ("t", "hello world")],
        "attr string, value string",
    )
    got = {r["attr"]: (r["elected_type"], r["elected_ppm"], r["n_values"])
           for r in infer_column_types(av).collect()}
    assert got["i"] == ("integer", 1_000_000, 2)
    assert got["d"] == ("date", 1_000_000, 1)
    assert got["f"] == ("decimal", 1_000_000, 1)
    assert got["b"] == ("boolean", 1_000_000, 2)
    assert got["u"] == ("url", 1_000_000, 1)
    assert got["e"] == ("email", 1_000_000, 1)
    assert got["t"] == ("text", 1_000_000, 1)


def test_type_inference_plurality_and_ppm(spark):
    av = spark.createDataFrame(
        [("m", "1"), ("m", "2"), ("m", "3"), ("m", "oops")],
        "attr string, value string",
    )
    got = infer_column_types(av).collect()[0]
    assert got["elected_type"] == "integer"
    assert got["elected_ppm"] == 750_000
    assert got["n_values"] == 4


def _cells(spark, html):
    return extract_tables(spark.createDataFrame([("u", html)], P),
                          keep=["url"])


def test_infer_headers_promotes_typed_contrast(spark):
    from i2o_transform_spark.sources.htmltable import infer_headers

    html = (
        "<table>"
        "<tr><td>id</td><td>price</td></tr>"
        "<tr><td>1</td><td>9.99</td></tr>"
        "<tr><td>2</td><td>8.50</td></tr></table>"
    )
    got = infer_headers(_cells(spark, html), keep=["url"])
    hdr = {(r["row_idx"], r["col_idx"])
           for r in got.where("is_header").collect()}
    assert hdr == {(0, 0), (0, 1)}
    # and the promoted header now feeds attribute names
    av = rows(tables_to_attr_values(got, keep=["url"]))
    assert ("id", 0, "u", "1") in av and ("price", 0, "u", "9.99") in av


def test_infer_headers_leaves_all_text_tables(spark):
    from i2o_transform_spark.sources.htmltable import infer_headers

    html = (
        "<table><tr><td>alpha</td></tr><tr><td>beta</td></tr>"
        "<tr><td>gamma</td></tr></table>"
    )
    got = infer_headers(_cells(spark, html), keep=["url"])
    assert got.where("is_header").count() == 0


def test_infer_headers_respects_existing_th(spark):
    from i2o_transform_spark.sources.htmltable import infer_headers

    html = (
        "<table><tr><th>k</th></tr><tr><td>1</td></tr>"
        "<tr><td>2</td></tr></table>"
    )
    got = infer_headers(_cells(spark, html), keep=["url"])
    hdr = {(r["row_idx"], r["is_header"]) for r in got.collect()}
    assert hdr == {(0, True), (1, False), (2, False)}


def test_infer_headers_min_rows_guard(spark):
    from i2o_transform_spark.sources.htmltable import infer_headers

    html = "<table><tr><td>id</td></tr><tr><td>1</td></tr></table>"
    got = infer_headers(_cells(spark, html), keep=["url"], min_rows=3)
    assert got.where("is_header").count() == 0
    got2 = infer_headers(_cells(spark, html), keep=["url"], min_rows=2)
    assert got2.where("is_header").count() == 1


def test_tables_to_triples(spark):
    from i2o_transform_spark.sources.htmltable import tables_to_triples

    html = (
        "<table><tr><th>id</th><th>name</th><th>city</th></tr>"
        "<tr><td>e1</td><td>Ada</td><td>Paris</td></tr>"
        "<tr><td>e2</td><td>Bob</td><td></td></tr></table>"
        "<table><tr><td>anon</td><td>x</td></tr></table>"  # headerless
    )
    got = rows(tables_to_triples(_cells(spark, html), keep=["url"]))
    assert got == {
        ("Ada", "name", "e1"), ("Paris", "city", "e1"),
        ("Bob", "name", "e2"), ("", "city", "e2"),
    }


def test_tables_to_triples_key_col(spark):
    from i2o_transform_spark.sources.htmltable import tables_to_triples

    html = (
        "<table><tr><th>name</th><th>id</th></tr>"
        "<tr><td>Ada</td><td>e1</td></tr></table>"
    )
    got = rows(tables_to_triples(_cells(spark, html), keep=["url"],
                                 key_col=1))
    assert got == {("Ada", "name", "e1")}


def test_stitch_groups_by_schema(spark):
    from i2o_transform_spark.sources.htmltable import stitch_tables

    p1 = ("<table><tr><th>a</th><th>b</th></tr>"
          "<tr><td>1</td><td>2</td></tr></table>")
    p2 = ("<table><tr><th>a</th><th>b</th></tr>"
          "<tr><td>3</td><td>4</td></tr><tr><td>5</td><td>6</td></tr>"
          "</table>"
          "<table><tr><th>z</th></tr><tr><td>9</td></tr></table>")
    cells = extract_tables(
        spark.createDataFrame([("u1", p1), ("u2", p2)], P), keep=["url"]
    )
    got = {r["schema_sig"]: (r["n_tables"], r["n_rows"])
           for r in stitch_tables(cells, keep=["url"]).collect()}
    assert got["a\x1fb"] == (2, 3)
    assert got["z"] == (1, 1)


def test_extract_attr_values_matches_composable(spark):
    from i2o_transform_spark.sources.htmltable import extract_attr_values

    html1 = (
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>1</td><td>x &amp; y</td></tr>"
        "<tr><td>2</td><td>z</td><td>ragged-extra</td></tr></table>"
        "<table><tr><td>anon</td></tr></table>"  # headerless: nothing
    )
    # second page: entity-escaped header + empty cell
    html2 = (
        "<table><tr><th>a &amp; b</th><th>c</th></tr>"
        "<tr><td></td><td>2</td></tr>"
        "<tr><td>3</td><td>4</td></tr></table>"
    )
    pages = spark.createDataFrame([("u1", html1), ("u2", html2)], P)
    fast = rows(extract_attr_values(pages, keep=["url"]))
    slow = rows(tables_to_attr_values(
        extract_tables(pages, keep=["url"]), keep=["url"]
    ))
    assert fast == slow
    assert ("k", 0, "u1", "1") in fast
    assert ("v", 0, "u1", "x & y") in fast
    # ragged extra cell (no covering header) dropped on both paths
    assert not any(v == "ragged-extra" for (_, _, _, v) in fast)
    assert ("a & b", 0, "u2", "") in fast and ("c", 0, "u2", "2") in fast


def test_multi_header_fast_path_matches_composable(spark):
    """Grouped-header layouts (several <th> rows, ragged header rows,
    mixed td/th cells inside a header row) elect per-column identically
    on the single-pass and composable paths — the r04 stated divergence,
    closed."""
    from i2o_transform_spark.sources.htmltable import extract_attr_values

    html = (
        # header row 1 covers cols 0-1; header row 2 covers 0-2 (col 2's
        # header must come from row 2; cols 0-1 from row 1); row 2 mixes
        # a td into the header row (still a header row: contains a th)
        "<table><tr><th>A</th><th>B</th></tr>"
        "<tr><th>a2</th><td>b2</td><th>C</th></tr>"
        "<tr><td>1</td><td>2</td><td>3</td></tr>"
        "<tr><td>4</td><td>5</td><td>6</td><td>no-header</td></tr></table>"
        # single-header control on the same page
        "<table><tr><th>K</th></tr><tr><td>k1</td></tr></table>"
        # headerless: contributes nothing on either path
        "<table><tr><td>x</td></tr></table>"
    )
    pages = spark.createDataFrame([("u", html)], P)
    fast = rows(extract_attr_values(pages, keep=["url"]))
    slow = rows(tables_to_attr_values(
        extract_tables(pages, keep=["url"]), keep=["url"]
    ))
    assert fast == slow
    assert ("A", 0, "u", "1") in fast and ("B", 0, "u", "2") in fast
    assert ("C", 0, "u", "3") in fast            # elected from row 2
    assert ("C", 0, "u", "6") in fast
    assert not any(v == "no-header" for (_, _, _, v) in fast)
    assert ("K", 1, "u", "k1") in fast
    assert not any(v == "x" for (_, _, _, v) in fast)


def test_mixed_case_tags_and_thead_guard(spark):
    """Crawl HTML mixes tag case: <TABLE>/<Tr>/<TD> parse identically to
    lowercase on both the walker and the single-pass path, and <thead>/
    <track> can never false-match the <th>/<tr> openers."""
    from i2o_transform_spark.sources.htmltable import extract_attr_values

    upper = (
        "<TABLE CLASS='x'><THEAD><TR><TH>K</TH><TH>V</TH></TR></THEAD>"
        "<TR><TD>1</TD><TD>a</TD></TR>"
        "<Tr><Td>2</Td><td>b</td></Tr></TABLE>"
    )
    lower = (
        "<table class='x'><thead><tr><th>K</th><th>V</th></tr></thead>"
        "<tr><td>1</td><td>a</td></tr>"
        "<tr><td>2</td><td>b</td></tr></table>"
    )
    up = spark.createDataFrame([("u", upper)], P)
    lo = spark.createDataFrame([("u", lower)], P)
    got_up = rows(extract_tables(up, keep=["url"]))
    assert got_up == rows(extract_tables(lo, keep=["url"]))
    assert ("K", 0, True, 0, 0, "u") in got_up
    assert ("2", 0, False, 2, 0, "u") in got_up
    fast_up = rows(extract_attr_values(up, keep=["url"]))
    assert fast_up == rows(extract_attr_values(lo, keep=["url"]))
    assert fast_up == {
        ("K", 0, "u", "1"), ("V", 0, "u", "a"),
        ("K", 0, "u", "2"), ("V", 0, "u", "b"),
    }
