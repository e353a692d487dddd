"""Property-graph JSONL interchange — nodes/edges as JSON lines.

The labeled-property-graph twin of sources/ntriples.py: one JSON object
per line (`{"id": ..., "label": ..., "props": {...}}` for nodes,
`{"src": ..., "dst": ..., "label": ..., "props": {...}}` for edges) —
the wire format bulk loaders for property-graph stores (Neptune CSV/JSONL
flavors, JanusGraph, Memgraph import) actually consume, and line-parallel
at any scale exactly like N-Triples (spark.read.text splits on lines).

Writer contract: prop keys are written in the CALLER-DECLARED order, and
strings are escaped with the minimal JSON chain (backslash first, then
quote, then the control whitelist) — byte-deterministic output, so the
DuckDB oracle re-derives exact wire bytes with its own replace chain.
The parser uses ``get_json_object`` (a real JSON parser, JVM-side), so a
matched writer/parser escaping bug cannot cancel out when BOTH the wire
bytes and the roundtrip values are oracle-pinned (the nt_serialize /
nt_roundtrip dual-gate pattern).

Everything here is a pure map — zero shuffle either direction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _esc(col: Column) -> Column:
    """Minimal JSON string escape: backslash, quote, and the control
    chars JSON forbids raw (tab, newline, carriage return)."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\t", "\\\\t")
    out = F.regexp_replace(out, "\n", "\\\\n")
    return F.regexp_replace(out, "\r", "\\\\r")


def _props_json(prop_cols: list[str]) -> Column:
    pieces = [
        F.concat(F.lit(f'"{c}":"'), _esc(F.col(c).cast("string")),
                 F.lit('"'))
        for c in prop_cols
    ]
    return F.concat(F.lit("{"), F.concat_ws(",", *pieces), F.lit("}"))


def to_node_lines(
    nodes: DataFrame,
    id_col: str = "id",
    label_col: str = "label",
    prop_cols: list[str] | None = None,
) -> DataFrame:
    """(id, label, props...) -> one JSON line per node (column ``line``)."""
    return nodes.select(
        F.concat(
            F.lit('{"id":"'), _esc(F.col(id_col).cast("string")),
            F.lit('","label":"'), _esc(F.col(label_col).cast("string")),
            F.lit('","props":'), _props_json(prop_cols or []),
            F.lit("}"),
        ).alias("line")
    )


def to_edge_lines(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    label_col: str = "label",
    prop_cols: list[str] | None = None,
) -> DataFrame:
    """(src, dst, label, props...) -> one JSON line per edge."""
    return edges.select(
        F.concat(
            F.lit('{"src":"'), _esc(F.col(src_col).cast("string")),
            F.lit('","dst":"'), _esc(F.col(dst_col).cast("string")),
            F.lit('","label":"'), _esc(F.col(label_col).cast("string")),
            F.lit('","props":'), _props_json(prop_cols or []),
            F.lit("}"),
        ).alias("line")
    )


def parse_node_lines(
    lines: DataFrame, prop_cols: list[str] | None = None
) -> DataFrame:
    """JSON node lines -> (id, label, <prop_cols...>) via a real JSON
    parser (get_json_object, JVM-side)."""
    g = lambda p: F.get_json_object(F.col("line"), p)  # noqa: E731
    return lines.select(
        g("$.id").alias("id"),
        g("$.label").alias("label"),
        *[g(f"$.props.{c}").alias(c) for c in prop_cols or []],
    )


def parse_edge_lines(
    lines: DataFrame, prop_cols: list[str] | None = None
) -> DataFrame:
    """JSON edge lines -> (src, dst, label, <prop_cols...>)."""
    g = lambda p: F.get_json_object(F.col("line"), p)  # noqa: E731
    return lines.select(
        g("$.src").alias("src"),
        g("$.dst").alias("dst"),
        g("$.label").alias("label"),
        *[g(f"$.props.{c}").alias(c) for c in prop_cols or []],
    )
