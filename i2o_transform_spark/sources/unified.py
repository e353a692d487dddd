"""Fused structured-data extraction — all three schema.org carriers in
ONE Arrow pass.

The composable path (sources/jsonld + microdata + rdfa, unioned) scans
the crawl frame THREE times: three mapInPandas stages each ship the same
~KB html strings JVM -> Arrow -> Python.  At crawl scale that triples
the dominant cost of this stage — Arrow serialization and Python string
materialization of the raw page bytes — for no semantic gain.  This
module fuses the trio into one mapInPandas stage: each html string
crosses the boundary ONCE and feeds (a) the ld+json script regex +
JSON-LD flatten, (b) the microdata walker, (c) the RDFa walker, tagging
rows with their ``syntax``.  Output is row-identical to the three-pass
union (pytest-pinned, and the driver oracle for sd_unified_fused is the
SAME SQL as sd_unified_ingest), so the fusion is a pure plan
optimization — the 100 TB default, with the per-syntax sources kept for
composability and independent testing.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from i2o_transform_spark.sources.jsonld import _SCRIPT_RE, _flatten_doc
from i2o_transform_spark.sources.microdata import (
    _Walker as _MdWalker,
)
from i2o_transform_spark.sources.rdfa import _RdfaWalker

_PY_SCRIPT_RE = re.compile(_SCRIPT_RE, re.DOTALL)

_SYNTAXES = ("jsonld", "microdata", "rdfa")


def structured_data_to_triples(
    pages: DataFrame,
    html_col: str = "html",
    key_col: str = "url",
    mode: str = "FAILFAST",
    syntaxes: tuple[str, ...] = _SYNTAXES,
    default_prefixes: dict[str, str] | None = None,
    max_depth: int = 32,
) -> DataFrame:
    """(url, html) -> (syntax, doc_key, subj, pred, obj, obj_is_iri,
    obj_datatype, obj_lang) for every requested syntax, in ONE
    mapInPandas stage.  JSON-LD rows carry doc_key = url#script_index
    (matching extract_jsonld_scripts); the walkers' doc_key is the url.
    PERMISSIVE quarantines per (syntax, document) — one carrier failing
    does not discard the others' triples from the same page."""
    if mode not in ("FAILFAST", "PERMISSIVE"):
        raise ValueError(f"mode must be FAILFAST or PERMISSIVE, got {mode!r}")
    bad = set(syntaxes) - set(_SYNTAXES)
    if bad:
        raise ValueError(f"unknown syntaxes: {sorted(bad)}")
    permissive = mode == "PERMISSIVE"
    fields = [
        StructField("syntax", StringType()),
        StructField("doc_key", StringType()),
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("obj_is_iri", BooleanType()),
        StructField("obj_datatype", StringType()),
        StructField("obj_lang", StringType()),
    ]
    if permissive:
        fields.append(StructField("_corrupt_doc", StringType()))
    schema = StructType(fields)
    cols = [f.name for f in fields]
    n_extra = 1 if permissive else 0
    want = set(syntaxes)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []

            def run(syntax: str, key: str, raw: str, fn) -> None:
                try:
                    for t in fn():
                        rows.append((syntax, key) + t + (None,) * n_extra)
                except ValueError as e:
                    if not permissive:
                        raise ValueError(
                            f"{syntax} doc {key!r}: {e}"
                        ) from e
                    rows.append((syntax, key) + (None,) * 6 + (raw,))

            for key, html in zip(pdf[key_col], pdf[html_col]):
                key, html = str(key), str(html)
                if "jsonld" in want:
                    for i, m in enumerate(_PY_SCRIPT_RE.finditer(html)):
                        body = m.group(1).strip()
                        run(
                            "jsonld", f"{key}#{i}", body,
                            lambda b=body: _flatten_doc(
                                json.loads(b), f"{key}#{i}", max_depth
                            ),
                        )

                def md():
                    w = _MdWalker(key, max_depth)
                    w.feed(html)
                    w.close()
                    return w.out

                def rd():
                    w = _RdfaWalker(key, default_prefixes)
                    w.feed(html)
                    w.close()
                    return w.out

                if "microdata" in want:
                    run("microdata", key, html, md)
                if "rdfa" in want:
                    run("rdfa", key, html, rd)
            yield pd.DataFrame(rows, columns=cols)

    return pages.select(
        F.col(key_col).cast("string").alias(key_col),
        F.col(html_col).cast("string").alias(html_col),
    ).mapInPandas(process, schema)
