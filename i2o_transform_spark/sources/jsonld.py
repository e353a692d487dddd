"""JSON-LD source (schema.org profile) — structured data embedded in
crawled pages, the single richest KG feedstock on the public web (most
commercial sites ship ``<script type="application/ld+json">`` blocks).

Spark-first shape, two composable stages:

* :func:`extract_jsonld_scripts` — pull the ld+json script bodies out of
  an HTML column with ONE JVM ``regexp_extract_all`` + ``posexplode``:
  whole-stage-codegen, zero Python, composes with the WARC reader's
  (url, html) frame unchanged.
* :func:`jsonld_to_triples` — flatten each JSON-LD document to triples in
  ONE ``mapInPandas`` stage (Arrow in: (doc_key, json) strings; Arrow
  out: typed triple rows) — the same fused narrow-stage shape as
  sources/warc.read_warc.  Per-document recursion is Python inside the
  Arrow batch (a recursive-tree flatten has no vectorized form), exactly
  the WARC record-parse precedent.

Output schema matches ``sources/ntriples.parse_ntriples_lines(
keep_tags=True)`` — (subj, pred, obj, obj_is_iri, obj_datatype,
obj_lang), prefixed with the provenance ``doc_key`` — so extracted
triples flow unchanged into the SPARQL engine (tagged-store support
included: ``@language`` values become ``obj_lang``) and the N-Triples
serializer.

Supported (the schema.org profile)
----------------------------------
* ``@context``: a string (treated as ``@vocab`` base, trailing-slash
  normalized — the ``"@context": "https://schema.org"`` convention) or a
  map of ``prefix -> IRI-string`` entries plus optional ``@vocab``.
* ``@id`` / ``@type`` (string or list), ``@graph`` root arrays.
* properties: scalars (str plain; bool/int/float canonicalized with
  xsd:boolean/integer/double datatypes), node objects (recursed, edge by
  ``@id`` or deterministic blank node), arrays (one triple per element,
  ``null`` elements dropped per spec), ``@value`` objects with
  ``@language`` XOR ``@type``, ``@set`` unwrapping.
* blank nodes: a node object without ``@id`` gets
  ``_: + md5(doc_key + json_path)[:16]`` — deterministic, so tests and
  SQL oracles replay it exactly (DuckDB md5 matches).

Refused loudly (``FAILFAST``) or quarantined (``PERMISSIVE`` — the doc
routes whole to ``_corrupt_doc``, mirroring the N-Triples reader's
quarantine contract): ``@reverse``, ``@list``, ``@container``,
non-string term definitions, nested ``@context`` below the root,
``@value`` carrying both a language and a type, recursion beyond
``max_depth``.  Silent mis-flattening is never an option.
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_SCRIPT_RE = (
    r"(?is)<script[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>"
    r"(.*?)</script>"
)


class JsonLdUnsupportedError(ValueError):
    """A construct outside the schema.org profile (see module docstring)."""


def extract_jsonld_scripts(
    pages: DataFrame, html_col: str = "html", key_col: str = "url"
) -> DataFrame:
    """(key, html) -> one row per embedded ld+json script block:
    (doc_key, script_index, jsonld).  Pure JVM regex — no Python."""
    html = F.col(html_col).cast("string")
    return (
        pages.select(
            F.col(key_col).cast("string").alias("_k"),
            F.regexp_extract_all(html, F.lit(_SCRIPT_RE), 1).alias("_s"),
        )
        .select("_k", F.posexplode("_s").alias("script_index", "jsonld"))
        .select(
            F.concat(F.col("_k"), F.lit("#"), F.col("script_index"))
            .alias("doc_key"),
            "script_index",
            # trim() strips only spaces — scripts are newline-padded
            F.regexp_replace("jsonld", r"^\s+|\s+$", "").alias("jsonld"),
        )
    )


def _parse_context(ctx) -> tuple[str | None, dict[str, str]]:
    if ctx is None:
        return None, {}
    if isinstance(ctx, str):
        return ctx.rstrip("/") + "/", {}
    if isinstance(ctx, dict):
        vocab, prefixes = None, {}
        for k, v in ctx.items():
            if k == "@vocab":
                if not isinstance(v, str):
                    raise JsonLdUnsupportedError("@vocab must be a string")
                vocab = v
            elif isinstance(v, str):
                prefixes[k] = v
            else:
                raise JsonLdUnsupportedError(
                    f"term definition {k!r} is not a plain IRI string"
                )
        return vocab, prefixes
    raise JsonLdUnsupportedError("@context must be a string or a map")


def _expand(term: str, vocab: str | None, prefixes: dict[str, str]) -> str:
    """schema.org-profile IRI expansion: known prefix wins, other
    colon-bearing terms pass verbatim (absolute IRIs), bare terms take
    the vocabulary base when one is declared."""
    if ":" in term:
        pfx, local = term.split(":", 1)
        if pfx in prefixes:
            return prefixes[pfx] + local
        return term
    return vocab + term if vocab else term


def _bnode(doc_key: str, path: str) -> str:
    h = hashlib.md5((doc_key + path).encode("utf-8")).hexdigest()
    return "_:" + h[:16]


def _literal(v) -> tuple[str, str | None]:
    """(lexical, datatype) for a JSON scalar.  bool before int — Python
    bools ARE ints."""
    if isinstance(v, bool):
        return ("true" if v else "false",
                "http://www.w3.org/2001/XMLSchema#boolean")
    if isinstance(v, int):
        return str(v), "http://www.w3.org/2001/XMLSchema#integer"
    if isinstance(v, float):
        return repr(v), "http://www.w3.org/2001/XMLSchema#double"
    if isinstance(v, str):
        return v, None
    raise JsonLdUnsupportedError(f"unsupported scalar {type(v).__name__}")


def _flatten_node(
    node: dict, doc_key: str, path: str,
    vocab, prefixes, out: list, depth: int, max_depth: int,
) -> str:
    """Flatten one node object; returns its subject id.  Appends
    (subj, pred, obj, obj_is_iri, obj_datatype, obj_lang) rows to out."""
    if depth > max_depth:
        raise JsonLdUnsupportedError(
            f"nesting beyond max_depth={max_depth} at {path!r}"
        )
    if "@context" in node and path != "":
        raise JsonLdUnsupportedError(f"nested @context at {path!r}")
    sid = node.get("@id")
    if sid is not None:
        if not isinstance(sid, str):
            raise JsonLdUnsupportedError(f"@id at {path!r} is not a string")
        sid = _expand(sid, vocab, prefixes)
    else:
        sid = _bnode(doc_key, path)
    types = node.get("@type", [])
    for t in types if isinstance(types, list) else [types]:
        if not isinstance(t, str):
            raise JsonLdUnsupportedError(f"@type at {path!r} is not a string")
        out.append((sid, RDF_TYPE, _expand(t, vocab, prefixes),
                    True, None, None))
    for key, val in node.items():
        if key in ("@context", "@id", "@type"):
            continue
        if key.startswith("@"):
            raise JsonLdUnsupportedError(f"keyword {key} at {path!r}")
        pred = _expand(key, vocab, prefixes)
        items = val if isinstance(val, list) else [val]
        for i, v in enumerate(items):
            if v is None:
                continue  # JSON-LD: null drops the entry
            vpath = f"{path}/{key}/{i}"
            if isinstance(v, dict):
                if "@list" in v or "@reverse" in v or "@container" in v:
                    raise JsonLdUnsupportedError(
                        f"@list/@reverse/@container at {vpath!r}"
                    )
                if "@set" in v:
                    extra = [k for k in v if k != "@set"]
                    if extra:
                        raise JsonLdUnsupportedError(
                            f"@set with sibling keys {extra} at {vpath!r}"
                        )
                    items.extend(
                        e for e in (v["@set"] if isinstance(v["@set"], list)
                                    else [v["@set"]])
                    )
                    continue
                if "@value" in v:
                    lang = v.get("@language")
                    dt = v.get("@type")
                    if lang is not None and dt is not None:
                        raise JsonLdUnsupportedError(
                            f"@value with both @language and @type at "
                            f"{vpath!r}"
                        )
                    lex, inferred = _literal(v["@value"])
                    out.append((
                        sid, pred, lex, False,
                        _expand(dt, vocab, prefixes) if dt else
                        (None if lang else inferred),
                        lang,
                    ))
                    continue
                cid = _flatten_node(v, doc_key, vpath, vocab, prefixes,
                                    out, depth + 1, max_depth)
                out.append((sid, pred, cid, True, None, None))
            else:
                lex, dt = _literal(v)
                out.append((sid, pred, lex, False, dt, None))
    return sid


def _flatten_doc(doc, doc_key: str, max_depth: int) -> list[tuple]:
    out: list[tuple] = []
    if isinstance(doc, list):  # top-level array = multiple root nodes
        doc = {"@graph": doc}
    if not isinstance(doc, dict):
        raise JsonLdUnsupportedError("document root is not an object/array")
    vocab, prefixes = _parse_context(doc.get("@context"))
    if "@graph" in doc:
        roots = doc["@graph"]
        if not isinstance(roots, list):
            raise JsonLdUnsupportedError("@graph must be an array")
        extra = [k for k in doc if k not in ("@context", "@graph")]
        if extra:
            raise JsonLdUnsupportedError(
                f"@graph with sibling properties {extra}"
            )
        for i, r in enumerate(roots):
            if not isinstance(r, dict):
                raise JsonLdUnsupportedError(f"@graph[{i}] is not an object")
            _flatten_node(r, doc_key, f"/@graph/{i}", vocab, prefixes,
                          out, 1, max_depth)
    else:
        _flatten_node(doc, doc_key, "", vocab, prefixes, out, 1, max_depth)
    return out


def jsonld_to_triples(
    docs: DataFrame,
    json_col: str = "jsonld",
    key_col: str = "doc_key",
    mode: str = "FAILFAST",
    max_depth: int = 32,
) -> DataFrame:
    """(doc_key, jsonld) -> provenance-keyed tagged triples.

    ``mode`` mirrors sources/ntriples: FAILFAST raises on the first
    malformed or out-of-profile document; PERMISSIVE emits the offending
    raw text in ``_corrupt_doc`` (parse columns NULL) so a crawl-scale
    ingest quarantines junk instead of dying.  One mapInPandas stage —
    narrow, no shuffle; parallelism is the input partitioning."""
    if mode not in ("FAILFAST", "PERMISSIVE"):
        raise ValueError(f"mode must be FAILFAST or PERMISSIVE, got {mode!r}")
    permissive = mode == "PERMISSIVE"
    fields = [
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

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for key, txt in zip(pdf[key_col], pdf[json_col]):
                key = str(key)
                try:
                    triples = _flatten_doc(json.loads(txt), key, max_depth)
                except (ValueError, RecursionError) as e:
                    # json.JSONDecodeError and JsonLdUnsupportedError both
                    if not permissive:
                        raise ValueError(
                            f"JSON-LD doc {key!r}: {e}"
                        ) from e
                    rows.append((key,) + (None,) * 6 + (str(txt),))
                    continue
                rows.extend(
                    (key,) + t + (None,) * n_extra for t in triples
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(
        F.col(key_col).cast("string").alias(key_col), json_col
    ).mapInPandas(process, schema)
