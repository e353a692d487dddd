"""RDFa Lite source — the third schema.org carrier on the crawled web
(after JSON-LD script blocks and microdata): ``vocab`` / ``typeof`` /
``property`` / ``resource`` / ``prefix`` attributes on the HTML elements
themselves (W3C RDFa Lite 1.1).  With sources/jsonld and
sources/microdata this closes the structured-data extraction trio.

Same Spark shape as microdata: ONE narrow ``mapInPandas`` stage over the
(url, html) frame (nested contexts need a real parser — no JVM-regex
pre-pass), stdlib ``html.parser``, Arrow batches, zero shuffle.  Same
output schema: (doc_key, subj, pred, obj, obj_is_iri, obj_datatype,
obj_lang) — obj_datatype is always NULL here (RDFa Lite has no
``datatype`` attribute; it is full-RDFa and refused, see below).

Profile (RDFa Lite 1.1 processing, simplified-but-loud)
-------------------------------------------------------
* evaluation context inherited down the tree: current subject (the
  document IRI = doc_key at the root — page-level properties attach to
  the page, standard RDFa), vocabulary (``vocab``), prefix map
  (``prefix="p: iri q: iri"``), language (``lang``).
* term expansion: ``p:local`` through a declared prefix; an absolute URL
  verbatim; a bare term through the current ``vocab`` (refused loudly
  when no vocab is in scope).
* ``typeof``: mints a new subject — ``resource`` when present, else a
  deterministic blank node ``_: + md5(doc_key + '#rdfa' + ordinal)[:16]``
  (document order of typeof-without-resource elements, SQL-replayable) —
  emits one rdf:type triple per term, becomes the current subject for
  the subtree, and when the element ALSO carries ``property`` the new
  subject is linked from the parent subject (RDFa chaining).
* ``property`` without ``typeof``: object = ``content`` attribute when
  present (string), else ``resource`` (IRI), else ``href``/``src``
  (IRI), else the element's concatenated text (string, tagged with the
  nearest ``lang``).
* ``resource`` without ``property``/``typeof`` sets the current subject
  for the subtree.

Refused loudly (FAILFAST) or quarantined whole-document (PERMISSIVE,
``_corrupt_doc``): full-RDFa attributes (``about``, ``rel``, ``rev``,
``datatype``, ``inlist``), bare terms with no vocabulary, malformed
``prefix`` attributes.  Silent mis-extraction is never an option.
"""

from __future__ import annotations

import hashlib
from html.parser import HTMLParser
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

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta source track wbr".split()
)
_FULL_RDFA = ("about", "rel", "rev", "datatype", "inlist")


class RdfaUnsupportedError(ValueError):
    """A construct outside the RDFa Lite profile (see module docstring)."""


def _parse_prefix(attr: str) -> dict[str, str]:
    toks = attr.split()
    if len(toks) % 2 != 0:
        raise RdfaUnsupportedError(f"malformed prefix attribute {attr!r}")
    out = {}
    for i in range(0, len(toks), 2):
        pfx = toks[i]
        if not pfx.endswith(":"):
            raise RdfaUnsupportedError(
                f"prefix name {pfx!r} must end with ':'"
            )
        out[pfx[:-1]] = toks[i + 1]
    return out


class _Ctx:
    __slots__ = ("subject", "vocab", "prefixes", "lang")

    def __init__(self, subject, vocab, prefixes, lang):
        self.subject = subject
        self.vocab = vocab
        self.prefixes = prefixes
        self.lang = lang


#: RDFa 1.1 initial-context entries that real pages rely on WITHOUT a
#: ``prefix`` declaration — OpenGraph above all (the most-deployed RDFa
#: on the web ships bare ``<meta property="og:...">`` tags).
DEFAULT_PREFIXES: dict[str, str] = {
    "og": "http://ogp.me/ns#",
    "fb": "http://ogp.me/ns/fb#",
    "article": "http://ogp.me/ns/article#",
    "profile": "http://ogp.me/ns/profile#",
    "dc": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "schema": "http://schema.org/",
}


class _RdfaWalker(HTMLParser):
    def __init__(self, doc_key: str,
                 default_prefixes: dict[str, str] | None = None):
        super().__init__(convert_charrefs=True)
        self.doc_key = doc_key
        self.out: list[tuple] = []
        self.ctx = _Ctx(doc_key, None, dict(default_prefixes or {}), None)
        # frames: (tag, saved_ctx|None, collector|None)
        self.elems: list[tuple] = []
        self.collectors: list[tuple] = []  # (subj, preds, parts, lang)
        self.bnode_ordinal = 0

    def _expand(self, term: str, ctx: _Ctx) -> str:
        if "://" in term:
            return term
        if ":" in term:
            pfx, local = term.split(":", 1)
            if pfx in ctx.prefixes:
                return ctx.prefixes[pfx] + local
            raise RdfaUnsupportedError(f"undeclared prefix in {term!r}")
        if ctx.vocab:
            return ctx.vocab + term
        raise RdfaUnsupportedError(
            f"bare term {term!r} with no vocab in scope"
        )

    def _expand_resource(self, res: str, ctx: _Ctx) -> str:
        # a resource is an IRI or safe-CURIE-less CURIE; bare words are
        # NOT vocab-expanded in resource position (they are relative
        # IRIs) — keep verbatim unless prefixed
        if "://" in res or res.startswith("_:"):
            return res
        if ":" in res:
            pfx, local = res.split(":", 1)
            if pfx in ctx.prefixes:
                return ctx.prefixes[pfx] + local
        return res

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        for bad in _FULL_RDFA:
            if bad in a:
                raise RdfaUnsupportedError(
                    f"{bad!r} is full RDFa, outside the Lite profile"
                )
        parent = self.ctx
        vocab = a["vocab"].strip() if a.get("vocab") else parent.vocab
        prefixes = parent.prefixes
        if a.get("prefix"):
            prefixes = {**prefixes, **_parse_prefix(a["prefix"])}
        lang = a.get("lang") or parent.lang
        ctx = _Ctx(parent.subject, vocab, prefixes, lang)

        typeof = a.get("typeof")
        prop = a.get("property")
        resource = a.get("resource")
        collector = None

        if typeof is not None:
            if resource:
                subject = self._expand_resource(resource, ctx)
            else:
                h = hashlib.md5(
                    f"{self.doc_key}#rdfa{self.bnode_ordinal}".encode()
                ).hexdigest()
                subject = "_:" + h[:16]
                self.bnode_ordinal += 1
            for t in typeof.split():
                self.out.append(
                    (subject, RDF_TYPE, self._expand(t, ctx), True,
                     None, None)
                )
            if prop:
                for p in prop.split():
                    self.out.append(
                        (parent.subject, self._expand(p, ctx), subject,
                         True, None, None)
                    )
            ctx.subject = subject
        elif prop:
            preds = [self._expand(p, ctx) for p in prop.split()]
            if "content" in a:
                for p in preds:
                    self.out.append(
                        (ctx.subject, p, a["content"], False, None, lang)
                    )
            elif resource:
                obj = self._expand_resource(resource, ctx)
                for p in preds:
                    self.out.append((ctx.subject, p, obj, True, None, None))
                ctx.subject = obj
            elif a.get("href") or a.get("src"):
                obj = a.get("href") or a.get("src")
                for p in preds:
                    self.out.append((ctx.subject, p, obj, True, None, None))
            else:
                collector = (ctx.subject, preds, [], lang)
                self.collectors.append(collector)
        elif resource:
            ctx.subject = self._expand_resource(resource, ctx)

        if tag in _VOID_TAGS:
            if collector is not None:
                # a void element has no text; emit the empty string now
                subj, preds, _parts, clang = self.collectors.pop()
                for p in preds:
                    self.out.append((subj, p, "", False, None, clang))
            return
        self.ctx = ctx
        self.elems.append((tag, parent, collector is not None))

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID_TAGS:
            self.handle_endtag(tag)

    def handle_data(self, data):
        for (_s, _p, parts, _l) in self.collectors:
            parts.append(data)

    def handle_endtag(self, tag):
        if not any(fr[0] == tag for fr in self.elems):
            return
        while self.elems:
            t, saved_ctx, has_collector = self.elems.pop()
            if has_collector:
                subj, preds, parts, lang = self.collectors.pop()
                text = "".join(parts)
                for p in preds:
                    self.out.append((subj, p, text, False, None, lang))
            self.ctx = saved_ctx
            if t == tag:
                break

    def close(self):
        super().close()
        while self.elems:
            self.handle_endtag(self.elems[0][0])


def rdfa_to_triples(
    pages: DataFrame,
    html_col: str = "html",
    key_col: str = "url",
    mode: str = "FAILFAST",
    default_prefixes: dict[str, str] | None = None,
) -> DataFrame:
    """(url, html) -> provenance-keyed tagged triples from embedded RDFa
    Lite markup.  ``mode`` mirrors sources/ntriples/jsonld/microdata:
    FAILFAST raises on the first out-of-profile document, PERMISSIVE
    routes it whole to ``_corrupt_doc``.  ``default_prefixes`` seeds the
    root context (pass :data:`DEFAULT_PREFIXES` to read real-web
    OpenGraph/Dublin-Core markup that never declares its prefixes; the
    default stays empty so the strict profile refuses undeclared
    prefixes loudly).  One mapInPandas stage — narrow, zero shuffle."""
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
            for key, html in zip(pdf[key_col], pdf[html_col]):
                key = str(key)
                w = _RdfaWalker(key, default_prefixes)
                try:
                    w.feed(str(html))
                    w.close()
                except RdfaUnsupportedError as e:
                    if not permissive:
                        raise ValueError(f"RDFa doc {key!r}: {e}") from e
                    rows.append((key,) + (None,) * 6 + (str(html),))
                    continue
                rows.extend(
                    (key,) + t + (None,) * n_extra for t in w.out
                )
            yield pd.DataFrame(rows, columns=cols)

    return pages.select(
        F.col(key_col).cast("string").alias(key_col),
        F.col(html_col).cast("string").alias(html_col),
    ).mapInPandas(process, schema)
