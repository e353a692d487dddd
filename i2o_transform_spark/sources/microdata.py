"""Microdata source (schema.org profile) — the OTHER structured-data
syntax crawled pages embed: ``itemscope`` / ``itemtype`` / ``itemprop``
attributes inline on the HTML elements themselves (vs JSON-LD's script
blocks).  Together with sources/jsonld this covers the two dominant
schema.org carriers on the public web.

Spark-first shape: ONE ``mapInPandas`` stage straight over the (url,
html) frame — unlike JSON-LD there is no JVM-regex pre-extraction stage,
because microdata items NEST arbitrarily in the element tree and slicing
them out needs a real parser; the stage is still narrow (no shuffle,
parallelism = input partitioning), Arrow-batched, and uses only the
stdlib ``html.parser`` — the same fused record-parse shape as
sources/warc.read_warc.

Output schema matches sources/jsonld.jsonld_to_triples: (doc_key, subj,
pred, obj, obj_is_iri, obj_datatype, obj_lang) — so microdata triples
flow unchanged into the tagged-store SPARQL engine and the N-Triples
serializer.

Profile (the microdata-to-RDF core)
-----------------------------------
* ``itemscope`` opens an item; ``itemtype`` (space-separated absolute
  IRIs) emits rdf:type triples; ``itemid`` names the subject, otherwise
  a deterministic blank node ``_: + md5(doc_key + '#item' + ordinal)[:16]``
  (ordinal = document order of itemscope start tags — SQL-replayable,
  DuckDB md5 matches).
* property IRIs: an absolute URL name passes verbatim; a bare name takes
  the item's vocabulary — its first ``itemtype`` up to and including the
  last ``/`` or ``#`` (the schema.org rule), inherited from the nearest
  typed ancestor item when the item itself is untyped.
* value per element (the HTML microdata value table): a nested
  ``itemscope`` -> the child item's id (IRI object); ``meta`` ->
  ``content``; ``a``/``area``/``link`` -> ``href``; ``img``/``audio``/
  ``video``/``source``/``iframe``/``embed``/``track`` -> ``src``;
  ``data`` -> ``value``; ``time`` -> ``datetime`` (else text) with
  lexical-form sniffing to xsd:date / xsd:dateTime / xsd:time /
  xsd:gYear; anything else -> concatenated descendant text.
* ``itemprop="a b"`` emits one triple per name; an element that is both
  ``itemprop`` and ``itemscope`` links parent item to child item; an
  ``itemscope`` WITHOUT ``itemprop`` is a top-level item wherever it
  appears (per spec).
* language: the nearest ``lang`` attribute in the element tree tags
  every string value from that subtree (``obj_lang``, composing with the
  SPARQL tagged-store support); datatyped values carry no tag.

Refused loudly (FAILFAST) or quarantined whole-document (PERMISSIVE,
``_corrupt_doc`` — the N-Triples/JSON-LD contract): ``itemref``
(cross-tree property graphs), a bare property name on an item with no
vocabulary in scope, item nesting beyond ``max_depth``.  Silent
mis-extraction is never an option.
"""

from __future__ import annotations

import hashlib
import re
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

_XSD = "http://www.w3.org/2001/XMLSchema#"
_TIME_SNIFF = (
    (re.compile(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}(:\d{2}(\.\d+)?)?"
                r"(Z|[+-]\d{2}:\d{2})?$"), _XSD + "dateTime"),
    (re.compile(r"\d{4}-\d{2}-\d{2}$"), _XSD + "date"),
    (re.compile(r"\d{2}:\d{2}(:\d{2}(\.\d+)?)?$"), _XSD + "time"),
    (re.compile(r"\d{4}$"), _XSD + "gYear"),
)

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta source track wbr".split()
)
_HREF_TAGS = frozenset(("a", "area", "link"))
_SRC_TAGS = frozenset(
    ("img", "audio", "video", "source", "iframe", "embed", "track")
)


class MicrodataUnsupportedError(ValueError):
    """A construct outside the microdata profile (see module docstring)."""


def _vocab_of(itemtype: str) -> str | None:
    """Vocabulary base: the first type IRI up to and including the last
    '/' or '#' — https://schema.org/Person -> https://schema.org/."""
    first = itemtype.split()[0]
    cut = max(first.rfind("/"), first.rfind("#"))
    return first[: cut + 1] if cut >= 0 else None


def _is_absolute(name: str) -> bool:
    return "://" in name


class _Item:
    __slots__ = ("sid", "vocab")

    def __init__(self, sid: str, vocab: str | None):
        self.sid = sid
        self.vocab = vocab


class _Walker(HTMLParser):
    """One document pass: emits (subj, pred, obj, obj_is_iri,
    obj_datatype, obj_lang) rows into self.out."""

    def __init__(self, doc_key: str, max_depth: int):
        super().__init__(convert_charrefs=True)
        self.doc_key = doc_key
        self.max_depth = max_depth
        self.out: list[tuple] = []
        # each open-element frame:
        # [tag, is_item, lang_pushed, collector|None]
        self.elems: list[list] = []
        self.items: list[_Item] = []        # open itemscope stack
        self.langs: list[str] = []          # open lang-attr stack
        # text-valued itemprop elements currently collecting:
        # (subjs, preds, parts, lang, time_sniff)
        self.collectors: list[tuple] = []
        self.item_ordinal = 0

    # -- helpers ---------------------------------------------------------

    def _lang(self) -> str | None:
        return self.langs[-1] if self.langs else None

    def _expand_props(self, names: str, item: _Item) -> list[str]:
        preds = []
        for name in names.split():
            if _is_absolute(name):
                preds.append(name)
            elif item.vocab:
                preds.append(item.vocab + name)
            else:
                raise MicrodataUnsupportedError(
                    f"bare property {name!r} with no vocabulary in scope"
                )
        return preds

    def _emit(self, subj: str, preds: list[str], obj: str,
              is_iri: bool, dt: str | None, lang: str | None) -> None:
        for p in preds:
            self.out.append((subj, p, obj, is_iri, dt,
                             None if (is_iri or dt) else lang))

    # -- parser events ---------------------------------------------------

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        lang_pushed = False
        if a.get("lang"):
            self.langs.append(a["lang"])
            lang_pushed = True
        if "itemref" in a:
            raise MicrodataUnsupportedError("itemref is out of profile")

        is_item = "itemscope" in a
        collector = None
        prop_names = a.get("itemprop")
        enclosing = self.items[-1] if self.items else None

        if is_item:
            if len(self.items) >= self.max_depth:
                raise MicrodataUnsupportedError(
                    f"item nesting beyond max_depth={self.max_depth}"
                )
            itemtype = a.get("itemtype")
            vocab = _vocab_of(itemtype) if itemtype else (
                enclosing.vocab if enclosing else None
            )
            sid = a.get("itemid")
            if not sid:
                h = hashlib.md5(
                    f"{self.doc_key}#item{self.item_ordinal}".encode()
                ).hexdigest()
                sid = "_:" + h[:16]
            self.item_ordinal += 1
            child = _Item(sid, vocab)
            if itemtype:
                for t in itemtype.split():
                    self.out.append((sid, RDF_TYPE, t, True, None, None))
            if prop_names:
                if enclosing is None:
                    raise MicrodataUnsupportedError(
                        f"itemprop {prop_names!r} outside any item"
                    )
                self._emit(enclosing.sid,
                           self._expand_props(prop_names, enclosing),
                           sid, True, None, None)
            self.items.append(child)
        elif prop_names:
            if enclosing is None:
                raise MicrodataUnsupportedError(
                    f"itemprop {prop_names!r} outside any item"
                )
            preds = self._expand_props(prop_names, enclosing)
            if tag == "meta":
                self._emit(enclosing.sid, preds, a.get("content", ""),
                           False, None, self._lang())
            elif tag in _HREF_TAGS and tag != "a":
                self._emit(enclosing.sid, preds, a.get("href", ""),
                           True, None, None)
            elif tag == "a":
                # href when present (an IRI value), else the text content
                if "href" in a:
                    self._emit(enclosing.sid, preds, a["href"],
                               True, None, None)
                else:
                    collector = (enclosing.sid, preds, [],
                                 self._lang(), False)
            elif tag in _SRC_TAGS:
                self._emit(enclosing.sid, preds, a.get("src", ""),
                           True, None, None)
            elif tag == "data":
                self._emit(enclosing.sid, preds, a.get("value", ""),
                           False, None, self._lang())
            elif tag == "time" and a.get("datetime"):
                self._emit(enclosing.sid, preds, a["datetime"], False,
                           _sniff_time(a["datetime"]), self._lang())
            else:
                collector = (enclosing.sid, preds, [], self._lang(),
                             tag == "time")
        if collector is not None:
            self.collectors.append(collector)
        if tag in _VOID_TAGS:
            # void elements never close; unwind their lang immediately
            if lang_pushed:
                self.langs.pop()
            return
        self.elems.append([tag, is_item, lang_pushed,
                           collector is not None])

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID_TAGS:
            self.handle_endtag(tag)

    def handle_data(self, data):
        for (_s, _p, parts, _lang, _t) in self.collectors:
            parts.append(data)

    def handle_endtag(self, tag):
        # tag-soup tolerance: pop back to the nearest matching open tag;
        # an unmatched close is ignored
        if not any(fr[0] == tag for fr in self.elems):
            return
        while self.elems:
            t, is_item, lang_pushed, has_collector = self.elems.pop()
            if has_collector:
                subj, preds, parts, lang, is_time = self.collectors.pop()
                text = "".join(parts)
                dt = _sniff_time(text) if is_time else None
                self._emit(subj, preds, text, False, dt, lang)
            if is_item:
                self.items.pop()
            if lang_pushed:
                self.langs.pop()
            if t == tag:
                break

    def close(self):
        super().close()
        # close any still-open elements (unclosed tags at EOF)
        while self.elems:
            self.handle_endtag(self.elems[0][0])


def _sniff_time(lex: str) -> str | None:
    for rx, dt in _TIME_SNIFF:
        if rx.fullmatch(lex):
            return dt
    return None


def microdata_to_triples(
    pages: DataFrame,
    html_col: str = "html",
    key_col: str = "url",
    mode: str = "FAILFAST",
    max_depth: int = 32,
) -> DataFrame:
    """(url, html) -> provenance-keyed tagged triples from embedded
    microdata.  ``mode`` mirrors sources/ntriples and sources/jsonld:
    FAILFAST raises on the first out-of-profile document, PERMISSIVE
    routes the whole document to ``_corrupt_doc``.  One mapInPandas
    stage — narrow, zero shuffle."""
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
                w = _Walker(key, max_depth)
                try:
                    w.feed(str(html))
                    w.close()
                except MicrodataUnsupportedError as e:
                    if not permissive:
                        raise ValueError(
                            f"microdata doc {key!r}: {e}"
                        ) from e
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
