"""SPARQL text front-end: parse a query string, execute on the BGP algebra.

The repo's query side so far is programmatic — ``bgp_match`` /
``bgp_aggregate`` / ``bgp_union`` / ``bgp_construct`` / ``eval_path`` take
pattern lists.  A user of a KG engine writes SPARQL text; this module closes
that gap with a self-contained tokenizer + recursive-descent parser that
compiles the text onto the EXISTING algebra (one function call, no new
execution code), so every plan property those operators guarantee —
cost-ordered join trees, pushed-down constant predicates, broadcast VALUES,
semi/anti joins for EXISTS/MINUS, heap-planned ORDER BY+LIMIT — holds for
parsed queries automatically.  The reference has no query language of its
own (its consumers write T-SQL against the mapped warehouse,
MSSQL/OMOPLoader.sql's per-table SELECT chains); a triple store needs the
standard one.

Supported (SPARQL 1.1 grammar subset)
-------------------------------------
* ``PREFIX`` prologue; prefixed names expand everywhere.
* ``SELECT [DISTINCT] (?vars | * | (AGG(...) AS ?alias))  WHERE { ... }``
  with ``GROUP BY`` / ``HAVING`` / ``ORDER BY [ASC|DESC](?v)`` /
  ``LIMIT`` / ``OFFSET``.
* ``ASK { ... }``, ``CONSTRUCT { template } WHERE { ... }``, and
  ``DESCRIBE ?var WHERE { ... }`` (one-hop concise bounded description
  via ``bgp_describe``).
* Group graph patterns: triple blocks with ``;`` / ``,`` abbreviations,
  ``OPTIONAL { }``, ``MINUS { }``, ``FILTER (expr)``,
  ``FILTER [NOT] EXISTS { }``, ``BIND (expr AS ?v)``, ``VALUES`` (single
  var or row form, ``UNDEF`` honored), ``GRAPH g { ... }`` (named-graph
  quad patterns — a constant graph term prunes graph partitions at
  planning time), and top-level ``{ ... } UNION { ... }``.
* Property paths in predicate position: ``/`` ``|`` ``^`` ``+`` ``*``
  ``?``, grouping, and negated property sets ``!(p1|p2)``.
* FILTER/BIND/HAVING expressions: comparisons, arithmetic, ``&&``/``||``/
  ``!``, ``IN``, and the builtins REGEX (-> RLIKE), BOUND (-> IS NOT
  NULL), STRSTARTS/STRENDS/CONTAINS/STRLEN/SUBSTR, LCASE/UCASE/STR,
  ABS/CEIL/FLOOR/ROUND — translated to Spark SQL expression strings, so
  they stay whole-stage-codegen JVM expressions.

* Subqueries: ``{ SELECT ... WHERE { ... } [GROUP BY/HAVING/ORDER/LIMIT/
  OFFSET] }`` nested inside a group graph pattern, to any depth.  The
  inner SELECT evaluates bottom-up to an ordinary bindings frame exposing
  ONLY its projected variables (SPARQL 1.1 §12 variable scoping), then
  joins the enclosing group on the shared ones — so aggregate-then-join
  ("each customer with its nation's total") and modifier-then-join
  ("members of the top-k groups") compose without new execution machinery.
  A group may consist of a subquery alone (no required triple pattern).

* Typed literals ``"lex"^^xsd:T`` (prefixed or full-IRI datatype), with
  semantics honest about the engine's untyped stores:

  - in EXPRESSIONS (FILTER/BIND/HAVING) they become typed Spark SQL
    constants (``"30"^^xsd:integer`` -> ``30``, ``xsd:decimal`` ->
    ``CAST AS DECIMAL(38,9)``, ``xsd:double``/``float`` -> ``DOUBLE``,
    ``xsd:date``/``dateTime`` -> ``DATE''``/``TIMESTAMP''`` literals,
    ``xsd:boolean`` -> true/false) — lexical forms are validated at
    PARSE time, so a malformed literal is a SparqlSyntaxError, never a
    runtime surprise;
  - the SPARQL 1.1 §17.5 XPath constructor functions
    ``xsd:integer(?v)`` / ``decimal`` / ``double`` / ``float`` /
    ``boolean`` / ``date`` / ``dateTime`` / ``string`` translate to
    ``TRY_CAST`` — a binding whose lexical form doesn't parse becomes
    NULL, which FILTER eliminates and BIND leaves unbound: exactly
    SPARQL's type-error-eliminates-solution semantics.  Cast the
    variable side of a comparison with these; a typed constant against
    an UNCAST string variable is left to Spark's ANSI comparison, which
    fails loudly rather than mis-answering;
  - in DATA positions (triple patterns, VALUES, CONSTRUCT templates)
    the store holds plain lexical forms, so only datatypes with a
    trivially canonical lexical space map: ``xsd:string`` (identity),
    ``xsd:integer`` (canonicalized — ``"007"^^xsd:integer`` matches the
    stored ``"7"``), ``xsd:boolean`` (``true``/``false``).  Any other
    datatype in a data position raises — matching by raw lexical form
    would silently miss equal values written differently.

* Language-tagged literals (RDF 1.1) against TAGGED stores — a triples
  frame carrying an ``obj_lang`` column (sources/ntriples.py
  ``keep_tags=True`` produces one):

  - ``"chat"@en`` constants in object positions compile to a pushed-down
    (obj, lowercased-tag) filter;
  - a variable bound from a tagged object position carries a ``__lang``
    companion bindings column (lowercase tag; ``''`` for plain objects —
    SPARQL's LANG answer), which joins/MINUS/OPTIONAL/DISTINCT/GROUP BY
    treat as part of the term, so ``"chat"@en`` and ``"chat"@fr`` never
    conflate; projected variables keep their companion in the output;
  - builtins ``LANG(?v)`` (the companion column read) and
    ``LANGMATCHES(tag, range)`` (``'*'`` = any non-empty tag, else
    case-insensitive exact or extended-prefix per RFC 4647 basic
    filtering);
  - refused, stated loudly: tagged literals in subject/GRAPH/VALUES/
    CONSTRUCT-template/expression positions, property paths over tagged
    stores, UPDATE over tagged stores, and any tagged constant against a
    store WITHOUT ``obj_lang`` (it could silently match nothing).
    Untagged stores are completely unaffected — no companion columns
    ever exist.

``SERVICE [SILENT] <iri> { ... }`` federates against a LOCAL store
registry (``sparql(..., stores={iri: frame})``): the group evaluates as
a BGP on the named frame and joins the enclosing bindings on shared
variables; a missing endpoint raises unless SILENT (which then
contributes no constraint, the spec's failure-tolerant mode).

Deliberately out of scope (raise ValueError, never silently mis-answer):
network ``SERVICE`` endpoints (no network in a Spark executor's contract
here — local-frame federation above is the supported form), variable
SERVICE endpoints, and property paths inside GRAPH blocks.

Term mapping: this engine's triple stores hold PLAIN STRINGS (``"N:7"``,
``"inNation"``) — ``<iri>`` strips the angle brackets, ``"literal"``
unquotes, prefixed names expand, bare tokens pass through verbatim, and
``a`` is ``rdf:type``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_TOKEN_RE = re.compile(
    r"""\s+|\#[^\n]*
    |(?P<iri><[^<>\s]*>)
    |(?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
    |(?P<lang>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
    |(?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
    |(?P<num>\d+(?:\.\d+)?)
    |(?P<punct>&&|\|\||!=|<=|>=|\{|\}|\(|\)|\.|;|,|\||/|\^|\+|\*|!|=|<|>|-|\?)
    |(?P<name>[A-Za-z_][A-Za-z0-9_\-]*(?::[A-Za-z0-9_.\-:]*)?)
    """,
    re.X,
)

_KEYWORDS = {
    "select", "distinct", "where", "optional", "minus", "filter", "exists",
    "not", "values", "bind", "as", "union", "group", "by", "having",
    "order", "asc", "desc", "limit", "offset", "ask", "construct",
    "prefix", "undef", "in", "describe", "graph", "service", "silent",
}

_AGGS = {"count", "sum", "min", "max", "avg", "sample", "group_concat"}

# SPARQL builtin -> Spark SQL function (direct renames).
_FN_MAP = {
    "strstarts": "startswith", "strends": "endswith",
    "contains": "contains", "strlen": "length", "substr": "substring",
    "lcase": "lower", "ucase": "upper", "abs": "abs", "ceil": "ceil",
    "floor": "floor", "round": "round", "str": "string",
}


class SparqlSyntaxError(ValueError):
    """Raised on any text the supported subset cannot represent."""


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise SparqlSyntaxError(
                f"cannot tokenize at offset {pos}: {text[pos:pos + 20]!r}"
            )
        pos = m.end()
        for kind in ("iri", "str", "lang", "var", "num", "punct", "name"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


class _P:
    """Token-stream cursor with the usual peek/eat helpers."""

    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0
        self.prefixes: dict[str, str] = {}

    def peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def at_kw(self, *kws: str) -> bool:
        kind, val = self.peek()
        return kind == "name" and val.lower() in kws

    def eat(self):
        t = self.peek()
        self.i += 1
        return t

    def expect_kw(self, kw: str):
        kind, val = self.eat()
        if kind != "name" or val.lower() != kw:
            raise SparqlSyntaxError(f"expected {kw.upper()}, got {val!r}")

    def expect_punct(self, p: str):
        kind, val = self.eat()
        if kind != "punct" or val != p:
            raise SparqlSyntaxError(f"expected {p!r}, got {val!r}")

    # ---- terms ---------------------------------------------------------

    def term(self) -> str:
        kind, val = self.eat()
        if kind == "var":
            return val
        if kind == "iri":
            return val[1:-1]
        if kind == "str":
            lex = re.sub(r"\\(.)", r"\1", val[1:-1])
            if self.peek()[0] == "lang":
                # "chat"@en -> tagged-literal constant; bgp compiles it
                # against the store's obj_lang column (RDF 1.1 lowercase-
                # normalized).  Grammar: LANGTAG xor ^^datatype.
                tag = self.eat()[1][1:].lower()
                return ("lang_lit", lex, tag)
            dt = _read_datatype(self)
            if dt is not None and self.peek()[0] == "lang":
                raise SparqlSyntaxError(
                    f"literal {lex!r} carries both ^^{dt} and a language "
                    "tag — the grammar allows exactly one"
                )
            if dt is None or dt == "xsd:string":
                return lex
            if dt == "xsd:integer":
                return str(_int_lexical(lex))
            if dt == "xsd:boolean":
                return _bool_lexical(lex)
            raise SparqlSyntaxError(
                f"typed literal ^^{dt} in a data position: the store "
                "holds plain lexical forms, and only xsd:string/"
                "integer/boolean have a canonical mapping here — cast "
                "a variable with xsd:T(?v) in a FILTER instead"
            )
        if kind == "num":
            return val
        if kind == "name":
            if val == "a":
                return "rdf:type"
            if val.lower() in _KEYWORDS:
                raise SparqlSyntaxError(f"keyword {val!r} where term expected")
            return self._expand(val)
        raise SparqlSyntaxError(f"bad term: {val!r}")

    def _expand(self, name: str) -> str:
        if ":" in name:
            pfx, local = name.split(":", 1)
            if pfx in self.prefixes:
                return self.prefixes[pfx] + local
        return name


_XSD_NS = "http://www.w3.org/2001/XMLSchema#"

# XPath constructor function / typed-literal datatype -> Spark SQL type.
_XSD_SQL = {
    "xsd:integer": "BIGINT", "xsd:int": "BIGINT", "xsd:long": "BIGINT",
    "xsd:decimal": "DECIMAL(38,9)",
    "xsd:double": "DOUBLE", "xsd:float": "DOUBLE",
    "xsd:boolean": "BOOLEAN",
    "xsd:date": "DATE", "xsd:dateTime": "TIMESTAMP",
    "xsd:string": "STRING",
}

_DATE_LEX = re.compile(r"^-?[0-9]{4}-[0-9]{2}-[0-9]{2}$")
_DATETIME_LEX = re.compile(
    r"^-?[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}"
    r"(\.[0-9]+)?(Z|[+-][0-9]{2}:[0-9]{2})?$"
)


def _norm_dt(dt: str) -> str:
    """Normalize a datatype IRI/name to conventional 'xsd:local' form."""
    if dt.startswith(_XSD_NS):
        return "xsd:" + dt[len(_XSD_NS):]
    return dt


def _read_datatype(p: _P) -> str | None:
    """Consume a '^^datatype' tag if the cursor sits on one ('^^' arrives
    as two '^' puncts); returns the normalized datatype, else None."""
    if p.peek() == ("punct", "^") and p.peek(1) == ("punct", "^"):
        p.eat()
        p.eat()
        kind, val = p.eat()
        if kind == "iri":
            return _norm_dt(val[1:-1])
        if kind == "name":
            return _norm_dt(p._expand(val))
        raise SparqlSyntaxError(f"bad datatype after '^^': {val!r}")
    return None


def _int_lexical(lex: str) -> int:
    if not re.fullmatch(r"[+-]?[0-9]+", lex):
        raise SparqlSyntaxError(f"bad xsd:integer lexical form {lex!r}")
    return int(lex)


def _bool_lexical(lex: str) -> str:
    if lex in ("true", "1"):
        return "true"
    if lex in ("false", "0"):
        return "false"
    raise SparqlSyntaxError(f"bad xsd:boolean lexical form {lex!r}")


def _typed_sql_literal(lex: str, dt: str) -> str:
    """Typed literal -> a Spark SQL constant, lexical form validated at
    parse time (malformed literals are syntax errors, never runtime
    surprises)."""
    q = lex.replace("'", "''")
    if dt == "xsd:string":
        return f"'{q}'"
    if dt in ("xsd:integer", "xsd:int", "xsd:long"):
        return str(_int_lexical(lex))
    if dt == "xsd:decimal":
        if not re.fullmatch(r"[+-]?[0-9]+(\.[0-9]+)?", lex):
            raise SparqlSyntaxError(f"bad xsd:decimal lexical form {lex!r}")
        return f"CAST('{lex}' AS DECIMAL(38,9))"
    if dt in ("xsd:double", "xsd:float"):
        try:
            float(lex)
        except ValueError:
            raise SparqlSyntaxError(
                f"bad {dt} lexical form {lex!r}"
            ) from None
        return f"CAST('{q}' AS DOUBLE)"
    if dt == "xsd:boolean":
        return _bool_lexical(lex)
    if dt == "xsd:date":
        if not _DATE_LEX.fullmatch(lex):
            raise SparqlSyntaxError(f"bad xsd:date lexical form {lex!r}")
        return f"DATE'{lex}'"
    if dt == "xsd:dateTime":
        if not _DATETIME_LEX.fullmatch(lex):
            raise SparqlSyntaxError(
                f"bad xsd:dateTime lexical form {lex!r}"
            )
        return f"TIMESTAMP'{lex.replace('T', ' ')}'"
    raise SparqlSyntaxError(f"unsupported typed-literal datatype {dt!r}")


def _parse_path(p: _P):
    """Property-path expression in predicate position.  Returns a plain
    string for a single predicate (so bgp_match compiles a pushed-down
    scan), the variable itself for a variable predicate, or a paths-AST
    tuple otherwise."""
    if p.peek()[0] == "var":  # variable predicate: no path operators
        return p.eat()[1]

    def primary():
        kind, val = p.peek()
        if kind == "punct" and val == "!":
            p.eat()
            preds = []
            if p.peek() == ("punct", "("):
                p.eat()
                preds.append(_plain(p))
                while p.peek() == ("punct", "|"):
                    p.eat()
                    preds.append(_plain(p))
                p.expect_punct(")")
            else:
                preds.append(_plain(p))
            return ("npred", tuple(preds))
        if kind == "punct" and val == "(":
            p.eat()
            inner = alt()
            p.expect_punct(")")
            return inner
        return ("pred", _plain(p))

    def _plain(p: _P) -> str:
        kind, val = p.peek()
        if kind in ("iri", "name"):
            return p.term()
        raise SparqlSyntaxError(f"expected predicate, got {val!r}")

    def elt():
        inv = False
        if p.peek() == ("punct", "^"):
            p.eat()
            inv = True
        e = primary()
        kind, val = p.peek()
        if kind == "punct" and val in ("+", "*", "?"):
            p.eat()
            e = ({"+": "plus", "*": "star", "?": "opt"}[val], e)
        return ("inv", e) if inv else e

    def seq():
        e = elt()
        while p.peek() == ("punct", "/"):
            p.eat()
            e = ("seq", e, elt())
        return e

    def alt():
        e = seq()
        while p.peek() == ("punct", "|"):
            p.eat()
            e = ("alt", e, seq())
        return e

    ast = alt()
    return ast[1] if ast[0] == "pred" else ast


def _expr(p: _P, stop: set[str]) -> str:
    """Translate a SPARQL expression to a Spark SQL string.  Consumes
    tokens until a top-level ``stop`` punct (never eaten) at depth 0.
    Token-level translation keeps the result inside codegen: variables
    become column names, builtins map via _FN_MAP, REGEX/BOUND get
    special forms."""
    parts: list[str] = []
    depth = 0
    while True:
        kind, val = p.peek()
        if kind == "eof" or (depth == 0 and kind == "punct" and val in stop):
            break
        p.eat()
        if kind == "punct":
            if val == "(":
                depth += 1
            elif val == ")":
                if depth == 0:
                    raise SparqlSyntaxError("unbalanced ')' in expression")
                depth -= 1
            if val == "&&":
                parts.append("AND")
            elif val == "||":
                parts.append("OR")
            elif val == "!" and p.peek() != ("punct", "="):
                parts.append("NOT")
            else:
                parts.append(val)
        elif kind == "var":
            parts.append(val[1:])
        elif kind == "str":
            body = re.sub(r"\\(.)", r"\1", val[1:-1])
            if p.peek()[0] == "lang":
                raise SparqlSyntaxError(
                    f"language-tagged literal {body!r}{p.peek()[1]} in an "
                    "expression: compare the parts — FILTER(?v = "
                    f"{body!r} && LANG(?v) = {p.peek()[1][1:].lower()!r})"
                )
            dt = _read_datatype(p)
            if dt is None:
                parts.append("'" + body.replace("'", "''") + "'")
            else:
                parts.append(_typed_sql_literal(body, dt))
        elif kind == "num":
            parts.append(val)
        elif kind == "name":
            low = val.lower()
            nxt_is_call = p.peek() == ("punct", "(")
            if low == "regex" and nxt_is_call:
                p.eat()
                arg1 = _expr(p, stop={","})
                p.expect_punct(",")
                arg2 = _expr(p, stop={")"})
                p.expect_punct(")")
                parts.append(f"({arg1} RLIKE {arg2})")
            elif low == "bound" and nxt_is_call:
                p.eat()
                arg = _expr(p, stop={")"})
                p.expect_punct(")")
                parts.append(f"({arg} IS NOT NULL)")
            elif low == "lang" and nxt_is_call:
                # LANG(?v) -> the bindings' __lang companion column: ''
                # for plain literals (SPARQL's answer), lowercase tag
                # otherwise, NULL (eliminates) for unbound ?v.  Only legal
                # on variables; a var never bound from a tagged object
                # position has no companion and fails loudly at analysis.
                p.eat()
                kind2, v2 = p.eat()
                if kind2 != "var":
                    raise SparqlSyntaxError("LANG() takes a variable")
                p.expect_punct(")")
                parts.append(f"{v2[1:]}__lang")
            elif low == "langmatches" and nxt_is_call:
                # LANGMATCHES(tag, range): '*' matches any non-empty tag;
                # otherwise case-insensitive exact or extended-prefix
                # ('en' matches 'en-us') per RFC 4647 basic filtering.
                p.eat()
                a = _expr(p, stop={","})
                p.expect_punct(",")
                b = _expr(p, stop={")"})
                p.expect_punct(")")
                parts.append(
                    f"(CASE WHEN {b} = '*' THEN {a} <> '' ELSE "
                    f"lower({a}) = lower({b}) OR "
                    f"startswith(lower({a}), lower({b}) || '-') END)"
                )
            elif low in _FN_MAP and nxt_is_call:
                parts.append(_FN_MAP[low])
            elif nxt_is_call and _norm_dt(p._expand(val)) in _XSD_SQL:
                # SPARQL 1.1 §17.5 XPath constructor: xsd:T(?v) ->
                # TRY_CAST, so an unparseable lexical form becomes NULL
                # (FILTER eliminates it, BIND leaves it unbound) —
                # SPARQL's type-error-eliminates-solution semantics.
                sql_t = _XSD_SQL[_norm_dt(p._expand(val))]
                p.eat()
                arg = _expr(p, stop={")"})
                p.expect_punct(")")
                parts.append(f"TRY_CAST({arg} AS {sql_t})")
            elif low in ("in", "not"):
                parts.append(val.upper())
            elif low in ("true", "false"):
                parts.append(low)
            elif nxt_is_call:
                raise SparqlSyntaxError(f"unsupported function {val!r}")
            else:
                raise SparqlSyntaxError(
                    f"bare name {val!r} in expression (quote literals)"
                )
    if depth != 0:
        raise SparqlSyntaxError("unbalanced '(' in expression")
    if not parts:
        raise SparqlSyntaxError("empty expression")
    return " ".join(parts)


def _parse_triples_block(p: _P) -> list[tuple]:
    """Triple templates with ';' (same subject) and ',' (same subject and
    predicate) abbreviations, until '}' or a non-triple keyword."""
    pats: list[tuple] = []
    while True:
        kind, val = p.peek()
        if kind == "punct" and val in ("}", "{"):  # '{' opens a subquery
            break
        if kind == "name" and val.lower() in (
            "optional", "minus", "filter", "values", "bind", "union",
            "graph", "service",
        ):
            break
        subj = p.term()
        if isinstance(subj, tuple):
            raise SparqlSyntaxError(
                "language-tagged literal in subject position"
            )
        while True:
            pred = _parse_path(p)
            while True:
                obj = p.term()
                pats.append((subj, pred, obj))
                if p.peek() == ("punct", ","):
                    p.eat()
                    continue
                break
            if p.peek() == ("punct", ";"):
                p.eat()
                if p.peek() == ("punct", "}"):  # trailing ';' is legal
                    break
                continue
            break
        if p.peek() == ("punct", "."):
            p.eat()
            continue
        break
    return pats


def _parse_values(p: _P) -> list[dict[str, str | None]]:
    p.expect_kw("values")
    kind, val = p.peek()
    if kind == "var":  # single-variable form
        var = p.eat()[1][1:]
        p.expect_punct("{")
        rows = []
        while p.peek() != ("punct", "}"):
            if p.at_kw("undef"):
                p.eat()
                rows.append({var: None})
            else:
                t = p.term()
                if isinstance(t, tuple):
                    raise SparqlSyntaxError(
                        "language-tagged literal in VALUES: inline data "
                        "holds plain terms; FILTER on LANG(?v) instead"
                    )
                rows.append({var: t})
        p.eat()
        return rows
    p.expect_punct("(")
    names = []
    while p.peek() != ("punct", ")"):
        k, v = p.eat()
        if k != "var":
            raise SparqlSyntaxError("VALUES header must list variables")
        names.append(v[1:])
    p.eat()
    p.expect_punct("{")
    rows = []
    while p.peek() != ("punct", "}"):
        p.expect_punct("(")
        row: dict[str, str | None] = {}
        for n in names:
            if p.at_kw("undef"):
                p.eat()
                row[n] = None
            else:
                t = p.term()
                if isinstance(t, tuple):
                    raise SparqlSyntaxError(
                        "language-tagged literal in VALUES: inline data "
                        "holds plain terms; FILTER on LANG(?v) instead"
                    )
                row[n] = t
        p.expect_punct(")")
        rows.append(row)
    p.eat()
    return rows


def _parse_bind(p: _P, kw: dict):
    p.eat()  # BIND
    p.expect_punct("(")
    # Find the AS keyword at relative depth 0, translate the token slice
    # before it as one expression (so nested function calls work), then
    # read the target variable.
    j, depth = p.i, 0
    while True:
        if j >= len(p.toks):
            raise SparqlSyntaxError("BIND without AS")
        kind, val = p.toks[j]
        if kind == "name" and val.lower() == "as" and depth == 0:
            break
        if kind == "punct" and val == "(":
            depth += 1
        elif kind == "punct" and val == ")":
            if depth == 0:
                raise SparqlSyntaxError("BIND without AS")
            depth -= 1
        j += 1
    sub = _P(p.toks[p.i:j])
    sub.prefixes = p.prefixes
    e = _expr(sub, stop=set())
    if sub.peek()[0] != "eof":
        raise SparqlSyntaxError("malformed BIND expression")
    p.i = j + 1  # past AS
    kind, val = p.eat()
    if kind != "var":
        raise SparqlSyntaxError("BIND target must be a variable")
    p.expect_punct(")")
    kw.setdefault("bind", {})[val[1:]] = e


def parse(text: str) -> dict:
    """Parse SPARQL text into an execution spec dict (see :func:`sparql`
    for the executable form).  Raises :class:`SparqlSyntaxError` on
    anything outside the supported subset."""
    p = _P(_tokenize(text))
    while p.at_kw("prefix"):
        p.eat()
        kind, val = p.eat()
        if kind != "name" or not val.endswith(":"):
            # prefixed-name token 'ex:' tokenizes as name 'ex:'
            if kind != "name" or ":" not in val:
                raise SparqlSyntaxError("PREFIX needs 'name:'")
        pfx = val.rstrip(":").split(":")[0]
        kind2, iri = p.eat()
        if kind2 != "iri":
            raise SparqlSyntaxError("PREFIX needs an <iri>")
        p.prefixes[pfx] = iri[1:-1]

    if p.at_kw("ask"):
        p.eat()
        group = _parse_group_with_binds(p)
        _no_trailing(p)
        return {"form": "ask", "groups": [group]}

    if p.at_kw("construct"):
        p.eat()
        p.expect_punct("{")
        template = _parse_triples_block(p)
        p.expect_punct("}")
        p.expect_kw("where")
        group = _parse_group_with_binds(p)
        _no_trailing(p)
        return {"form": "construct", "template": template,
                "groups": [group]}

    if p.at_kw("describe"):
        p.eat()
        kind, val = p.eat()
        if kind != "var":
            raise SparqlSyntaxError(
                "DESCRIBE subset is DESCRIBE ?var WHERE { ... }"
            )
        p.expect_kw("where")
        group = _parse_group_with_binds(p)
        _no_trailing(p)
        return {"form": "describe", "var": val[1:], "groups": [group]}

    if p.at_kw("delete") or p.at_kw("insert"):
        # SPARQL UPDATE: DELETE {t}? INSERT {t}? WHERE {g} — compiled onto
        # bgp.update_where (delete-then-insert set semantics, returns the
        # next snapshot).  Templates are plain (s, p, o) triples: property
        # paths and language-tagged literals are rejected here exactly as
        # the programmatic operator rejects tagged stores.
        def _template(kw: str) -> list[tuple[str, str, str]]:
            p.expect_punct("{")
            tmpl = _parse_triples_block(p)
            p.expect_punct("}")
            for t in tmpl:
                if any(not isinstance(term, str) for term in t):
                    raise SparqlSyntaxError(
                        f"{kw} template terms must be plain IRIs, "
                        "literals, or variables (no property paths or "
                        "language-tagged literals)"
                    )
            return tmpl

        delete = insert = None
        delete_where = False
        if p.at_kw("delete"):
            p.eat()
            if p.at_kw("where"):
                # DELETE WHERE { ... } shorthand: the WHERE pattern doubles
                # as the delete template (SPARQL 1.1 Update §3.1.2)
                delete_where = True
            else:
                delete = _template("DELETE")
        if not delete_where:
            if p.at_kw("insert"):
                p.eat()
                insert = _template("INSERT")
            p.expect_kw("where")
        else:
            p.expect_kw("where")
        group = _parse_group_with_binds(p)
        _no_trailing(p)
        if delete_where:
            tmpl = group.get("patterns", [])
            for t in tmpl:
                if len(t) != 3 or any(
                    not isinstance(term, str) for term in t
                ):
                    raise SparqlSyntaxError(
                        "DELETE WHERE template patterns must be plain "
                        "(s, p, o) triples (no paths, tags, or GRAPH "
                        "quads)"
                    )
            if set(group) - {"patterns"}:
                raise SparqlSyntaxError(
                    "DELETE WHERE takes a plain triple-pattern group "
                    "(no FILTER/OPTIONAL/BIND — use the long form "
                    "DELETE {...} WHERE {...})"
                )
            delete = list(tmpl)
        return {"form": "update", "delete": delete, "insert": insert,
                "groups": [group]}

    spec = _parse_select(p)
    _no_trailing(p)
    return spec


def _parse_select(p: _P) -> dict:
    """SELECT query body, from the SELECT keyword through the solution
    modifiers — shared by the top-level form and ``{ SELECT ... }``
    subqueries (which call this between their braces)."""
    p.expect_kw("select")
    distinct = False
    if p.at_kw("distinct"):
        p.eat()
        distinct = True
    proj: list[str] = []
    aggs: dict[str, tuple[str, str]] = {}
    star = False
    while True:
        kind, val = p.peek()
        if kind == "var":
            p.eat()
            proj.append(val[1:])
        elif kind == "punct" and val == "*":
            p.eat()
            star = True
        elif kind == "punct" and val == "(":
            p.eat()
            fn = p.eat()[1].lower()
            if fn not in _AGGS:
                raise SparqlSyntaxError(f"unknown aggregate {fn!r}")
            p.expect_punct("(")
            if p.at_kw("distinct"):
                p.eat()
                if fn != "count":
                    raise SparqlSyntaxError("DISTINCT only with COUNT")
                fn = "count_distinct"
            kind2, v2 = p.eat()
            if kind2 == "punct" and v2 == "*":
                arg = "*"
            elif kind2 == "var":
                arg = v2[1:]
            else:
                raise SparqlSyntaxError("aggregate arg must be ?var or *")
            p.expect_punct(")")
            p.expect_kw("as")
            kind3, v3 = p.eat()
            if kind3 != "var":
                raise SparqlSyntaxError("aggregate alias must be ?var")
            p.expect_punct(")")
            aggs[v3[1:]] = (fn, arg)
            proj.append(v3[1:])
        else:
            break
    if not star and not proj:
        raise SparqlSyntaxError("empty SELECT clause")
    p.expect_kw("where")

    groups = [_parse_group_with_binds(p)]
    while p.at_kw("union"):
        p.eat()
        groups.append(_parse_group_with_binds(p))

    group_by: list[str] = []
    having = None
    order: list[tuple[str, str]] = []
    limit = None
    offset = 0
    while True:
        if p.at_kw("group"):
            p.eat()
            p.expect_kw("by")
            while p.peek()[0] == "var":
                group_by.append(p.eat()[1][1:])
            if not group_by:
                raise SparqlSyntaxError("GROUP BY needs variables")
        elif p.at_kw("having"):
            p.eat()
            p.expect_punct("(")
            having = _expr(p, stop={")"})
            p.expect_punct(")")
        elif p.at_kw("order"):
            p.eat()
            p.expect_kw("by")
            while True:
                if p.at_kw("asc", "desc"):
                    d = p.eat()[1].lower()
                    p.expect_punct("(")
                    v = p.eat()
                    if v[0] != "var":
                        raise SparqlSyntaxError("ORDER BY needs ?var")
                    p.expect_punct(")")
                    order.append((v[1][1:], d))
                elif p.peek()[0] == "var":
                    order.append((p.eat()[1][1:], "asc"))
                else:
                    break
            if not order:
                raise SparqlSyntaxError("ORDER BY needs keys")
        elif p.at_kw("limit"):
            p.eat()
            limit = int(p.eat()[1])
        elif p.at_kw("offset"):
            p.eat()
            offset = int(p.eat()[1])
        else:
            break
    return {
        "form": "select", "distinct": distinct, "star": star,
        "project": proj, "aggs": aggs, "groups": groups,
        "group_by": group_by, "having": having, "order": order,
        "limit": limit, "offset": offset,
    }


def _parse_group_with_binds(p: _P) -> dict:
    """_parse_group, with BIND handled here (needs the AS-aware scanner)."""
    p.expect_punct("{")
    kw: dict = {"patterns": []}
    while p.peek() != ("punct", "}"):
        if p.peek() == ("punct", "."):
            p.eat()  # optional '.' between group elements (GRAPH, {...})
        elif p.at_kw("bind"):
            _parse_bind(p, kw)
        elif p.at_kw("graph"):
            # GRAPH g { triples } -> 4-term quad patterns; the 4th term
            # (var or constant) binds the store's `graph` column, and a
            # constant prunes graph partitions at planning time.
            p.eat()
            g = p.term()
            if isinstance(g, tuple):
                raise SparqlSyntaxError(
                    "language-tagged literal as a GRAPH name"
                )
            p.expect_punct("{")
            for (s, pr, o) in _parse_triples_block(p):
                if isinstance(pr, tuple):
                    raise SparqlSyntaxError(
                        "property paths are not supported inside GRAPH "
                        "blocks (evaluate the path per graph)"
                    )
                kw["patterns"].append((s, pr, o, g))
            p.expect_punct("}")
        elif p.at_kw("service"):
            # SERVICE [SILENT] <endpoint> { triples } — federation against
            # a store registry (local frames; a NETWORK endpoint is out of
            # scope, see module docstring).  The group is evaluated
            # against the named store and joins the enclosing bindings on
            # shared variables, exactly like a subquery's frame.
            p.eat()
            silent = p.at_kw("silent")
            if silent:
                p.eat()
            kind, _ = p.peek()
            if kind != "iri":
                raise SparqlSyntaxError(
                    "SERVICE endpoint must be a constant IRI (variable "
                    "endpoints are not supported)"
                )
            ep = p.term()
            p.expect_punct("{")
            block = _parse_triples_block(p)
            p.expect_punct("}")
            kw.setdefault("services", []).append(
                {"silent": silent, "endpoint": ep, "patterns": block}
            )
        elif p.at_kw("optional", "minus", "filter", "values"):
            # reuse the group parser's clause handling via a tiny re-entry
            _parse_clause(p, kw)
        elif p.peek() == ("punct", "{"):
            # nested group: only the subquery form is a distinct algebra
            # node here ({ SELECT ... }); a bare nested group would just
            # re-scope the same join, so require the SELECT.
            nk, nv = p.peek(1)
            if not (nk == "name" and nv.lower() == "select"):
                raise SparqlSyntaxError(
                    "nested '{' must open a subquery ({ SELECT ... })"
                )
            p.eat()
            kw.setdefault("subqueries", []).append(_parse_select(p))
            p.expect_punct("}")
        else:
            kw["patterns"].extend(_parse_triples_block(p))
    p.eat()
    if (
        not kw["patterns"]
        and not kw.get("subqueries")
        and not kw.get("services")
    ):
        raise SparqlSyntaxError("group has no required triple pattern")
    return kw


def _parse_clause(p: _P, kw: dict):
    if p.at_kw("optional"):
        p.eat()
        p.expect_punct("{")
        kw.setdefault("optional", []).extend(_parse_triples_block(p))
        p.expect_punct("}")
    elif p.at_kw("minus"):
        p.eat()
        p.expect_punct("{")
        kw.setdefault("minus", []).extend(_parse_triples_block(p))
        p.expect_punct("}")
    elif p.at_kw("values"):
        kw.setdefault("values", []).extend(_parse_values(p))
    elif p.at_kw("filter"):
        p.eat()
        neg = False
        if p.at_kw("not"):
            p.eat()
            neg = True
        if p.at_kw("exists"):
            p.eat()
            p.expect_punct("{")
            block = _parse_triples_block(p)
            p.expect_punct("}")
            kw.setdefault("minus" if neg else "exists", []).extend(block)
        elif neg:
            raise SparqlSyntaxError("FILTER NOT must be NOT EXISTS")
        else:
            p.expect_punct("(")
            e = _expr(p, stop={")"})
            p.expect_punct(")")
            prev = kw.get("filter_expr")
            kw["filter_expr"] = f"({prev}) AND ({e})" if prev else e


def _no_trailing(p: _P):
    kind, val = p.peek()
    if kind != "eof":
        raise SparqlSyntaxError(f"unexpected trailing token {val!r}")


def _resolve_subqueries(
    triples: DataFrame,
    groups: list[dict],
    stats: dict[str, int] | None,
    stores: dict[str, DataFrame] | None = None,
):
    """Evaluate each group's parsed subqueries bottom-up into bindings
    frames (recursing through :func:`_exec_select`, so nesting is
    unbounded) and hand them to bgp_match as ``extra_bindings``; also
    threads ``stats`` into every group for cost-based ordering.

    SERVICE groups resolve the same way: each is evaluated as a BGP
    against its endpoint's frame in the ``stores`` registry and joins the
    enclosing bindings as one more extra-bindings frame.  An endpoint
    missing from the registry raises (listing the known endpoints) unless
    the query said SILENT, in which case the group contributes no
    constraint — the spec's failure-tolerant federation mode."""
    from i2o_transform_spark.operators.bgp import bgp_match

    for g in groups:
        subs = g.pop("subqueries", None)
        servs = g.pop("services", None)
        if stats is not None:
            g["stats"] = stats
        eb = list(g.get("extra_bindings") or [])
        if subs:
            eb.extend(
                _exec_select(triples, s, stats, stores) for s in subs
            )
        for sv in servs or []:
            store = (stores or {}).get(sv["endpoint"])
            if store is None:
                if sv["silent"]:
                    continue
                raise ValueError(
                    f"SERVICE endpoint {sv['endpoint']!r} not in the "
                    f"store registry (known: {sorted(stores or {})}) — "
                    "pass stores={iri: frame} or mark it SILENT"
                )
            eb.append(bgp_match(store, sv["patterns"]))
        if eb:
            g["extra_bindings"] = eb


def sparql(
    triples: DataFrame,
    text: str,
    stats: dict[str, int] | None = None,
    stores: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Parse and execute SPARQL ``text`` against ``triples`` — the one-call
    entry point.  ``stats`` passes through to the cost-based join ordering
    (see bgp.plan_order).  SELECT returns one column per projected
    variable; ASK one boolean ``ask`` row; CONSTRUCT a distinct
    (subj, pred, obj) graph.

    ``stores`` is the SERVICE federation registry ({endpoint-IRI: triples
    frame}): ``SERVICE <iri> { ... }`` groups evaluate against the named
    frame and join the enclosing bindings on shared variables.  This is
    LOCAL federation — the cross-store join semantics of the spec over
    frames already in the session (e.g. two differently-partitioned
    lakes, or a broadcast-sized ontology next to the big store); network
    endpoints stay out of scope."""
    from i2o_transform_spark.operators.bgp import (
        bgp_ask,
        bgp_construct,
        bgp_describe,
    )

    q = parse(text)
    if q["form"] == "update":
        from i2o_transform_spark.operators.bgp import update_where

        _resolve_subqueries(triples, q["groups"], stats, stores)
        g = dict(q["groups"][0])
        return update_where(
            triples, where=g.pop("patterns"),
            delete=q["delete"], insert=q["insert"], stats=stats, **g
        )
    if q["form"] == "ask":
        _resolve_subqueries(triples, q["groups"], stats, stores)
        return bgp_ask(triples, **q["groups"][0])
    if q["form"] == "construct":
        _resolve_subqueries(triples, q["groups"], stats, stores)
        return bgp_construct(triples, template=q["template"],
                             **q["groups"][0])
    if q["form"] == "describe":
        _resolve_subqueries(triples, q["groups"], stats, stores)
        return bgp_describe(triples, var=q["var"], **q["groups"][0])
    return _exec_select(triples, q, stats, stores)


def _exec_select(
    triples: DataFrame,
    q: dict,
    stats: dict[str, int] | None,
    stores: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Execute a parsed SELECT spec (top-level or subquery) to a bindings
    frame holding exactly the projected columns."""
    from i2o_transform_spark.operators.bgp import (
        bgp_aggregate,
        bgp_match,
        bgp_union,
        solution_modifiers,
    )

    groups = q["groups"]
    _resolve_subqueries(triples, groups, stats, stores)

    if len(groups) == 1:
        bindings = bgp_match(triples, distinct=False, **groups[0])
    else:
        bindings = bgp_union(triples, groups, distinct=False)

    if q["aggs"] or q["group_by"]:
        for v in q["group_by"]:
            if v in q["aggs"]:
                raise SparqlSyntaxError(f"?{v} is both group key and alias")
        # group keys are RDF terms: a tagged variable groups by
        # (lexical, tag), so its companion column joins the key set
        gb = []
        for v in q["group_by"]:
            gb.append(v)
            if v + "__lang" in bindings.columns:
                gb.append(v + "__lang")
        bindings = bgp_aggregate(bindings, gb, q["aggs"])
        if q["having"]:
            bindings = bindings.where(q["having"])
    elif q["having"]:
        raise SparqlSyntaxError("HAVING without aggregates")

    cols = (
        [c for c in bindings.columns if not c.endswith("__lang")]
        if q["star"]
        else q["project"]
    )
    missing = [c for c in cols if c not in bindings.columns]
    if missing:
        raise SparqlSyntaxError(f"projected unbound variable(s): {missing}")
    # a projected variable bound from a tagged object position keeps its
    # __lang companion column: the RDF term is (lexical, tag) — projecting
    # the lexical alone would conflate "chat"@en with "chat"@fr under
    # DISTINCT.  Plain stores: no companions, schema unchanged.
    proj = []
    for c in cols:
        proj.append(c)
        if c + "__lang" in bindings.columns:
            proj.append(c + "__lang")
    out = bindings.select(*proj)
    if q["distinct"]:
        out = out.distinct()
    if q["order"] or q["limit"] is not None or q["offset"]:
        out = solution_modifiers(
            out, q["order"], limit=q["limit"], offset=q["offset"]
        )
    return out
