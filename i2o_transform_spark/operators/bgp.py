"""Basic-graph-pattern matching over a (subj, pred, obj) triples frame —
the SPARQL SELECT core, i.e. the query side of the KG this pipeline builds.

The reference queries its mapped warehouse with hand-written multi-join SQL
per shape (MSSQL/OMOPLoader.sql's per-table SELECT...JOIN chains); a triple
store needs the generic version: a conjunctive pattern of triple templates
with shared variables, compiled into a self-join tree.

Spark-first compilation, not an interpreter:

* each template becomes ONE filtered/projected scan of the triples frame —
  constants turn into pushed-down predicates (``PushedFilters`` on the
  parquet scan: pred is the partition/cluster key of the materialized
  triples table, so a constant predicate prunes at planning time),
* templates are greedily ordered most-constants-first and connectivity-
  first (every subsequent template shares a variable with the bound set
  when the pattern graph is connected), so the join tree never degenerates
  into an unplanned cartesian product,
* the joins themselves are plain equi-joins on variable names — Catalyst +
  AQE pick broadcast vs shuffle per side at runtime from observed sizes,
  which is exactly the right call at 100 TB where per-predicate
  selectivities vary by orders of magnitude.

A disconnected pattern (no shared variable with what's bound so far) is
legal SPARQL; it compiles to an explicit ``crossJoin`` so the cost is
visible in the plan rather than smuggled in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS = ("subj", "pred", "obj")

# Language-tagged-literal support (RDF 1.1).  A store MAY carry an
# ``obj_lang`` column (sources/ntriples.py ``keep_tags=True`` produces
# one); when it does, every variable bound from an OBJECT position gets a
# companion bindings column ``<var>__lang`` holding the tag normalized per
# RDF 1.1 Concepts §3.3 (lowercase; '' for plain/IRI objects — NEVER null
# for a bound variable, so plain equi-joins keep working and SPARQL
# LANG(?v) is a direct column read).  Joins between bindings frames apply
# RDF TERM equality: companions join when both sides carry one; a
# companion on exactly one side means the other occurrence sits in an IRI
# position (subj/pred/graph), so term equality pins the tagged side to ''
# (an IRI never equals a tagged literal).  Stores without the column are
# byte-for-byte unaffected — no companion columns ever exist.
_LANG_SUF = "__lang"


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _is_lang_lit(term) -> bool:
    """A language-tagged literal constant: ``("lang_lit", lexical, tag)``
    (operators/sparql emits these for ``"chat"@en``)."""
    return (
        isinstance(term, tuple) and len(term) == 3 and term[0] == "lang_lit"
    )


def _lang_norm():
    return F.lower(F.coalesce(F.col("obj_lang"), F.lit("")))


def _companion_split(
    shared: list[str], left_cols, right_cols
) -> tuple[list[str], list[str], list[str]]:
    """For each shared variable, classify its __lang companion: present on
    both sides (joins as a key), left only, or right only (term-equality
    '' pins)."""
    both, left_only, right_only = [], [], []
    for v in shared:
        c = v + _LANG_SUF
        in_l, in_r = c in left_cols, c in right_cols
        if in_l and in_r:
            both.append(c)
        elif in_l:
            left_only.append(c)
        elif in_r:
            right_only.append(c)
    return both, left_only, right_only


def _compile_template(
    triples: DataFrame, pat: tuple[str, str, str]
) -> tuple[DataFrame, set[str]]:
    """One template -> filtered scan projecting its variables.

    Repeated variables inside a template (e.g. ``(?x, p, ?x)``) become an
    intra-row equality filter.

    A 4-term template ``(s, p, o, g)`` is a SPARQL ``GRAPH g { s p o }``
    quad pattern: the 4th term (variable or constant) binds against the
    frame's ``graph`` column — same compilation, one more position.  A
    constant graph term is a pushed-down predicate on the quad store's
    natural partition key, so ``GRAPH <g> {...}`` prunes whole graphs at
    planning time.

    The predicate position may also be a PROPERTY-PATH expression (a
    tuple AST per operators/paths, e.g. ``("seq", ("pred", "a"),
    ("pred", "b"))`` or ``("plus", ...)``): the path evaluates to its
    distinct (src, dst) pair set once, and the template then binds
    subj/obj against those pairs exactly like a plain scan — SPARQL's
    path-in-triple-pattern composition.  ``star`` paths derive the node
    universe from the triples frame (subj ∪ obj)."""
    if len(pat) == 4 and isinstance(pat[1], tuple):
        raise ValueError(
            f"quad pattern {pat!r}: property paths are not supported "
            "inside GRAPH quad patterns (evaluate the path per graph)"
        )
    if isinstance(pat[1], tuple) and not _is_lang_lit(pat[1]):
        if "obj_lang" in triples.columns:
            raise ValueError(
                "property-path expressions over a language-tagged store "
                "(obj_lang column) are not supported: path evaluation "
                "works on lexical pairs and would conflate literals "
                "differing only in tag — query the untagged projection"
            )
        from i2o_transform_spark.operators.paths import eval_path

        nodes = (
            triples.select(F.col("subj").alias("node"))
            .union(triples.select(F.col("obj").alias("node")))
            .distinct()
        )
        df = eval_path(triples, pat[1], nodes=nodes)
        cols = ("src", "dst")
        first_col: dict[str, str] = {}
        for col, term in zip(cols, (pat[0], pat[2])):
            if _is_var(term):
                name = term[1:]
                if name in first_col:
                    df = df.where(F.col(col) == F.col(first_col[name]))
                else:
                    first_col[name] = col
            else:
                df = df.where(F.col(col) == F.lit(term))
        sel = [F.col(c).alias(v) for v, c in first_col.items()]
        return df.select(*sel), set(first_col)
    has_lang = "obj_lang" in triples.columns
    df = triples
    first_col = {}
    lang_vars: set[str] = set()
    positions = _POS + ("graph",) if len(pat) == 4 else _POS
    for col, term in zip(positions, pat):
        if _is_var(term):
            name = term[1:]
            if has_lang and name.endswith(_LANG_SUF):
                raise ValueError(
                    f"variable ?{name}: the {_LANG_SUF!r} suffix is "
                    "reserved for tag companions on language-tagged stores"
                )
            if name in first_col:
                df = df.where(F.col(col) == F.col(first_col[name]))
                # repeated variable across an IRI position and the object
                # position: term equality forces the object binding plain
                if has_lang and "obj" in (col, first_col[name]):
                    df = df.where(_lang_norm() == F.lit(""))
            else:
                first_col[name] = col
                if has_lang and col == "obj":
                    lang_vars.add(name)
        elif _is_lang_lit(term):
            if col != "obj":
                raise ValueError(
                    f"language-tagged literal {term[1]!r}@{term[2]} in "
                    f"{col} position: only objects may be tagged literals"
                )
            if not has_lang:
                raise ValueError(
                    f"language-tagged literal {term[1]!r}@{term[2]} "
                    "against a store with no obj_lang column — it can "
                    "match nothing; parse the source with keep_tags=True"
                )
            df = df.where(
                (F.col(col) == F.lit(term[1]))
                & (_lang_norm() == F.lit(term[2].lower()))
            )
        else:
            df = df.where(F.col(col) == F.lit(term))
            if has_lang and col == "obj":
                # a plain constant is a plain term: tagged rows differ
                df = df.where(_lang_norm() == F.lit(""))
    sel = [F.col(c).alias(v) for v, c in first_col.items()]
    sel += [_lang_norm().alias(v + _LANG_SUF) for v in sorted(lang_vars)]
    return df.select(*sel), set(first_col)


def analyze_triples(triples: DataFrame) -> DataFrame:
    """Statistics catalog for the BGP planner: per predicate, the triple
    count and distinct subject/object cardinalities — one pass, one
    map-side-combining aggregation (countDistinct compiles to a partial
    HyperLogLog-free expand-aggregate; for 10^12-triple stores sample the
    frame first or swap in approx_count_distinct, the planner only needs
    order-of-magnitude).  Feed ``{pred: n_triples}`` into
    :func:`bgp_match` ``stats=`` for selectivity-ordered joins."""
    return triples.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.countDistinct("subj").cast("long").alias("n_subj"),
        F.countDistinct("obj").cast("long").alias("n_obj"),
    )


def plan_order(
    patterns: list[tuple[str, str, str]],
    stats: dict[str, int] | None = None,
) -> list[int]:
    """The join order bgp_match executes: seed with the cheapest template,
    then repeatedly take the cheapest CONNECTED template (sharing a
    variable with the bound set).  Cost = estimated rows from ``stats``
    (constant predicate -> its triple count; variable predicate -> total)
    divided by 10 per bound constant in subj/obj; without stats, falls
    back to most-constants-first.  Exposed separately so planning is unit-
    testable without executing anything."""
    def tmpl_vars(i: int) -> set[str]:
        return {t[1:] for t in patterns[i] if _is_var(t)}

    def cost(i: int) -> tuple:
        s_, p_, o_ = patterns[i][0], patterns[i][1], patterns[i][2]
        n_const = sum(0 if _is_var(t) else 1 for t in patterns[i])
        if stats is None:
            return (-n_const, i)
        total = sum(stats.values()) or 1
        # path expressions (tuple predicates) cost like variable preds:
        # unknown, estimated at total (and "npred" holds a list — unhashable)
        est = (
            stats.get(p_, total)
            if isinstance(p_, str) and not _is_var(p_)
            else total
        )
        # non-predicate constants (subj/obj, and a constant GRAPH term on
        # quad patterns) each cut the estimate — same 1/10 heuristic.
        for t in (s_, o_, *patterns[i][3:]):
            if not _is_var(t):
                est = max(1, est // 10)
        return (est, -n_const, i)

    remaining = list(range(len(patterns)))
    order = [min(remaining, key=cost)]
    remaining.remove(order[0])
    bound = tmpl_vars(order[0])
    while remaining:
        connected = [i for i in remaining if tmpl_vars(i) & bound]
        pick = min(connected or remaining, key=cost)
        remaining.remove(pick)
        order.append(pick)
        bound |= tmpl_vars(pick)
    return order


def _term_cond(left_keys: list[str], pins: list[str]):
    """Aliased-frame join condition: equality on every key, '' pin on the
    left-side-only companions (_b = left bindings, _r = right pattern)."""
    cond = None
    for k in left_keys:
        e = F.col(f"_b.{k}") == F.col(f"_r.{k}")
        cond = e if cond is None else cond & e
    for c in pins:
        cond = cond & (F.col(f"_b.{c}") == F.lit(""))
    return cond


def _join_term_inner(out: DataFrame, df: DataFrame, shared: list[str]):
    """INNER join on shared variables under RDF term equality.  Single-side
    companions become pre-join '' filters (equivalent under inner joins,
    and they keep the join a plain broadcast-able equi-join)."""
    both, left_only, right_only = _companion_split(
        shared, out.columns, df.columns
    )
    for c in left_only:
        out = out.where(F.col(c) == "")
    for c in right_only:
        df = df.where(F.col(c) == "").drop(c)
    return out.join(df, on=shared + both)


def _join_term_filtering(
    out: DataFrame, df: DataFrame, shared: list[str], how: str
):
    """SEMI/ANTI join under RDF term equality (MINUS / FILTER [NOT]
    EXISTS).  Right-side-only companions pre-filter the match SET (a
    tagged right row can never term-match an IRI-position left binding);
    left-side-only companions cannot pre-filter (anti must KEEP those
    rows), so they move into an expression-join '' pin."""
    both, left_only, right_only = _companion_split(
        shared, out.columns, df.columns
    )
    r = df
    for c in right_only:
        r = r.where(F.col(c) == "")
    r = r.select(*shared, *both).distinct()
    if not left_only:
        return out.join(r, on=shared + both, how=how)
    return out.alias("_b").join(
        r.alias("_r"), _term_cond(shared + both, left_only), how=how
    )


def _join_term_left(out: DataFrame, df: DataFrame, shared: list[str]):
    """LEFT OUTER join under RDF term equality (OPTIONAL)."""
    both, left_only, right_only = _companion_split(
        shared, out.columns, df.columns
    )
    for c in right_only:
        # a tagged optional row can't term-match the IRI-position outer
        # binding; removing it just leaves the outer row unmatched — the
        # left-join-correct outcome
        df = df.where(F.col(c) == "").drop(c)
    if not left_only:
        return out.join(df, on=shared + both, how="left")
    new_cols = [c for c in df.columns if c not in set(shared) | set(both)]
    return (
        out.alias("_b")
        .join(df.alias("_r"), _term_cond(shared + both, left_only), "left")
        .select(
            *[F.col(f"_b.{c}") for c in out.columns],
            *[F.col(f"_r.{c}") for c in new_cols],
        )
    )


def bgp_match(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    distinct: bool = True,
    optional: list[tuple[str, str, str]] | None = None,
    minus: list[tuple[str, str, str]] | None = None,
    exists: list[tuple[str, str, str]] | None = None,
    stats: dict[str, int] | None = None,
    values: list[dict[str, str | None]] | None = None,
    bind: dict[str, object] | None = None,
    filter_expr: object | None = None,
    extra_bindings: list[DataFrame] | None = None,
) -> DataFrame:
    """Match a conjunctive triple pattern; one output column per variable.

    ``patterns`` terms starting with ``?`` are variables; anything else is
    matched as a constant.  ``distinct=True`` gives SPARQL
    ``SELECT DISTINCT`` semantics (set of bindings) — the deterministic
    choice for oracle comparison; ``False`` keeps bag semantics.

    ``optional`` templates are SPARQL OPTIONAL groups (one template each,
    applied in order after the required pattern): a LEFT join on the
    shared variables — unmatched rows keep NULL for the optional-only
    variables.  Each must share >=1 variable with what is already bound
    (a disconnected OPTIONAL would be a hidden cross join; refuse it).

    ``stats`` (``{pred: n_triples}``, e.g. from :func:`analyze_triples`)
    switches join ordering from most-constants-first to estimated-rows
    (see :func:`plan_order`) — the cost-based mode for stores where
    per-predicate sizes differ by orders of magnitude.

    ``minus`` templates are SPARQL MINUS / FILTER NOT EXISTS groups:
    solutions with a matching binding are REMOVED — a LEFT ANTI join on
    the shared variables (same connectivity rule).  Applied after the
    required pattern and before ``optional``.  ``exists`` templates are
    the positive twin, SPARQL FILTER EXISTS: solutions survive only if a
    matching binding exists — a LEFT SEMI join on the shared variables
    (never fans out, however many matches exist), same connectivity
    rule, applied alongside ``minus``.  Unlike adding the template to
    ``patterns``, EXISTS binds NOTHING — its variables never join
    anything downstream and never appear in the output.

    ``values`` is a SPARQL VALUES inline binding table: a list of rows,
    each ``{var: term}``; ``None`` is UNDEF (matches anything, binds
    nothing).  It is always broadcast (inline data is tiny by
    construction) and joined right after the required pattern so it
    constrains the rest of the plan early; rows without UNDEF compile to
    a plain equi-join on the shared variables, UNDEF rows to a
    null-or-equal broadcast condition join.  Variables only VALUES
    introduces extend the bindings (NULL where UNDEF).

    ``bind`` is SPARQL BIND: ``{new_var: Column-or-SQL-string}`` applied
    in insertion order AFTER optional (each expression may reference any
    bound variable, including earlier binds).  ``filter_expr`` is a
    SPARQL FILTER over the final bindings (Column or SQL string),
    applied after ``bind`` so filters can reference bound variables;
    NULL-valued predicates drop the row, matching SPARQL's
    error-eliminates semantics for unbound/ill-typed comparisons.

    ``extra_bindings`` are pre-evaluated bindings frames — SPARQL
    subquery results (operators/sparql resolves ``{ SELECT ... }``
    bottom-up into these), or any external binding table — joined INNER
    on the variables they share with the pattern (cross join if none:
    legal SPARQL, and visible in the plan like a disconnected template).
    A group may consist of extra bindings alone (``patterns`` empty).
    Scale shape: each frame is an ordinary join input — Catalyst + AQE
    broadcast it when the subquery aggregated the store down to
    dictionary size, which is the common aggregate-then-join and
    top-k-then-join case."""
    if not patterns and not extra_bindings:
        raise ValueError("empty basic graph pattern")
    if patterns:
        compiled = [_compile_template(triples, p) for p in patterns]
        order = plan_order(patterns, stats)
        out, bound = compiled[order[0]]
        for pick in order[1:]:
            df, vs = compiled[pick]
            shared = sorted(vs & bound)
            out = (
                _join_term_inner(out, df, shared)
                if shared
                else out.crossJoin(df)
            )
            bound |= vs
        pending = list(extra_bindings or [])
    else:
        pending = list(extra_bindings)
        out = pending.pop(0)
        bound = {c for c in out.columns if not c.endswith(_LANG_SUF)}
    for df in pending:
        vs = {c for c in df.columns if not c.endswith(_LANG_SUF)}
        shared = sorted(vs & bound)
        out = (
            _join_term_inner(out, df, shared)
            if shared
            else out.crossJoin(df)
        )
        bound |= vs
    if values:
        out, bound = _apply_values(out, bound, values)
    for pat in minus or []:
        df, vs = _compile_template(triples, pat)
        shared = sorted(vs & bound)
        if not shared:
            raise ValueError(
                f"MINUS pattern {pat!r} shares no variable with the "
                "required pattern"
            )
        out = _join_term_filtering(out, df, shared, "left_anti")
    for pat in exists or []:
        df, vs = _compile_template(triples, pat)
        shared = sorted(vs & bound)
        if not shared:
            raise ValueError(
                f"EXISTS pattern {pat!r} shares no variable with the "
                "required pattern"
            )
        out = _join_term_filtering(out, df, shared, "left_semi")
    for pat in optional or []:
        df, vs = _compile_template(triples, pat)
        shared = sorted(vs & bound)
        if not shared:
            raise ValueError(
                f"OPTIONAL pattern {pat!r} shares no variable with the "
                "required pattern"
            )
        out = _join_term_left(out, df, shared)
        bound |= vs
    for name, expr in (bind or {}).items():
        if name in bound:
            raise ValueError(f"BIND target ?{name} is already bound")
        if name.endswith(_LANG_SUF):
            raise ValueError(
                f"BIND target ?{name}: the {_LANG_SUF!r} suffix is "
                "reserved for language-tag companion columns"
            )
        out = out.withColumn(
            name, F.expr(expr) if isinstance(expr, str) else expr
        )
        bound.add(name)
    if filter_expr is not None:
        out = out.where(
            F.expr(filter_expr)
            if isinstance(filter_expr, str)
            else filter_expr
        )
    return out.distinct() if distinct else out


def _apply_values(
    out: DataFrame, bound: set[str], values: list[dict[str, str | None]]
) -> tuple[DataFrame, set[str]]:
    """Join a SPARQL VALUES block into the bindings (see bgp_match)."""
    from functools import reduce
    from operator import and_

    from pyspark.sql.types import StringType, StructField, StructType

    vars_ = sorted({k for row in values for k in row})
    if not vars_:
        raise ValueError("VALUES block binds no variables")
    tagged = [v for v in vars_ if v + _LANG_SUF in out.columns]
    if tagged:
        raise ValueError(
            f"VALUES over language-tagged binding(s) {tagged}: inline "
            "data holds plain terms; constrain with FILTER on LANG(?v) "
            "plus the lexical value instead"
        )
    spark = out.sparkSession
    vdf = spark.createDataFrame(
        [tuple(row.get(v) for v in vars_) for row in values],
        StructType([StructField(v, StringType(), True) for v in vars_]),
    )
    shared = sorted(set(vars_) & bound)
    new = [v for v in vars_ if v not in bound]
    has_undef = any(row.get(v) is None for row in values for v in shared)
    if not shared:
        out = out.crossJoin(F.broadcast(vdf))
    elif not has_undef:
        out = out.join(F.broadcast(vdf), on=shared)
    else:
        o, v = out.alias("_b"), vdf.alias("_v")
        cond = reduce(
            and_,
            [
                F.col(f"_v.{s}").isNull()
                | (F.col(f"_v.{s}") == F.col(f"_b.{s}"))
                for s in shared
            ],
        )
        out = o.join(F.broadcast(v), cond).select(
            *[F.col(f"_b.{c}") for c in out.columns],
            *[F.col(f"_v.{c}") for c in new],
        )
    return out, bound | set(vars_)


def bgp_construct(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    template: list[tuple[str, str, str]],
    **match_kwargs,
) -> DataFrame:
    """SPARQL CONSTRUCT: match ``patterns`` (bag semantics internally —
    duplicates cannot add triples to a set, so the match skips its own
    distinct), instantiate every ``template`` triple per solution, and
    return the constructed graph as a DISTINCT (subj, pred, obj) frame —
    an RDF graph is a set.

    Template terms are variables (``?v`` → the bound value, cast to
    string) or constants.  A solution leaving any template term unbound
    (e.g. a variable bound only by an unmatched OPTIONAL) produces NO
    triple for that template — SPARQL's partial-instantiation rule —
    while the solution's other templates still fire.

    Plan shape: ONE pass over the bindings, ``explode`` of a
    |template|-element struct array (constant fan-out, no union of
    per-template scans), then one distinct exchange on the triple —
    the same cost as a single aggregation at any scale.  ``match_kwargs``
    pass through to :func:`bgp_match` (optional/minus/values/bind/
    filter_expr/stats)."""
    if not template:
        raise ValueError("empty CONSTRUCT template")
    for t in template:
        if any(isinstance(term, tuple) for term in t):
            raise ValueError(
                f"CONSTRUCT template {t!r}: property-path expressions and "
                "tagged literals are only legal in the WHERE pattern, not "
                "the template (the constructed graph is 3-column/plain)"
            )
    bindings = bgp_match(triples, patterns, distinct=False, **match_kwargs)
    tagged = sorted({
        term[1:]
        for t in template
        for term in t
        if _is_var(term) and term[1:] + _LANG_SUF in bindings.columns
    })
    if tagged:
        raise ValueError(
            f"CONSTRUCT template uses language-tagged binding(s) "
            f"{tagged}: instantiating would silently drop the tag — "
            "construct from STR via BIND, or keep the store untagged"
        )
    return _instantiate(bindings, template).distinct()


def _instantiate(
    bindings: DataFrame, template: list[tuple[str, str, str]]
) -> DataFrame:
    """Instantiate CONSTRUCT/UPDATE ``template`` triples per solution:
    one explode of a |template|-element struct array (constant fan-out),
    partial-instantiation null guard included, NO distinct — callers
    decide set vs bag."""

    def term(t: str):
        return (F.col(t[1:]).cast("string") if _is_var(t)
                else F.lit(t).cast("string"))

    structs = [
        F.struct(term(s).alias("subj"), term(p).alias("pred"),
                 term(o).alias("obj"))
        for (s, p, o) in template
    ]
    return (
        bindings.select(F.explode(F.array(*structs)).alias("_t"))
        .select("_t.subj", "_t.pred", "_t.obj")
        .where(F.col("subj").isNotNull()
               & F.col("pred").isNotNull()
               & F.col("obj").isNotNull())
    )


def solution_modifiers(
    bindings: DataFrame,
    order_by: list[tuple[str, str]],
    limit: int | None = None,
    offset: int = 0,
    project: list[str] | None = None,
) -> DataFrame:
    """SPARQL solution modifiers: ORDER BY / OFFSET / LIMIT / projection
    over a bindings frame (the output of :func:`bgp_match` or
    :func:`bgp_aggregate`).

    ``order_by`` is ``[(var, "asc"|"desc"), ...]``.  SPARQL leaves ties
    implementation-defined; for reproducible results (and oracle
    comparison) the given keys are EXTENDED with every remaining
    projected column ascending, so the order is total whenever the
    projection has no duplicate rows.  Unbound (NULL) sorts first on
    ascending keys, last on descending — matching SPARQL's
    unbound-lowest ordering.

    Scale shape: with a LIMIT, Catalyst executes per-partition
    top-(offset+limit) heaps merged on the driver
    (``TakeOrderedAndProject``) — no global sort is ever materialized,
    so ORDER BY + LIMIT over 10^12 bindings costs one scan + a
    k-row merge.  OFFSET without LIMIT still needs the global order;
    keep offsets bounded."""
    cols = project if project is not None else bindings.columns
    out = bindings.select(*cols) if project is not None else bindings
    keyed = set()
    sort_cols = []
    for var, direction in order_by:
        d = direction.lower()
        if d not in ("asc", "desc"):
            raise ValueError(f"ORDER BY direction must be asc/desc: {d!r}")
        sort_cols.append(
            F.col(var).asc_nulls_first() if d == "asc"
            else F.col(var).desc_nulls_last()
        )
        keyed.add(var)
    sort_cols += [F.col(c).asc_nulls_first() for c in cols if c not in keyed]
    out = out.orderBy(*sort_cols)
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


# SPARQL aggregate -> deterministic Spark expression.  SAMPLE elects min
# (any value is spec-legal; min is reproducible), GROUP_CONCAT sorts first
# for the same reason.
_AGG_FNS = ("count", "count_distinct", "sum", "min", "max", "avg",
            "sample", "group_concat")


def bgp_aggregate(
    bindings: DataFrame,
    group_by: list[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """SPARQL GROUP BY + aggregates over a bindings frame (the output of
    :func:`bgp_match`, typically with ``distinct=False`` for bag
    semantics).  ``aggs`` maps each output column to ``(fn, var)`` with
    fn one of COUNT / COUNT_DISTINCT / SUM / MIN / MAX / AVG / SAMPLE /
    GROUP_CONCAT (case-insensitive); ``("count", "*")`` is COUNT(*).
    ``COUNT(?v)`` skips NULL bindings — exactly SPARQL's unbound-skipping
    semantics for aggregates over OPTIONAL variables.  Empty ``group_by``
    is the single implicit group.  One hash aggregation, map-side
    combining for every fn except COUNT_DISTINCT/GROUP_CONCAT (expand /
    collect respectively — both still one exchange keyed on the group)."""
    exprs = []
    for out_name, (fn, var) in aggs.items():
        f = fn.lower()
        if f not in _AGG_FNS:
            raise ValueError(f"unknown aggregate fn: {fn!r}")
        if f == "count":
            e = F.count(F.lit(1)) if var == "*" else F.count(var)
            e = e.cast("long")
        elif f == "count_distinct":
            e = F.countDistinct(var).cast("long")
        elif f == "sum":
            e = F.sum(var)
        elif f == "min":
            e = F.min(var)
        elif f == "max":
            e = F.max(var)
        elif f == "avg":
            e = F.avg(var)
        elif f == "sample":
            e = F.min(var)
        else:  # group_concat
            e = F.array_join(F.array_sort(F.collect_list(var)), " ")
        exprs.append(e.alias(out_name))
    if group_by:
        return bindings.groupBy(*group_by).agg(*exprs)
    return bindings.agg(*exprs)


def bgp_union(
    triples: DataFrame,
    groups: list[dict],
    distinct: bool = True,
) -> DataFrame:
    """SPARQL UNION of pattern groups: each ``groups`` entry is a dict of
    :func:`bgp_match` keyword arguments (``patterns`` required; optional/
    minus/values/bind/filter_expr/stats all legal), evaluated
    independently and unioned by VARIABLE NAME — a variable bound in one
    branch but not another is unbound (NULL) on the other branch's rows,
    exactly SPARQL's union-extends-the-binding-set rule.

    ``distinct=True`` is SELECT DISTINCT over the union (one hash
    aggregate after the union — branches skip their own distinct, it
    would be redundant work); ``False`` keeps bag semantics
    (UNION ALL of the branch bags).

    Plan shape: the branches are independent subtrees under one Union
    node — Spark schedules their stages concurrently, and each branch
    keeps its own pushed-down constant filters, so the union never
    forces a common scan."""
    if not groups:
        raise ValueError("empty UNION")
    outs = [bgp_match(triples, distinct=False, **g) for g in groups]
    all_vars: list[str] = []
    for o in outs:
        for c in o.columns:
            if c not in all_vars:
                all_vars.append(c)
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionByName(nxt, allowMissingColumns=True)
    out = out.select(*all_vars)
    # a variable tagged in one branch, IRI-position in another: the fill
    # for the untagged branch's BOUND rows is '' (plain term), NULL stays
    # only where the variable itself is unbound
    for c in all_vars:
        if c.endswith(_LANG_SUF):
            v = c[: -len(_LANG_SUF)]
            out = out.withColumn(
                c,
                F.when(
                    F.col(c).isNull() & F.col(v).isNotNull(), F.lit("")
                ).otherwise(F.col(c)),
            )
    return out.distinct() if distinct else out


def bgp_ask(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    **match_kwargs,
) -> DataFrame:
    """SPARQL ASK: does at least one solution exist?  Returns a 1-row
    frame with one boolean column ``ask``.

    Plan shape: the match runs with bag semantics under a ``LIMIT 1`` —
    Catalyst plans CollectLimit, so execution stops at the FIRST
    solution found (early-exit per task, then per stage); the store is
    never exhausted just to answer yes/no.  The aggregate over the
    0-or-1 surviving rows always yields exactly one row, so ASK on an
    empty match is ``false``, not an empty frame."""
    hit = bgp_match(triples, patterns, distinct=False, **match_kwargs)
    return hit.limit(1).agg(
        (F.count(F.lit(1)) > 0).alias("ask")
    )


def bgp_describe(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    var: str,
    include_incoming: bool = False,
    **match_kwargs,
) -> DataFrame:
    """SPARQL DESCRIBE ?var WHERE {...}: every triple whose SUBJECT is a
    resource the query binds to ``var`` (the spec leaves the description
    form to the store; this is the standard one-hop concise-bounded
    description).  ``include_incoming=True`` also returns triples whose
    OBJECT is a described resource (symmetric CBD).

    Plan shape: the distinct resource set from the match, then ONE
    left-semi join per direction against the store — semi joins never
    fan out (a resource with a million triples contributes each triple
    once), and with AQE the resource set broadcasts whenever the match
    is selective, leaving the store scan shuffle-free."""
    name = var[1:] if var.startswith("?") else var
    bindings = bgp_match(triples, patterns, distinct=False, **match_kwargs)
    if name not in bindings.columns:
        raise ValueError(f"DESCRIBE variable ?{name} is not bound")
    nodes = bindings.select(F.col(name).alias("_n")).where(
        F.col("_n").isNotNull()
    ).distinct()
    out = triples.join(
        nodes, on=triples["subj"] == nodes["_n"], how="left_semi"
    )
    if include_incoming:
        out = out.unionByName(
            triples.join(
                nodes, on=triples["obj"] == nodes["_n"], how="left_semi"
            )
        ).distinct()
    cols = ["subj", "pred", "obj"]
    if "obj_lang" in triples.columns:  # tagged store: description keeps tags
        cols.append("obj_lang")
    return out.select(*cols)


def update_where(
    triples: DataFrame,
    where: list[tuple[str, str, str]],
    delete: list[tuple[str, str, str]] | None = None,
    insert: list[tuple[str, str, str]] | None = None,
    **match_kwargs,
) -> DataFrame:
    """SPARQL UPDATE ``DELETE {...} INSERT {...} WHERE {...}`` as a pure
    batch transform: returns the NEW graph (the store itself is
    immutable parquet/Iceberg — the caller writes the result as the next
    snapshot, which is how atomic SPARQL UPDATE maps onto a data lake).

    Both templates instantiate per WHERE solution with CONSTRUCT's
    partial-instantiation rule (a solution leaving a template term
    unbound fires none of THAT template's triples, the rest still
    fire).  Semantics are RDF-set: delete-then-insert, so a triple in
    both template sets ends up PRESENT, matching SPARQL UPDATE's
    defined order.

    Plan shape, sized for a 10^12-triple store: the delete set is
    deduped then removed with ONE left-anti join (build side = the
    delete set, broadcast under AQE when selective — the store only
    streams); the insert set is deduped, anti-joined against the store
    remainder (dedup against what survives, NOT a full-graph distinct —
    the store side never re-shuffles into a global exchange), and
    unioned on.  On a store bucketed by the triple hash both joins are
    shuffle-free on the big side."""
    if not delete and not insert:
        raise ValueError("UPDATE needs a DELETE and/or INSERT template")
    if "obj_lang" in triples.columns:
        raise ValueError(
            "UPDATE over a language-tagged store is not supported: the "
            "3-column delete/insert templates cannot express tags — "
            "update the untagged projection and re-join obj_lang, or "
            "rewrite via the tagged N-Triples serializer"
        )
    spo = ["subj", "pred", "obj"]
    bindings = bgp_match(
        triples, where, distinct=False, **match_kwargs
    ).localCheckpoint(eager=False)
    out = triples.select(*spo)
    if delete:
        dels = _instantiate(bindings, delete).distinct()
        out = out.join(dels, on=spo, how="left_anti")
    if insert:
        ins = _instantiate(bindings, insert).distinct()
        out = out.unionByName(ins.join(out, on=spo, how="left_anti"))
    return out
