"""Scalar string/path functions — SURVEY.md §2.7/§2.8 (F1, F2, F6, P6, U1).

Every function here compiles to built-in Catalyst expressions (whole-stage
codegen, no Python in the hot path).  The reference implements the same
semantics as T-SQL scalar UDFs and cursor loops:

* F1  `dbo.stringpart(str, delim, n)` — WHILE/CHARINDEX loop,
  MSSQL/OMOPLoader.sql:259-282                 -> split()[n]
* F2  colon prefix strip — substring(x, charindex(':',x)+1, 200),
  MSSQL/OMOPLoader.sql:744-746, 1443           -> expr over instr/substring
* P6  truncating projection substring(x,1,50) — MSSQL/OMOPLoader.sql:537,
  1216-1219 (truncation is SEMANTICS: reproduced exactly)
* U1  `pcornet_parsecode` quoted-CSV codelist parser — character state
  machine over a cursor, MSSQL/OMOPLoader.sql:436-475
                                                -> regexp_replace + split +
                                                   explode (fully vectorized)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def path_segment(col: Column | str, n: int, delim: str = "\\") -> Column:
    """n-th (1-based) ``delim``-separated segment of a materialized path.

    ``path_segment('\\A\\B\\C\\', 1) == 'A'`` — matches dbo.stringpart
    (MSSQL/OMOPLoader.sql:259-282) which returns the n-th non-empty segment.
    """
    c = F.col(col) if isinstance(col, str) else col
    # split on the delimiter; leading delimiter yields an empty element 0,
    # so the n-th path segment is element n (element_at is 1-based).
    pattern = "\\\\" if delim == "\\" else delim
    return F.element_at(F.split(c, pattern), n + 1)


def prefix_strip(col: Column | str, delim: str = ":") -> Column:
    """Everything after the FIRST ``delim``; passthrough when absent.

    Exact reproduction of substring(x, charindex(':',x)+1, 200)
    (MSSQL/OMOPLoader.sql:744-746): charindex=0 when missing -> substring
    from position 1 -> the full string.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(
        c, F.instr(c, delim) + F.lit(1), F.lit(200)
    )


def truncate_source_value(col: Column | str, length: int = 50) -> Column:
    """varchar(50) truncating projection (MSSQL/OMOPLoader.sql:537)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, length)


def codelist_explode(col: Column | str) -> Column:
    """Parse a quoted-CSV code list ``'01','02','10'`` into an array.

    Vectorized replacement for the cursor/state-machine parser
    `pcornet_parsecode` (MSSQL/OMOPLoader.sql:436-475) +
    `pcornet_popcodelist` (:480-508).  Use with F.explode().
    Empty / null input yields an empty array (explode drops the row,
    matching the reference's no-codes behaviour).
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, "'", "")
    return F.when(
        F.coalesce(F.length(F.trim(cleaned)), F.lit(0)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(cleaned, ","))


def normalize_url(col: Column | str) -> Column:
    """Canonical URL form — the webtext dedup/join key primitive.

    Contract (each rule is a pure composable expression, all JVM-side
    regexp/array built-ins, no UDF):
      1. fragment removed;
      2. scheme and host lowercased;
      3. default port dropped (:80 for http, :443 for https);
      4. duplicate slashes in the path collapsed, trailing slash stripped
         (root stays ``/``; an empty path becomes ``/``);
      5. query parameters sorted lexicographically by their ``k=v`` string
         (stable canonical order for hash/dedup keys); an empty query drops
         the ``?``.

    Two crawls of the same resource under cosmetically different URLs then
    collapse to one key for exact dedup (dd_exact_duplicates) and for
    url-keyed joins.
    """
    c = F.col(col) if isinstance(col, str) else col
    no_frag = F.regexp_replace(c, "#.*$", "")
    parts = F.split(no_frag, r"\?", 2)
    base = F.get(parts, 0)
    qs = F.get(parts, 1)  # null when no '?'
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    after = F.regexp_replace(base, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    raw_path = F.regexp_replace(after, r"^[^/]*", "")
    collapsed = F.regexp_replace(raw_path, "/{2,}", "/")
    stripped = F.regexp_replace(collapsed, "/$", "")
    path = F.when(F.length(stripped) == 0, F.lit("/")).otherwise(stripped)
    sorted_q = F.array_join(F.array_sort(F.split(qs, "&")), "&")
    query = F.when(
        qs.isNotNull() & (F.length(qs) > 0), F.concat(F.lit("?"), sorted_q)
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, query)
