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
