"""Lenient cell-value casts — reference F5 parity.

The reference's ``CellValue::as_i64/as_f64/as_bool/as_string``
(/root/reference/src/types.rs:101-152) are permissive accessors: failed
conversions yield ``None`` rather than erroring.  Spark-side each one is
a pure column expression; semantics are pinned to the REFERENCE rules,
which are stricter than both Spark's and DuckDB's native string casts:

* ``as_i64``: integer strings only — Rust ``s.parse::<i64>()`` rejects
  "3.5" (Spark non-ANSI cast truncates it, DuckDB TRY_CAST rounds it),
  so the string path is regex-guarded to ``^[+-]?[0-9]+$`` before the
  cast.  Floats truncate toward zero.
* ``as_f64``: standard decimal/scientific parse; failures -> NULL.
* ``as_bool``: the reference's word list EXACTLY — true/yes/1,
  false/no/0, case-insensitive — NOT Spark's wider t/f/y/n set.
  Numbers: nonzero -> true.
* ``as_string``: Display form; Error cells render as ``ERROR: <e>``.

Every helper has an equivalent ANSI SQL form (the ``*_SQL`` templates)
so oracle queries stay in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INT_RE = r"^[+-]?[0-9]+$"

#: SQL templates (DuckDB/ANSI), kept in lockstep with the Column forms.
LENIENT_LONG_SQL = (
    "CASE WHEN regexp_matches({c}, '^[+-]?[0-9]+$') THEN TRY_CAST({c} AS BIGINT) END"
)
LENIENT_DOUBLE_SQL = "TRY_CAST({c} AS DOUBLE)"
LENIENT_BOOL_SQL = (
    "CASE WHEN lower({c}) IN ('true','yes','1') THEN true "
    "WHEN lower({c}) IN ('false','no','0') THEN false END"
)


def lenient_long(col) -> Column:
    """String -> bigint, integer literals only (reference as_i64)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.when(col.rlike(_INT_RE), col.try_cast("bigint"))


def lenient_long_from_double(col) -> Column:
    """Float -> bigint truncating toward zero (Rust ``as i64``)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.when(col >= 0, F.floor(col)).otherwise(F.ceil(col)).try_cast("bigint")


def lenient_double(col) -> Column:
    """String -> double; unparseable -> NULL (reference as_f64)."""
    col = F.col(col) if isinstance(col, str) else col
    return col.try_cast("double")


def lenient_bool(col) -> Column:
    """String -> boolean via the reference word list (as_bool)."""
    col = F.col(col) if isinstance(col, str) else col
    low = F.lower(col)
    return (
        F.when(low.isin("true", "yes", "1"), F.lit(True))
        .when(low.isin("false", "no", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def lenient_bool_from_long(col) -> Column:
    """Int -> bool: nonzero is true (reference as_bool Int arm)."""
    col = F.col(col) if isinstance(col, str) else col
    return (col != 0).cast("boolean")


def error_display(col) -> Column:
    """Error-cell Display form: ``ERROR: <message>`` (as_string Error arm)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit("ERROR: "), col)
