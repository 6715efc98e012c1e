"""Per-value data-type classification (the reference's DataTypeEnum lattice).

Reference: values arrive as strings; "type" is a per-value regex
classification into BOOLEAN / INTEGER / DOUBLE / STRING / DATE / TIME /
EMPTY (`dataquality-statistics/.../type/DataTypeEnum.java:24-32`,
`TypeInferenceUtils.java:28-45,119-128,157-159`).  Full-width digits/signs
are accepted for numbers; boolean is literal true/false ignore-case; empty is
null-or-blank.

All classifiers below are RE2-compatible regexes (no backrefs) so the exact
same patterns run in Spark (Java regex) and in the DuckDB oracle (RE2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference-semantics patterns (re-expressed, see TypeInferenceUtils.java:28-45).
INTEGER_PATTERN = r"^[-+－＋]?[0-9０-９]+$"
# Decimal with optional US (1,234.5) or EU (1.234,5) grouping, scientific
# notation, optional trailing percent; plain integers also parse as doubles
# ("any integer is a double", DataTypeOccurences.java:41-82).
DOUBLE_PATTERN = (
    r"^[-+－＋]?("
    r"([0-9０-９]+|[0-9]{1,3}(,[0-9]{3})+|[0-9]{1,3}(\.[0-9]{3})+|[0-9]{1,3}( [0-9]{3})+)"
    r"([.,][0-9０-９]+)?"
    r")([eE][-+]?[0-9]+)?%?$"
)
BOOLEAN_PATTERN = r"^(?i)(true|false)$"
# Cheap date prefilter, reference device at SystemDateTimePatternManager.java:94-95.
DATE_PREFILTER_PATTERN = r"([ \-][0-9]|[0-9][./+W年][0-9]|^[0-9]{8}$)"

# Date patterns tried in frequency order (`SortedList` analog — the coalesce
# is short-circuit, so order = expected frequency).
DATE_FORMATS: tuple[str, ...] = (
    "yyyy-MM-dd",
    "M/d/yyyy",
    "d/M/yyyy",
    "yyyy/M/d",
    "yyyyMMdd",
    "d-MMM-yyyy",
    "MMM d, yyyy",
    "d.M.yyyy",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
)
TIME_FORMATS: tuple[str, ...] = ("HH:mm:ss", "HH:mm", "h:mm a")

TYPE_ORDER: tuple[str, ...] = ("EMPTY", "BOOLEAN", "INTEGER", "DOUBLE", "DATE", "TIME", "STRING")


def is_empty(col: Column) -> Column:
    """Null or all-whitespace (TypeInferenceUtils.java:157-159)."""
    return col.isNull() | (F.trim(col) == F.lit(""))


def is_boolean(col: Column) -> Column:
    return col.rlike(BOOLEAN_PATTERN)


def is_integer(col: Column) -> Column:
    return col.rlike(INTEGER_PATTERN)


def is_double(col: Column) -> Column:
    return col.rlike(DOUBLE_PATTERN)


def is_date(col: Column) -> Column:
    """rlike prefilter gate, then try the pattern list (coalesce short-circuit)."""
    attempts = [F.try_to_timestamp(col, F.lit(fmt)) for fmt in DATE_FORMATS]
    return col.rlike(DATE_PREFILTER_PATTERN) & F.coalesce(*attempts).isNotNull()


def is_time(col: Column) -> Column:
    attempts = [F.try_to_timestamp(col, F.lit(fmt)) for fmt in TIME_FORMATS]
    return col.rlike(r"^[0-9]{1,2}:[0-9]{2}") & F.coalesce(*attempts).isNotNull()


def classify(col: Column) -> Column:
    """Per-value type verdict, first match wins (DataTypeAnalyzer order)."""
    return (
        F.when(is_empty(col), F.lit("EMPTY"))
        .when(is_boolean(col), F.lit("BOOLEAN"))
        .when(is_integer(col), F.lit("INTEGER"))
        .when(is_double(col), F.lit("DOUBLE"))
        .when(is_date(col), F.lit("DATE"))
        .when(is_time(col), F.lit("TIME"))
        .otherwise(F.lit("STRING"))
    )


def is_valid_as(col: Column, expected_type: str) -> Column:
    """Validity of a value against a declared type — DataTypeQualityAnalyzer
    dispatch (`statistics/quality/DataTypeQualityAnalyzer.java:59-99`,
    `TypeInferenceUtils.isValid:167-185`).  STRING is always valid."""
    t = expected_type.upper()
    if t == "STRING":
        return F.lit(True)
    if t == "BOOLEAN":
        return is_boolean(col)
    if t == "INTEGER":
        return is_integer(col)
    if t == "DOUBLE":
        # INTEGER ⊂ DOUBLE
        return is_double(col) | is_integer(col)
    if t == "DATE":
        return is_date(col)
    if t == "TIME":
        return is_time(col)
    raise ValueError(f"unknown expected type: {expected_type}")
