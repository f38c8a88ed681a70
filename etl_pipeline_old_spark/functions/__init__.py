"""Scalar expression library (SURVEY.md §2.9/§2.10).

Every reference scalar UDF that was a row-wise pandas ``apply`` becomes a
native Column expression here (JVM-side, whole-stage-codegen'd) — the only
surviving Python UDF is the business-day duration (``workdays``), kept as a
vectorized pandas UDF with a pure-SQL fallback.
"""

from .classify import classify_contains, flag_from_regex, status_from_null
from .nulls import drop_all_null_columns, impute_by_dtype, numeric_coerce
from .strings import (
    clean_crlf,
    first_token,
    format_n0,
    sanitize_column_names,
    short_name,
    strip_trailing_token,
)

__all__ = [
    "classify_contains",
    "flag_from_regex",
    "status_from_null",
    "drop_all_null_columns",
    "impute_by_dtype",
    "numeric_coerce",
    "clean_crlf",
    "first_token",
    "format_n0",
    "sanitize_column_names",
    "short_name",
    "strip_trailing_token",
]
