"""Google-Sheets-style source adapter (S9).

Reference: ``ws.get_all_values()`` → row 0 is the header, ragged rows are
padded to header length, CR/LF inside cells become spaces, one column is
truncated to its first token (extractors/fetch_gsheet_instructions.py:29-50).
The sheet client is injectable (a callable returning list[list[str]]), so
the cleaning pipeline is unit-testable offline.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..functions.strings import clean_all_string_cells, sanitize_column_names


def sheet_to_dataframe(
    spark: SparkSession,
    get_all_values: Callable[[], list[list[str]]],
    clean_crlf: bool = True,
) -> DataFrame:
    """Header row + ragged-row padding (P14) + cell cleaning (F8)."""
    values = get_all_values()
    if not values:
        raise ValueError("empty sheet")
    header, *rows = values
    width = len(header)
    padded = [tuple((r + [""] * width)[:width]) for r in rows]  # P14
    df = spark.createDataFrame(padded or [], ", ".join(f"`{h}` string" for h in header))
    df = sanitize_column_names(df)
    if clean_crlf:
        df = clean_all_string_cells(df)
    return df
