"""Date/time scalar functions (SURVEY.md §2.9 F14/F15/F16/F21/F22).

The reference's timestamps are tz-naive-as-UTC, converted to Yekaterinburg
wall time for reporting (create_yougile_dataset.ipynb:168-175); epoch-ms
ints from the YouGile API become ISO-8601 strings
(fetch_yougile_programming.py:160-191).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

REFERENCE_TZ = "Asia/Yekaterinburg"

ISO_Z = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def epoch_ms_to_iso(col: Column | str) -> Column:
    """F14: epoch-milliseconds → ISO-8601 "…Z" string (``to_iso``,
    fetch_yougile_programming.py:160-191)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.timestamp_millis(c.cast("long")), ISO_Z)


def to_timestamp_coerce(col: Column | str, fmt: str | None = None) -> Column:
    """F15: string→timestamp with null-on-failure (``pd.to_datetime(
    errors='coerce')``, create_yougile_dataset.ipynb:228-231). ``try_to_
    timestamp`` keeps the coerce semantics under Spark 4's default ANSI."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt)) if fmt else F.try_to_timestamp(c)


def utc_to_local(col: Column | str, tz: str = REFERENCE_TZ) -> Column:
    """F16: tz_localize('UTC').tz_convert(tz)
    (create_yougile_dataset.ipynb:168-175)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_utc_timestamp(c, tz)


def clip(col: Column | str, lo: float, hi: float) -> Column:
    """F21: ``np.clip`` (create_yougile_dataset.ipynb:196-220)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))


def fractional_hour(col: Column | str) -> Column:
    """F21: ``hour + minute/60`` (create_yougile_dataset.ipynb:196-220)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.hour(c) + F.minute(c) / 60.0
