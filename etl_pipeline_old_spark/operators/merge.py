"""MERGE / upsert / SCD2 patterns (no Delta in this environment — these are
the anti-join + union + window emulations, exactly-once equivalents of the
reference's full-refresh + incremental pair at the row level).

At scale: both patterns shuffle once on the merge key; with bucketed
storage on the key the shuffle disappears entirely (see
tests/test_storage_layout.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT:
    updates win on key collision, untouched target rows pass through."""
    return updates.unionByName(target.join(updates, list(keys), "left_anti"))


def scd2_history(
    versions: DataFrame,
    key: str,
    effective_col: str,
    attrs: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type 2: order each key's versions by
    effective timestamp (plus ``tiebreak`` columns for same-instant
    versions — REQUIRED for determinism when effective values can tie);
    valid_to = next version's start (null = current)."""
    w = W.partitionBy(key).orderBy(effective_col, *tiebreak)
    return versions.select(
        key,
        *attrs,
        F.col(effective_col).alias("valid_from"),
        F.lead(effective_col).over(w).alias("valid_to"),
        (F.lead(effective_col).over(w).isNull()).alias("is_current"),
    )
