"""Ordered first-match-wins classifiers (SURVEY.md §2.9 F2/F3/F5/F6/F17).

The reference implements these as ``np.select`` / dict-iteration row-wise
applies where LITERAL ORDER IS PRIORITY ORDER
(datasets/create_projectsync_dataset.ipynb:135-160, 204-242, 252-299).
A chained ``F.when`` preserves exactly that short-circuit semantics and
stays inside codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# rule match modes mirroring the reference's (contains | endswith) pairs
MODE_CONTAINS = "contains"
MODE_ENDSWITH = "endswith"
MODE_STARTSWITH = "startswith"
MODE_RLIKE = "rlike"


def classify(
    col: Column | str,
    rules: Sequence[tuple[str, str, str]],
    default: str,
    case_insensitive: bool = False,
) -> Column:
    """First-match-wins classifier.

    ``rules``: ordered ``(mode, pattern, label)`` triples; ``mode`` is one of
    contains/endswith/startswith/rlike. Order is preserved — the reference's
    dict-iteration-order-as-priority contract (SURVEY.md §7 risk register).
    """
    c = F.col(col) if isinstance(col, str) else col
    probe = F.lower(c) if case_insensitive else c
    out: Column | None = None
    for mode, pattern, label in rules:
        pat = pattern.lower() if case_insensitive else pattern
        if mode == MODE_CONTAINS:
            cond = probe.contains(pat)
        elif mode == MODE_ENDSWITH:
            cond = probe.endswith(pat)
        elif mode == MODE_STARTSWITH:
            cond = probe.startswith(pat)
        elif mode == MODE_RLIKE:
            cond = probe.rlike(pat)
        else:
            raise ValueError(f"unknown rule mode: {mode}")
        cond = F.coalesce(cond, F.lit(False))  # null-safe like pandas na=False
        out = F.when(cond, F.lit(label)) if out is None else out.when(cond, F.lit(label))
    assert out is not None, "classify() needs at least one rule"
    return out.otherwise(F.lit(default))


def classify_contains(
    col: Column | str, pairs: Sequence[tuple[str, str]], default: str, **kw
) -> Column:
    """F2/F5 convenience: all-contains rule list (np.select analog)."""
    return classify(col, [(MODE_CONTAINS, p, l) for p, l in pairs], default, **kw)


def flag_from_regex(col: Column | str, pattern: str) -> Column:
    """F3: case-insensitive regex-contains → int 0/1
    (create_projectsync_dataset.ipynb:165 ``is_detached``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.rlike(pattern), F.lit(False)).cast("int")


def status_from_null(col: Column | str, if_null: str, if_set: str) -> Column:
    """F17: ``np.where(x.isnull(), 'В работе', 'Закрыта')``
    (create_yougile_dataset.ipynb:233-237)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(if_null)).otherwise(F.lit(if_set))
