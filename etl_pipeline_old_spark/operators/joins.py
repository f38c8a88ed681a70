"""Join operators.

Every reference join is a left equi-join of a fact frame against a narrow
dimension projection (``pd.merge(how='left')`` — SURVEY.md §2.4, J1-J12,
e.g. ``/root/reference/datasets/create_logs_dataset.ipynb:87-101``). At scale
these are broadcast hash joins: the dimension is tiny relative to the fact,
so we hint ``F.broadcast`` explicitly rather than relying on the 10 MB
autoBroadcast threshold (a 100 TB fact side must never be shuffled for a
dim lookup).

The reference's recurring "two merges against the same dim to pull two
columns" anti-pattern (J3/J6/J8, ``create_scripts_dataset.ipynb:176-188``)
collapses to ONE broadcast join pulling all payload columns.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: Mapping[str, str] | str,
    payload: Sequence[str] | Mapping[str, str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Left-enrich ``fact`` with ``payload`` columns from ``dim``.

    ``on``: fact_key -> dim_key mapping (or a shared column name).
    ``payload``: dim columns to pull, optionally renamed via a mapping.

    Replaces the reference's merge-rename-drop dance
    (``create_scripts_dataset.ipynb:138-151``: merge, then drop the
    duplicated dim key, then repair ``_x``/``_y`` suffixes) — aliasing
    before the join makes collisions structurally impossible.
    """
    if isinstance(on, str):
        on = {on: on}
    if not isinstance(payload, Mapping):
        payload = {c: c for c in payload}

    d = dim.select(
        *[F.col(k).alias(f"__key_{i}") for i, k in enumerate(on.values())],
        *[F.col(src).alias(dst) for src, dst in payload.items()],
    )
    if broadcast:
        d = F.broadcast(d)
    cond = None
    for i, fact_key in enumerate(on.keys()):
        c = fact[fact_key] == d[f"__key_{i}"]
        cond = c if cond is None else (cond & c)
    out = fact.join(d, cond, how)
    return out.drop(*[f"__key_{i}" for i in range(len(on))])


def semi(fact: DataFrame, keys: DataFrame, on: Mapping[str, str] | str) -> DataFrame:
    """EXISTS — J12 semi-join pushdown
    (``/root/reference/extractors/fetch_yougile_programming.py:221-234``)."""
    return _existence(fact, keys, on, "left_semi")


def anti(fact: DataFrame, keys: DataFrame, on: Mapping[str, str] | str) -> DataFrame:
    """NOT EXISTS — U2/P6 anti-membership
    (``create_yougile_dataset.ipynb:79-85``)."""
    return _existence(fact, keys, on, "left_anti")


def _existence(fact: DataFrame, keys: DataFrame, on, how: str) -> DataFrame:
    if isinstance(on, str):
        on = {on: on}
    k = keys.select(*[F.col(v).alias(f"__key_{i}") for i, v in enumerate(on.values())]).distinct()
    cond = None
    for i, fact_key in enumerate(on.keys()):
        c = fact[fact_key] == k[f"__key_{i}"]
        cond = c if cond is None else (cond & c)
    return fact.join(F.broadcast(k), cond, how)


def snowflake_probe(
    fact: DataFrame,
    hops: Sequence[tuple[DataFrame, str, str]],
    final_filter: Column | None = None,
) -> DataFrame:
    """J10: chain of dim hops task→column→board→project then filter
    (``fetch_yougile_programming.py:221-251``). Inner joins — the trailing
    filter drops misses anyway, and inner lets Catalyst reorder freely.
    """
    out = fact
    for dim, left_key, right_key in hops:
        out = out.join(F.broadcast(dim), out[left_key] == dim[right_key], "inner")
    if final_filter is not None:
        out = out.filter(final_filter)
    return out
