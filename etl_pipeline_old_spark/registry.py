"""Query registry: one entry per operator from SURVEY.md §2.

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame`` with the
equivalent DuckDB-runnable ANSI SQL oracle (or ``None`` for ops that SQL
cannot express 1:1 — LSH bucketing, streaming, pandas-UDF paths — which get
the driver's weaker rows-only check).

Contract notes (driver-facing, see /root/repo/__spark_entry__.py):
- every computed column is aliased identically in both the Spark plan and
  the oracle SQL, because the comparator sorts columns by name;
- double-typed aggregates are rounded in BOTH engines so that
  floating-point summation order (parallel Spark vs sequential DuckDB)
  cannot flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import all query modules exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from .queries import load_all  # local import to avoid cycles

    load_all()
    _LOADED = True
