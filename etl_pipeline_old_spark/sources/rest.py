"""Paginated REST source adapter (S7/S8).

Re-expresses the reference's YouGile extractor
(extractors/fetch_yougile_programming.py:128-158): offset/limit pages of
1000, lazy generator, 5-retry exponential backoff honoring ``Retry-After``
on 429. The HTTP transport is injectable so the adapter is unit-testable
offline; on a cluster the page fan-out variant parallelizes fetches across
executors with ``mapInPandas`` (one task per page range) instead of a
driver-side loop.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession

PAGE_LIMIT = 1000  # ref: fetch_yougile_programming.py:27
MAX_RETRIES = 5  # ref: Retry(total=5), :46-52


class TransportError(Exception):
    def __init__(self, status: int, retry_after: float | None = None):
        super().__init__(f"HTTP {status}")
        self.status = status
        self.retry_after = retry_after


def get_with_backoff(
    fetch: Callable[[int, int], list[dict]],
    offset: int,
    limit: int,
    sleep: Callable[[float], None] = time.sleep,
) -> list[dict]:
    """One page with the reference's retry policy: exponential backoff
    (1,2,4,8,16 s), 429 honors Retry-After."""
    delay = 1.0
    for attempt in range(MAX_RETRIES + 1):
        try:
            return fetch(offset, limit)
        except TransportError as e:
            if attempt == MAX_RETRIES:
                raise
            wait = e.retry_after if (e.status == 429 and e.retry_after) else delay
            sleep(wait)
            delay *= 2
    raise AssertionError("unreachable")


def paginate(
    fetch: Callable[[int, int], list[dict]],
    limit: int = PAGE_LIMIT,
    sleep: Callable[[float], None] = time.sleep,
) -> Iterator[dict]:
    """Lazy offset/limit pagination — constant memory, stops on a short
    page (ref: fetch_yougile_programming.py:146-158)."""
    offset = 0
    while True:
        page = get_with_backoff(fetch, offset, limit, sleep)
        yield from page
        if len(page) < limit:
            return
        offset += limit


def rest_to_dataframe(
    spark: SparkSession,
    fetch: Callable[[int, int], list[dict]],
    schema: Any,
    limit: int = PAGE_LIMIT,
) -> DataFrame:
    """Driver-side fetch → DataFrame (fine for dims; the reference's whole
    YouGile board is ~10³ tasks)."""
    return spark.createDataFrame(list(paginate(fetch, limit)), schema=schema)


def rest_pages_parallel(
    spark: SparkSession,
    make_fetch: Callable[[], Callable[[int, int], list[dict]]],
    n_pages: int,
    schema: str,
    limit: int = PAGE_LIMIT,
) -> DataFrame:
    """Scale path: fan page fetches out over executors. ``make_fetch`` is a
    picklable factory (each task builds its own session/connection).

    spark.range(n_pages) → repartition → mapInPandas keeps every executor
    fetching concurrently; at 10⁶ pages this is the only shape that works.
    """
    import pandas as pd

    def op(batches):
        fetch = make_fetch()
        for pdf in batches:
            for page_no in pdf["id"]:
                rows = get_with_backoff(fetch, int(page_no) * limit, limit)
                if rows:
                    yield pd.DataFrame(rows)

    return (
        spark.range(n_pages)
        .repartition(min(n_pages, 64))
        .mapInPandas(op, schema=schema)
    )


def oauth_headers(token: str) -> dict[str, str]:
    """OAuth bearer-style header for token-authenticated single-shot APIs —
    the Yandex Metrika management probe's auth shape
    (/root/reference/extractors/fetch_yandex_token.py: ``Authorization:
    OAuth <token>``; the reference script only prints the counter list and
    feeds nothing downstream). Token comes from the caller's secret store,
    never from code."""
    return {"Authorization": f"OAuth {token}"}


def metrika_counters(
    spark: SparkSession,
    transport: Callable[[str, dict[str, str]], list[dict]],
    token: str,
    url: str = "https://api-metrika.yandex.net/management/v1/counters",
) -> DataFrame:
    """Single-shot authenticated REST source (S8 family, OAuth variant):
    ``transport(url, headers) -> list[dict]`` is injectable like every
    other adapter here, so offline tests (and air-gapped runs) stub it.
    Mirrors rest_to_dataframe's driver-side fetch — counter lists are
    dim-sized."""
    rows = transport(url, oauth_headers(token))
    return spark.createDataFrame(
        [(r.get("id"), r.get("name"), r.get("site")) for r in rows],
        "counter_id long, name string, site string",
    )
