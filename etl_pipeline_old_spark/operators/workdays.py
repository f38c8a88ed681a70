"""Business-day duration — the reference's one genuinely hard scalar
(SURVEY.md §2.10; ``workdays_diff`` at
/root/reference/datasets/create_yougile_dataset.ipynb:177-225).

Semantics replicated exactly (including quirks):

- timestamps are UTC, evaluated in Asia/Yekaterinburg wall time;
- workday is 08:00-17:00 (9 h); fractional hours use hour + minute/60
  (SECONDS ARE IGNORED — reference quirk);
- same-day case: clip(min(end,17) - max(start,8), 0, 9) / 9 on a working
  day, else 0;
- multi-day case: ``days_between = max(0, delta - 1)`` where ``delta`` is
  the count of working days in the half-open interval (start_date,
  end_date] (workalendar ``get_working_days_delta`` semantics). NOTE the
  reference subtracts 1 even when the end date is NOT a working day,
  undercounting such spans by one full day — we replicate this
  faithfully;
- plus fractional first/last day when those dates are working days;
- result rounded to 2 decimals; null if either endpoint is null.

Two implementations behind the same semantics:

1. ``workdays_diff_frame`` — pure DataFrame ops: a tiny calendar dimension
   with a cumulative working-day counter is broadcast-joined twice, so
   ``delta`` is two O(1) lookups. No explode, no Python in the hot path —
   this is the 100 TB path.
2. ``workdays_diff_udf`` — vectorized pandas UDF (Arrow-batched), the
   direct analog of the reference's row-wise apply. Kept as the
   exact-parity/readability variant and as the UDF extension-point demo.

Calendar: the reference uses ``workalendar.europe.Russia`` (not available
here); we embed the Russian statutory federal holidays PLUS the official
production calendars 2020-2026 (weekend-transferred holidays, decreed
bridge days, and decreed working Saturdays — public annual government
decrees, the same data workalendar encodes). Outside 2020-2026 the engine
falls back to the fixed-list + Sat/Sun rule. Local-time conversion uses
the fixed UTC+5 offset — exact for Yekaterinburg since 2016; the engine's
input data (events, 2024) is entirely in that range.
"""

from __future__ import annotations

from datetime import date, timedelta
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

LOCAL_UTC_OFFSET_HOURS = 5  # Asia/Yekaterinburg, fixed since 2016
WORKDAY_START = 8
WORKDAY_END = 17
WORK_HOURS = WORKDAY_END - WORKDAY_START

# Russian federal statutory holidays (month, day) — the fixed list
# workalendar.europe.Russia ships (New Year week, Christmas, Defender's Day,
# Women's Day, Labour Day, Victory Day, Russia Day, Unity Day).
RU_FIXED_HOLIDAYS: tuple[tuple[int, int], ...] = (
    (1, 1), (1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (1, 7), (1, 8),
    (2, 23), (3, 8), (5, 1), (5, 9), (6, 12), (11, 4),
)

# Official Russian production calendar, 2012-2026 (public annual government
# transfer decrees — the same data workalendar.europe.Russia encodes):
# weekday days off BEYOND the fixed federal list (weekend-transferred
# holidays and decreed bridge days), and the decreed WORKING Saturdays
# that pay for a bridge. Outside this window the engine falls back to the
# statutory automatic transfer rule (see _auto_transfer_days).
RU_EXTRA_NON_WORKING: dict[int, tuple[tuple[int, int], ...]] = {
    # decree 581/2011: Apr 28(Sat work)→Apr 30, May 5(Sat work)→May 7,
    # May 12(Sat work)→May 8, Jun 9(Sat work)→Jun 11, Dec 29(Sat work)→Dec 31;
    # statutory: Jan 7(Sat)→Jan 9
    2012: ((1, 9), (4, 30), (5, 7), (5, 8), (6, 11), (12, 31)),
    # decree 1048/2012: Jan 5→May 2, Jan 6→May 3, Feb 23→May 10
    2013: ((5, 2), (5, 3), (5, 10)),
    # decree 444/2013: Jan 4→May 2, Jan 5→Jun 13, Feb 23→Nov 3;
    # statutory: Mar 8(Sat)→Mar 10
    2014: ((3, 10), (5, 2), (6, 13), (11, 3)),
    # decree 860/2014: Jan 3→Jan 9, Jan 4→May 4;
    # statutory: Mar 8(Sun)→Mar 9, May 9(Sat)→May 11
    2015: ((1, 9), (3, 9), (5, 4), (5, 11)),
    # decree 1017/2015: Jan 2→May 3, Jan 3→Mar 7, Feb 20(Sat work)→Feb 22;
    # statutory: May 1(Sun)→May 2, Jun 12(Sun)→Jun 13
    2016: ((2, 22), (3, 7), (5, 2), (5, 3), (6, 13)),
    # decree 756/2016: Jan 1→Feb 24, Jan 7→May 8; statutory: Nov 4(Sat)→Nov 6
    2017: ((2, 24), (5, 8), (11, 6)),
    # decree 1250/2017: Jan 6→Mar 9, Jan 7→May 2, Apr 28(Sat work)→Apr 30,
    # Jun 9(Sat work)→Jun 11, Dec 29(Sat work)→Dec 31;
    # statutory: Nov 4(Sun)→Nov 5
    2018: ((3, 9), (4, 30), (5, 2), (6, 11), (11, 5), (12, 31)),
    # decree 1163/2018: Jan 5→May 2, Jan 6→May 3, Feb 23→May 10
    2019: ((5, 2), (5, 3), (5, 10)),
    # Feb 23→Feb 24, Mar 8→Mar 9, Jan 4→May 4, Jan 5→May 5, May 9→May 11
    2020: ((2, 24), (3, 9), (5, 4), (5, 5), (5, 11)),
    # Feb 20(Sat work)→Feb 22, May 1→May 3, May 9→May 10, Jun 12→Jun 14,
    # Jan 2→Nov 5, Jan 3→Dec 31
    2021: ((2, 22), (5, 3), (5, 10), (6, 14), (11, 5), (12, 31)),
    # Mar 5(Sat work)→Mar 7, May 1→May 2, Jan 1→May 3, Jan 2→May 10,
    # Jun 12→Jun 13
    2022: ((3, 7), (5, 2), (5, 3), (5, 10), (6, 13)),
    # Jan 1→Feb 24, Jan 8→May 8, Nov 4(Sat)→Nov 6
    2023: ((2, 24), (5, 8), (11, 6)),
    # Apr 27(Sat work)→Apr 29, Nov 2(Sat work)→Apr 30, Jan 6→May 10,
    # Dec 28(Sat work)→Dec 30, Jan 7→Dec 31
    2024: ((4, 29), (4, 30), (5, 10), (12, 30), (12, 31)),
    # Jan 4→May 2, Feb 23→May 8, Mar 8→Jun 13, Nov 1(Sat work)→Nov 3,
    # Jan 5→Dec 31
    2025: ((5, 2), (5, 8), (6, 13), (11, 3), (12, 31)),
    # Jan 3→Jan 9, Mar 8→Mar 9, May 9→May 11, Jan 4→Dec 31
    2026: ((1, 9), (3, 9), (5, 11), (12, 31)),
}
RU_WORKING_SATURDAYS: dict[int, tuple[tuple[int, int], ...]] = {
    2012: ((4, 28), (5, 5), (5, 12), (6, 9), (12, 29)),
    2016: ((2, 20),),
    2018: ((4, 28), (6, 9), (12, 29)),
    2021: ((2, 20),),
    2022: ((3, 5),),
    2024: ((4, 27), (11, 2), (12, 28)),
    2025: ((11, 1),),
}

# years with full production-calendar decree data embedded above
DECREE_YEAR_LO, DECREE_YEAR_HI = 2012, 2026


@lru_cache(maxsize=None)
def _auto_transfer_days(year: int) -> tuple[tuple[int, int], ...]:
    """Statutory fallback for years without embedded decree data: a fixed
    holiday falling on Sat/Sun transfers its day off to the next weekday
    that is not itself a holiday or an earlier transfer (TK RF art. 112
    default — what workalendar computes when no decree overrides it).
    Approximation: real years also had decreed bridge days / transfer
    targets (often moved into May) that only the annual decree defines."""
    fixed = {date(year, m, d) for m, d in RU_FIXED_HOLIDAYS}
    claimed: set[date] = set()
    for m, d in sorted(RU_FIXED_HOLIDAYS):
        h = date(year, m, d)
        if h.weekday() >= 5:
            c = h + timedelta(days=1)
            while c.weekday() >= 5 or c in fixed or c in claimed:
                c += timedelta(days=1)
            claimed.add(c)
    return tuple(sorted((c.month, c.day) for c in claimed))


def extra_non_working_days(year: int) -> tuple[tuple[int, int], ...]:
    """Weekday days off beyond the fixed federal list for ``year``: decree
    data inside [DECREE_YEAR_LO, DECREE_YEAR_HI], statutory auto-transfers
    outside it."""
    if DECREE_YEAR_LO <= year <= DECREE_YEAR_HI:
        return RU_EXTRA_NON_WORKING.get(year, ())
    return _auto_transfer_days(year)


def ru_non_working_weekdays(year_from: int, year_to: int) -> list[date]:
    """All dates that are days off despite falling Mon-Fri: the fixed
    federal holidays plus the production-calendar transfers/bridges (or
    statutory auto-transfers outside the decree window)."""
    out = []
    for y in range(year_from, year_to + 1):
        for m, d in RU_FIXED_HOLIDAYS + extra_non_working_days(y):
            dt = date(y, m, d)
            if dt.weekday() < 5:
                out.append(dt)
    return sorted(out)


def ru_working_saturdays(year_from: int, year_to: int) -> list[date]:
    return sorted(
        date(y, m, d)
        for y in range(year_from, year_to + 1)
        for m, d in RU_WORKING_SATURDAYS.get(y, ())
    )


def is_working_date(d: date) -> bool:
    md = (d.month, d.day)
    if md in RU_WORKING_SATURDAYS.get(d.year, ()):
        return True
    if d.weekday() >= 5:
        return False
    return md not in RU_FIXED_HOLIDAYS and md not in extra_non_working_days(d.year)


# ---------------------------------------------------------------------------
# option 2 (scale path): calendar dimension + broadcast lookups
# ---------------------------------------------------------------------------


CAL_LO = date(1990, 1, 1)
CAL_HI = date(2100, 12, 31)


@lru_cache(maxsize=4)
def _calendar_rows(start: date, end: date) -> tuple[tuple[date, bool, int], ...]:
    days = []
    cum = 0
    d = start
    while d <= end:
        w = is_working_date(d)
        cum += int(w)
        days.append((d, w, cum))
        d += timedelta(days=1)
    return tuple(days)


def calendar_dim(
    spark: SparkSession, start: date = CAL_LO, end: date = CAL_HI
) -> DataFrame:
    """Calendar dimension [start-1day, end] with ``cum_working`` = number of
    working days ≤ d. ``delta(a, b] = cum[b] - cum[a]``.

    Cached per SparkSession (persisted MEMORY_ONLY): the dim is static, so
    it is built at most once per session; every later workdays query
    broadcast-joins the in-memory relation directly. ``persist()`` is
    lazy, so plan construction still launches zero jobs
    (tests/test_workdays.py::test_frame_build_triggers_no_job).

    Built driver-side from :func:`_calendar_rows` (the same Python
    calendar the pandas-UDF twin uses — the two paths are
    equality-tested) and shipped through the ARROW ``createDataFrame``
    path: 40k (date, bool, int) rows are one Arrow batch, ~0.1 s. The
    r2-era JVM-side build (sequence-explode + exception broadcast-join +
    single-partition prefix-sum window) existed to dodge ~5 s of
    row-pickling in the pre-Arrow ``createDataFrame``; with Arrow
    conversion on (session default here) it was the slower path — its
    one-task explode+window materialization measured 3.0 s per session
    (r14), i.e. the dominant cost of the first workdays query. A FIXED
    range still means the operator never scans the fact table for
    bounds, keeping :func:`workdays_diff_frame` a pure lazy transform.
    """
    import pandas as pd

    # per-session memo, stored ON the session object so its lifetime (and the
    # persisted block's) is tied to the session, not to a module global that
    # could outlive a stopped session
    cache: dict = spark.__dict__.setdefault("_etl_calendar_dim_cache", {})
    cached = cache.get((start, end))
    if cached is not None:
        return cached
    req = (start, end)

    start = start - timedelta(days=1)  # need cum[] at the day before start
    pdf = pd.DataFrame(
        _calendar_rows(start, end), columns=["d", "is_working", "cum_working"]
    )
    # coalesce(1): createDataFrame slices into defaultParallelism tiny
    # partitions; every later broadcast build would collect 32 shards of a
    # 1 MB dim (measured +0.2 s per warm query) — one partition is right
    # for a broadcast dimension
    dim = (
        spark.createDataFrame(pdf, schema="d date, is_working boolean, cum_working int")
        .coalesce(1)
        .persist(StorageLevel.MEMORY_ONLY)
    )
    cache[req] = dim
    return dim


def _frac_hour(local_ts: Column) -> Column:
    # reference ignores seconds: hour + minute/60
    return F.hour(local_ts) + F.minute(local_ts) / 60.0


def workdays_diff_frame(
    df: DataFrame,
    start_col: str,
    end_col: str,
    out_col: str = "work_days_duration",
) -> DataFrame:
    """Append ``out_col`` = business-day span, pure DataFrame ops.

    Two broadcast joins against the calendar dim (one per endpoint date);
    everything else is codegen'd arithmetic. Requires the endpoints to be
    non-null-bounded — rows with null endpoints yield null.

    Supported date range: [CAL_LO, CAL_HI] (1990-2100, the fixed broadcast
    calendar). A non-null endpoint outside that range raises at execution
    time (fail loud) rather than silently yielding a null duration.
    """
    spark = df.sparkSession
    shift = F.expr(f"INTERVAL {LOCAL_UTC_OFFSET_HOURS} HOURS")
    s_loc = F.col(start_col) + shift
    e_loc = F.col(end_col) + shift

    # fixed-range calendar (no bounds scan of the fact table — building the
    # plan triggers NO Spark job; see tests/test_workdays.py)
    cal = calendar_dim(spark)

    w = df.withColumn("__s_loc", s_loc).withColumn("__e_loc", e_loc)
    w = w.withColumn("__s_d", F.to_date("__s_loc")).withColumn("__e_d", F.to_date("__e_loc"))

    # join the SAME broadcast frame twice (projection above the join, not
    # below it) so the two BroadcastExchanges canonicalize identically and
    # the second becomes a ReusedExchange — the dim subplan executes once
    c1, c2 = cal.alias("__cal_s"), cal.alias("__cal_e")
    w = (
        w.join(F.broadcast(c1), F.col("__s_d") == F.col("__cal_s.d"), "left")
        .join(F.broadcast(c2), F.col("__e_d") == F.col("__cal_e.d"), "left")
        .withColumn("__s_working", F.col("__cal_s.is_working"))
        .withColumn("__s_cum", F.col("__cal_s.cum_working"))
        .withColumn("__e_working", F.col("__cal_e.is_working"))
        .withColumn("__e_cum", F.col("__cal_e.cum_working"))
        .drop(F.col("__cal_s.d")).drop(F.col("__cal_s.is_working"))
        .drop(F.col("__cal_s.cum_working")).drop(F.col("__cal_e.d"))
        .drop(F.col("__cal_e.is_working")).drop(F.col("__cal_e.cum_working"))
    )

    s_frac = _frac_hour(F.col("__s_loc"))
    e_frac = _frac_hour(F.col("__e_loc"))
    clip9 = lambda c: F.least(F.greatest(c, F.lit(0.0)), F.lit(float(WORK_HOURS)))  # noqa: E731

    delta = F.col("__e_cum") - F.col("__s_cum")  # working days in (s_d, e_d]
    days_between = F.greatest(delta - 1, F.lit(0))
    first_part = F.when(
        F.col("__s_working"), clip9(F.lit(float(WORKDAY_END)) - F.greatest(s_frac, F.lit(float(WORKDAY_START)))) / WORK_HOURS
    ).otherwise(F.lit(0.0))
    last_part = F.when(
        F.col("__e_working"), clip9(F.least(e_frac, F.lit(float(WORKDAY_END))) - F.lit(float(WORKDAY_START))) / WORK_HOURS
    ).otherwise(F.lit(0.0))
    same_day = F.when(
        F.col("__s_working"),
        clip9(
            F.least(e_frac, F.lit(float(WORKDAY_END)))
            - F.greatest(s_frac, F.lit(float(WORKDAY_START)))
        )
        / WORK_HOURS,
    ).otherwise(F.lit(0.0))

    # fail loud outside the fixed calendar range: a non-null endpoint whose
    # calendar lookup missed means to_date(endpoint) ∉ [CAL_LO, CAL_HI]
    out_of_range = (F.col(start_col).isNotNull() & F.col("__s_cum").isNull()) | (
        F.col(end_col).isNotNull() & F.col("__e_cum").isNull()
    )
    total = F.when(
        out_of_range,
        F.raise_error(
            F.lit(
                f"workdays_diff_frame: endpoint date outside the supported "
                f"calendar range [{CAL_LO}, {CAL_HI}]"
            )
        ).cast("double"),
    ).when(
        F.col(start_col).isNull() | F.col(end_col).isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.round(
            F.when(F.col("__s_d") < F.col("__e_d"), days_between + first_part + last_part)
            .otherwise(same_day),
            2,
        )
    )
    return w.withColumn(out_col, total).drop(
        "__s_loc", "__e_loc", "__s_d", "__e_d",
        "__s_working", "__s_cum", "__e_working", "__e_cum",
    )


def calendar_oracle_cte(lo: str, hi: str) -> str:
    """DuckDB CTE computing the same calendar dim (for differential tests).

    ``lo``/``hi`` are SQL date expressions. Produces relation cal(d,
    is_working, cum_working).
    """
    holiday_pred = " OR ".join(
        f"(month(d) = {m} AND day(d) = {dd})" for m, dd in RU_FIXED_HOLIDAYS
    )
    # decree extras inside the decree window, statutory auto-transfers
    # outside it — same function the Python/Spark calendar uses, so the
    # differential stays exact over the whole supported range
    extra = [
        f"DATE '{y}-{m:02d}-{dd:02d}'"
        for y in range(CAL_LO.year, CAL_HI.year + 1)
        for m, dd in extra_non_working_days(y)
    ]
    work_sat = [
        f"DATE '{y}-{m:02d}-{dd:02d}'"
        for y, mds in sorted(RU_WORKING_SATURDAYS.items())
        for m, dd in mds
    ]
    working = (
        f"((dayofweek(d) NOT IN (0, 6) AND NOT ({holiday_pred})"
        f" AND d::DATE NOT IN ({', '.join(extra)}))"
        f" OR d::DATE IN ({', '.join(work_sat)}))"
    )
    return f"""
    cal AS (
      SELECT d::DATE AS d,
             {working} AS is_working,
             sum(CASE WHEN {working} THEN 1 ELSE 0 END) OVER (ORDER BY d) AS cum_working
      FROM (SELECT unnest(generate_series(({lo})::DATE - INTERVAL 1 DAY,
                                          ({hi})::DATE, INTERVAL 1 DAY)) AS d)
    )
    """


# ---------------------------------------------------------------------------
# option 1 (parity path): vectorized pandas UDF
# ---------------------------------------------------------------------------


def make_workdays_udf():
    """Pandas UDF (Arrow-batched) computing the identical semantics.

    The reference's ``apply(axis=1)`` becomes one vectorized numpy pass per
    Arrow batch — no per-row Python dispatch.
    """
    from pyspark.sql.types import DoubleType

    holidays = np.array(
        [np.datetime64(d) for d in ru_non_working_weekdays(1990, 2100)],
        dtype="datetime64[D]",
    )
    working_sats = np.array(
        [np.datetime64(d) for d in ru_working_saturdays(1990, 2100)],
        dtype="datetime64[D]",
    )

    @F.pandas_udf(DoubleType())
    def workdays_diff(start: pd.Series, end: pd.Series) -> pd.Series:
        s = pd.to_datetime(start) + pd.Timedelta(hours=LOCAL_UTC_OFFSET_HOURS)
        e = pd.to_datetime(end) + pd.Timedelta(hours=LOCAL_UTC_OFFSET_HOURS)
        mask = s.notna() & e.notna()

        # busday_count rejects NaT — substitute a dummy date for masked rows
        epoch = np.datetime64("2000-01-03")  # a Monday
        s_day = np.where(mask, s.values.astype("datetime64[D]"), epoch).astype("datetime64[D]")
        e_day = np.where(mask, e.values.astype("datetime64[D]"), epoch).astype("datetime64[D]")

        def working(days: np.ndarray) -> np.ndarray:
            dow = (days.astype("int64") + 3) % 7  # 1970-01-01 (day 0) is Thursday=3
            return ((dow < 5) & ~np.isin(days, holidays)) | np.isin(days, working_sats)

        s_working = working(s_day)
        e_working = working(e_day)
        # delta = working days in (s_day, e_day] = busday_count with our
        # calendar; np.busday_count counts [s, e) on working days, so shift
        # both endpoints by one day. Decreed working Saturdays can't be
        # expressed in a busday weekmask — add each (a handful of dates)
        # as an explicit membership correction on the half-open interval.
        one = np.timedelta64(1, "D")
        delta = np.busday_count(
            (s_day + one).astype("datetime64[D]"),
            (e_day + one).astype("datetime64[D]"),
            weekmask="1111100",
            holidays=holidays,
        )
        for ws in working_sats:
            delta = delta + ((s_day < ws) & (ws <= e_day)).astype(delta.dtype)
        days_between = np.maximum(delta - 1, 0)

        s_frac = s.dt.hour.to_numpy(float) + s.dt.minute.to_numpy(float) / 60.0
        e_frac = e.dt.hour.to_numpy(float) + e.dt.minute.to_numpy(float) / 60.0
        clip9 = lambda x: np.clip(x, 0.0, float(WORK_HOURS))  # noqa: E731

        first_part = np.where(
            s_working, clip9(WORKDAY_END - np.maximum(s_frac, WORKDAY_START)) / WORK_HOURS, 0.0
        )
        last_part = np.where(
            e_working, clip9(np.minimum(e_frac, WORKDAY_END) - WORKDAY_START) / WORK_HOURS, 0.0
        )
        same_day = np.where(
            s_working,
            clip9(np.minimum(e_frac, WORKDAY_END) - np.maximum(s_frac, WORKDAY_START))
            / WORK_HOURS,
            0.0,
        )
        total = np.where(s_day < e_day, days_between + first_part + last_part, same_day)
        out = pd.Series(np.round(total, 2), index=start.index, dtype="float64")
        out[~mask] = np.nan
        return out

    return workdays_diff
