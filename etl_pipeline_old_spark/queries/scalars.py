"""Scalar-function queries (SURVEY.md §2.9, F1-F22) + structural null ops
(P3/P11) + semi-structured access (S3/F19), each with a DuckDB oracle.

The testdata has no Cyrillic/ragged/CRLF cells (those paths are covered by
unit fixtures in tests/test_functions.py); here each scalar runs over the
documents/events/part tables so the driver gate hash-checks its semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..functions import classify as C
from ..functions import datetimes as D
from ..functions import nulls as N
from ..functions import strings as S
from ..registry import register

# ---------------------------------------------------------------------------
# strings
# ---------------------------------------------------------------------------


@register(
    "f1_short_name",
    oracle="""
    SELECT doc_id,
           CASE WHEN len(string_split(text, ' ')) >= 2
                THEN split_part(text, ' ', 1) || ' ' || split_part(text, ' ', 2)
                ELSE text END AS short_name
    FROM documents
    """,
    doc="F1: first-2-token short name (ref: create_scripts_dataset.ipynb:95-99).",
)
def f1_short_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", S.short_name("text", delim=" ").alias("short_name"))


@register(
    "f4_strip_trailing_token",
    oracle="""
    WITH src AS (
      SELECT doc_id, source || '_' || lang AS path,
             CASE WHEN lang <> 'en' THEN lang END AS username
      FROM documents)
    SELECT doc_id,
           CASE WHEN path IS NULL THEN NULL
                WHEN username IS NOT NULL
                     AND lower(list_extract(string_split(path,'_'), len(string_split(path,'_'))))
                         = lower(username)
                THEN array_to_string(
                       list_slice(string_split(path,'_'), 1, len(string_split(path,'_')) - 1), '_')
                ELSE path END AS storage_name
    FROM src
    """,
    doc="F4: drop trailing _token when it equals the username, null-safe "
    "(ref: create_projectsync_dataset.ipynb:175-194 extract_file_storage_name).",
)
def f4_strip_trailing_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    src = d.select(
        "doc_id",
        F.concat_ws("_", "source", "lang").alias("path"),
        F.when(F.col("lang") != "en", F.col("lang")).alias("username"),
    )
    return src.select(
        "doc_id", S.strip_trailing_token("path", "username").alias("storage_name")
    )


@register(
    "f7_regex_prefix_strip",
    oracle="SELECT doc_id, regexp_replace(text, '^the ', '') AS stripped FROM documents",
    doc="F7: regex prefix strip (ref: create_gitlab_dataset.ipynb:84 "
    "'^plugins/revit/').",
)
def f7_regex_prefix_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", S.regex_prefix_strip("text", "^the ").alias("stripped"))


@register(
    "f8_crlf_clean",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(text || chr(13) || chr(10) || lang, '[\r\n]', ' ', 'g') AS cleaned
    FROM documents
    """,
    doc="F8: CR/LF → space in string cells (ref: fetch_gsheet_instructions.py:46). "
    "CRLF injected since testdata is clean.",
)
def f8_crlf_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    dirty = F.concat(F.col("text"), F.lit("\r\n"), F.col("lang"))
    return d.select("doc_id", S.clean_crlf(dirty).alias("cleaned"))


@register(
    "f9_first_token",
    oracle="SELECT doc_id, split_part(text, ' ', 1) AS head FROM documents",
    doc="F9: first-token truncation (ref: fetch_gsheet_instructions.py:48-49).",
)
def f9_first_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", S.first_token("text").alias("head"))


@register(
    "f12_format_n0",
    oracle="SELECT doc_id, printf('%d.0', n_chars) AS sheet_value FROM documents",
    doc="F12: int → 'N.0' string for sheet writeback "
    "(ref: create_gitlab_dataset.ipynb:95).",
)
def f12_format_n0(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", S.format_n0("n_chars").alias("sheet_value"))


# ---------------------------------------------------------------------------
# classifiers
# ---------------------------------------------------------------------------

# ordered rules — literal order IS priority order, as in the reference's
# np.select / dict-iteration classifiers (create_projectsync_dataset.ipynb:135-160)
OBJECT_RULES = [
    ("spark", "Движок"),
    ("vector", "Векторы"),
    ("join", "Соединения"),
    ("window", "Окна"),
]
OBJECT_DEFAULT = "Неизвестные проекты"


@register(
    "f2_ordered_classifier",
    oracle="""
    SELECT doc_id,
           CASE WHEN COALESCE(contains(text, 'spark'), FALSE) THEN 'Движок'
                WHEN COALESCE(contains(text, 'vector'), FALSE) THEN 'Векторы'
                WHEN COALESCE(contains(text, 'join'), FALSE) THEN 'Соединения'
                WHEN COALESCE(contains(text, 'window'), FALSE) THEN 'Окна'
                ELSE 'Неизвестные проекты' END AS object_name
    FROM documents
    """,
    doc="F2/F5: np.select-style ordered first-match-wins classifier "
    "(ref: create_projectsync_dataset.ipynb:135-160).",
)
def f2_ordered_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        C.classify_contains("text", OBJECT_RULES, OBJECT_DEFAULT).alias("object_name"),
    )


@register(
    "f6_stage_classifier",
    oracle="""
    SELECT doc_id,
           CASE WHEN COALESCE(ends_with(text, 'dup'), FALSE)    THEN 'Дубликат'
                WHEN COALESCE(contains(text, 'stream'), FALSE)  THEN 'Поток'
                WHEN COALESCE(ends_with(text, 'part'), FALSE)   THEN 'Партиция'
                ELSE 'НД' END AS stage
    FROM documents
    """,
    doc="F6: mixed contains|endswith ordered stage classifier "
    "(ref: create_projectsync_dataset.ipynb:252-299 get_project_stage).",
)
def f6_stage_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    rules = [
        (C.MODE_ENDSWITH, "dup", "Дубликат"),
        (C.MODE_CONTAINS, "stream", "Поток"),
        (C.MODE_ENDSWITH, "part", "Партиция"),
    ]
    return d.select("doc_id", C.classify("text", rules, "НД").alias("stage"))


@register(
    "f3_flag_from_regex",
    oracle="""
    SELECT doc_id,
           COALESCE(regexp_matches(text, 'stream|batch', 'i'), FALSE)::INT AS is_detached
    FROM documents
    """,
    doc="F3: regex-contains → int 0/1 flag "
    "(ref: create_projectsync_dataset.ipynb:165 is_detached).",
)
def f3_flag_from_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", C.flag_from_regex("text", "(?i)stream|batch").alias("is_detached"))


@register(
    "f17_status_from_null",
    oracle="""
    SELECT c.c_custkey,
           CASE WHEN o.last_order IS NULL THEN 'В работе' ELSE 'Закрыта' END AS status
    FROM customer c
    LEFT JOIN (SELECT o_custkey, max(o_orderdate) AS last_order
               FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    """,
    doc="F17: status from null-test on a join-introduced null "
    "(ref: create_yougile_dataset.ipynb:233-237).",
)
def f17_status_from_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.max("o_orderdate").alias("last_order"))
    )
    joined = c.join(o, c["c_custkey"] == o["o_custkey"], "left")
    return joined.select(
        "c_custkey", C.status_from_null("last_order", "В работе", "Закрыта").alias("status")
    )


# ---------------------------------------------------------------------------
# nulls / coercion / imputation
# ---------------------------------------------------------------------------


@register(
    "f11_numeric_coercion",
    oracle="""
    SELECT event_id,
           try_cast(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           try_cast(event_type AS BIGINT) AS bad_num
    FROM events
    """,
    doc="F11: pd.to_numeric(errors='coerce') → try_cast; null on malformed "
    "(ref: create_scripts_dataset.ipynb:198-199).",
)
def f11_numeric_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        N.numeric_coerce(F.get_json_object("props", "$.k")).alias("k_num"),
        N.numeric_coerce("event_type").alias("bad_num"),
    )


@register(
    "f13_impute_by_dtype",
    oracle="""
    SELECT p.p_partkey,
           COALESCE(l.flag, 'Нет данных') AS flag,
           round(COALESCE(l.sum_qty, 0), 2) AS sum_qty
    FROM part p
    LEFT JOIN (SELECT l_partkey, max(l_returnflag) AS flag, sum(l_quantity) AS sum_qty
               FROM lineitem GROUP BY l_partkey) l
      ON p.p_partkey = l.l_partkey
    """,
    doc="F13: mid-pipeline per-dtype null imputation — strings→'Нет данных', "
    "numerics→0, after the join introduces nulls "
    "(ref: create_scripts_dataset.ipynb:215-223).",
)
def f13_impute_by_dtype(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.max("l_returnflag").alias("flag"), F.sum("l_quantity").alias("sum_qty"))
    )
    joined = p.join(l, p["p_partkey"] == l["l_partkey"], "left").select(
        "p_partkey", "flag", "sum_qty"
    )
    imputed = N.impute_by_dtype(joined)
    return imputed.select("p_partkey", "flag", F.round("sum_qty", 2).alias("sum_qty"))


@register(
    "p11_drop_all_null_columns",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal,
           CASE WHEN s_acctbal > 0 THEN s_nationkey END AS maybe_nation
    FROM supplier
    """,
    doc="P11: dropna(axis=1, how='all') — data-dependent column pruning via "
    "one count-aggregate pass (ref: fetch_asterisk_devices.py:25).",
)
def p11_drop_all_null_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    with_nulls = s.select(
        "s_suppkey",
        "s_name",
        "s_acctbal",
        F.when(F.col("s_acctbal") > 0, F.col("s_nationkey")).alias("maybe_nation"),
        F.lit(None).cast("string").alias("all_null_col"),
    )
    return N.drop_all_null_columns(with_nulls)


@register(
    "p3_drop_prefix_columns",
    oracle="SELECT doc_id, text, lang, n_chars FROM documents",
    doc="P3: drop all columns whose name starts with a prefix "
    "(ref: create_yougile_dataset.ipynb:68 ~columns.str.startswith('raw')).",
)
def p3_drop_prefix_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumnRenamed("source", "raw_source")
    return d.select([c for c in d.columns if not c.startswith("raw")])


# ---------------------------------------------------------------------------
# datetime
# ---------------------------------------------------------------------------


@register(
    "f14_epoch_ms_iso",
    oracle="""
    SELECT event_id,
           epoch_ms(ts) AS ms,
           strftime(make_timestamp(epoch_ms(ts) * 1000), '%Y-%m-%dT%H:%M:%SZ') AS iso
    FROM events
    """,
    doc="F14: epoch-ms → ISO-8601 'Z' string (ref: "
    "fetch_yougile_programming.py:160-191 to_iso).",
)
def f14_epoch_ms_iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts"))
    return ev.select("event_id", ms.alias("ms"), D.epoch_ms_to_iso(ms).alias("iso"))


@register(
    "f15_to_timestamp_coerce",
    oracle="""
    WITH src AS (
      SELECT event_id,
             CASE WHEN event_type = 'error' THEN 'Нет данных'
                  ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS raw
      FROM events)
    SELECT event_id, try_strptime(raw, '%Y-%m-%d %H:%M:%S') AS parsed FROM src
    """,
    doc="F15: pd.to_datetime(errors='coerce') with sentinel values → "
    "try_to_timestamp (ref: create_yougile_dataset.ipynb:228-231).",
)
def f15_to_timestamp_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    raw = F.when(F.col("event_type") == "error", F.lit("Нет данных")).otherwise(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    return ev.select(
        "event_id", D.to_timestamp_coerce(raw, "yyyy-MM-dd HH:mm:ss").alias("parsed")
    )


@register(
    "f16_tz_convert",
    oracle="""
    SELECT event_id,
           strftime(ts + INTERVAL 5 HOUR, '%Y-%m-%d %H:%M:%S') AS local_ts
    FROM events
    """,
    doc="F16: UTC → Asia/Yekaterinburg wall time (UTC+5, no DST since 2016; "
    "events are 2024 so the fixed interval is exact) "
    "(ref: create_yougile_dataset.ipynb:168-175).",
)
def f16_tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format(D.utc_to_local("ts"), "yyyy-MM-dd HH:mm:ss").alias("local_ts"),
    )


@register(
    "f21_clip_frac_hours",
    oracle="""
    SELECT event_id,
           round(least(greatest(value, 20.0), 80.0), 2) AS clipped,
           round(hour(ts) + minute(ts) / 60.0, 4) AS frac_hour
    FROM events
    """,
    doc="F21: np.clip + fractional hours (ref: create_yougile_dataset.ipynb:196-220).",
)
def f21_clip_frac_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(D.clip("value", 20.0, 80.0), 2).alias("clipped"),
        F.round(D.fractional_hour("ts"), 4).alias("frac_hour"),
    )


@register(
    "f22_round",
    oracle="SELECT event_id, round(sqrt(value), 2) AS rounded FROM events",
    doc="F22: round(x, 2) (ref: create_yougile_dataset.ipynb:223).",
)
def f22_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", F.round(F.sqrt("value"), 2).alias("rounded"))


# ---------------------------------------------------------------------------
# semi-structured (S3/F19)
# ---------------------------------------------------------------------------


@register(
    "f19_json_field_extract",
    oracle="""
    SELECT event_id,
           try_cast(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CASE (try_cast(json_extract_string(props, '$.k') AS BIGINT) % 7)
                WHEN 0 THEN 'Новая' WHEN 1 THEN 'В работе' WHEN 2 THEN 'Ревью'
                WHEN 3 THEN 'Тестирование' WHEN 4 THEN 'Готова' WHEN 5 THEN 'Отменена'
                ELSE 'Архив' END AS state_name
    FROM events
    """,
    doc="F19: nested JSON field extraction + literal-map state lookup "
    "(ref: fetch_yougile_programming.py:62-126 sticker stateId → 7-state map).",
)
def f19_json_field_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    k = F.element_at(parsed, F.lit("k"))
    state_names = ["Новая", "В работе", "Ревью", "Тестирование", "Готова", "Отменена", "Архив"]
    state_map = F.create_map(*[x for i, name in enumerate(state_names) for x in (F.lit(i), F.lit(name))])
    return ev.select(
        "event_id",
        k.alias("k_val"),
        F.element_at(state_map, (k % 7).cast("int")).alias("state_name"),
    )


# F5: the projectsync section classifier's distinguishing shape — TWO ordered
# substring rule maps, and WHICH map applies is selected by ANOTHER column's
# value (object class), first match wins, default "НД"
# (create_projectsync_dataset.ipynb:204-242 get_project_solution: the
# "Кортрос" class probes the latin section_map_kortros, every other class
# the cyrillic section_map_rus). Rules deliberately overlap across AND
# within maps so both the per-class selection and the in-map priority are
# value-checked: '1-URGENT' matches rule 1 of map A ('URGENT'→АР) but rule
# 1 of map B is '1-'→ВК, so a wrong class pick or a reordered map flips
# the label and fails the hash.
F5_KORTROS_RULES = [("URGENT", "АР"), ("HIGH", "КР"), ("1-", "П"), ("LOW", "СС")]
F5_RUS_RULES = [("1-", "ВК"), ("HIGH", "АИ"), ("MEDIUM", "ОВ"), ("SPECIFIED", "ТС")]
F5_DEFAULT = "НД"


@register(
    "f5_section_classifier",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           CASE WHEN o_orderstatus = 'F' THEN
             CASE WHEN COALESCE(contains(o_orderpriority, 'URGENT'), FALSE) THEN 'АР'
                  WHEN COALESCE(contains(o_orderpriority, 'HIGH'), FALSE)   THEN 'КР'
                  WHEN COALESCE(contains(o_orderpriority, '1-'), FALSE)     THEN 'П'
                  WHEN COALESCE(contains(o_orderpriority, 'LOW'), FALSE)    THEN 'СС'
                  ELSE 'НД' END
           ELSE
             CASE WHEN COALESCE(contains(o_orderpriority, '1-'), FALSE)        THEN 'ВК'
                  WHEN COALESCE(contains(o_orderpriority, 'HIGH'), FALSE)      THEN 'АИ'
                  WHEN COALESCE(contains(o_orderpriority, 'MEDIUM'), FALSE)    THEN 'ОВ'
                  WHEN COALESCE(contains(o_orderpriority, 'SPECIFIED'), FALSE) THEN 'ТС'
                  ELSE 'НД' END
           END AS section
    FROM orders
    """,
    doc="F5: class-selected dual ordered rule map — the rule LIST applied "
    "to each row is chosen by the object-class column, then first-match-"
    "wins within that list, default 'НД' "
    "(ref: create_projectsync_dataset.ipynb:204-242). Stays one codegen'd "
    "nested-CASE expression: no join, no UDF, class dispatch is free.",
)
def f5_section_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    section = F.when(
        F.col("o_orderstatus") == "F",
        C.classify_contains("o_orderpriority", F5_KORTROS_RULES, F5_DEFAULT),
    ).otherwise(C.classify_contains("o_orderpriority", F5_RUS_RULES, F5_DEFAULT))
    return o.select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", section.alias("section")
    )
