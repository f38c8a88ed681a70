"""Core relational operators from SURVEY.md §2.1/2.3/2.4/2.5/2.6/2.8,
re-expressed over the driver testdata star schema with DuckDB oracles.

Naming follows the SURVEY operator ids (s*, p*, j*, a*, u*, window_*).
Reference sites are cited per query; the testdata analogs follow
FIXTURES.md (plugin→part, ad_user→customer, logs→lineitem, cdr→events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import joins as J
from ..registry import register

# ---------------------------------------------------------------------------
# §2.1 scans
# ---------------------------------------------------------------------------


@register(
    "s11_parquet_scan_prune",
    oracle="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-07-01'
    """,
    doc="S2/S11: column-pruned, predicate-pushed parquet scan "
    "(ref: extractors/fetch_asterisk_cdr.py:43 usecols=['uniqueid']).",
)
def s11_parquet_scan_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Catalyst pushes both the projection and the filter into the parquet
    # scan — check .explain(): PushedFilters + 2-column ReadSchema.
    # Cutoff sits inside the testdata shipdate range (1995-01..2001-11) so the
    # oracle comparison exercises real rows, not a vacuous empty set.
    return li.select("l_orderkey", "l_extendedprice").filter(
        F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp_ntz")
    )


# ---------------------------------------------------------------------------
# §2.3 projections / filters
# ---------------------------------------------------------------------------


@register(
    "p1_project",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
    doc="P1: narrow projection before a join "
    "(ref: datasets/create_projectsync_dataset.ipynb:72-76).",
)
def p1_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@register(
    "p2_drop_columns",
    oracle="SELECT p_partkey, p_name, p_brand, p_type FROM part",
    doc="P2/P12: fixed-list column drop "
    "(ref: datasets/create_scripts_dataset.ipynb:101-107,145-151).",
)
def p2_drop_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").drop("p_size", "p_retailprice")


@register(
    "p4_rename",
    oracle="""
    SELECT c_custkey AS customer_id, c_name AS customer_name, c_acctbal AS balance
    FROM customer
    """,
    doc="P4: post-join renames incl. suffix repair "
    "(ref: datasets/create_gitlab_dataset.ipynb:149,159-166).",
)
def p4_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .withColumnRenamed("c_custkey", "customer_id")
        .withColumnRenamed("c_name", "customer_name")
        .withColumnRenamed("c_acctbal", "balance")
        .select("customer_id", "customer_name", "balance")
    )


BIM_SEGMENTS = ("AUTOMOBILE", "BUILDING")  # analog of the 17-name bim_users literal set


@register(
    "p5_isin_flag",
    oracle=f"""
    SELECT c_custkey, c_mktsegment IN {BIM_SEGMENTS} AS is_bim
    FROM customer
    """,
    doc="P5: set-membership flag (ref: create_scripts_dataset.ipynb:117-128 "
    "user_display_name.isin(bim_users) → is_bim).",
)
def p5_isin_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", F.col("c_mktsegment").isin(*BIM_SEGMENTS).alias("is_bim"))


@register(
    "p6_anti_membership",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    """,
    doc="P6: negated membership (ref: create_yougile_dataset.ipynb:79-82 new-row detection).",
)
def p6_anti_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority"
    )


@register(
    "p7_bool_split",
    oracle=f"""
    SELECT c_custkey, c_name FROM customer WHERE c_mktsegment IN {BIM_SEGMENTS}
    """,
    doc="P7: boolean-equality split into bim/non-bim halves "
    "(ref: create_scripts_dataset.ipynb:233-234).",
)
def p7_bool_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").withColumn(
        "is_bim", F.col("c_mktsegment").isin(*BIM_SEGMENTS)
    )
    return c.filter(F.col("is_bim")).select("c_custkey", "c_name")


@register(
    "p8_conjunctive_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
    WHERE l_discount >= 0.05 AND l_quantity < 25
    """,
    doc="P8: conjunctive predicate (ref: create_projectsync_dataset.ipynb:326-327).",
)
def p8_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_discount") >= 0.05) & (F.col("l_quantity") < 25)).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount"
    )


@register(
    "p9_prefix_filter",
    oracle="SELECT p_partkey, p_name FROM part WHERE starts_with(p_name, 'small')",
    doc="P9: string-prefix filter (ref: create_gitlab_dataset.ipynb:81 "
    "name.str.startswith('plugins/revit/')).",
)
def p9_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").startswith("small")).select("p_partkey", "p_name")


@register(
    "p10_regex_ci_contains",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE COALESCE(regexp_matches(text, 'spark|vector', 'i'), FALSE)
    """,
    doc="P10: case-insensitive regex contains, null-safe "
    "(ref: create_projectsync_dataset.ipynb:135-138 str.contains(case=False, na=False)).",
)
def p10_regex_ci_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pred = F.coalesce(F.col("text").rlike("(?i)spark|vector"), F.lit(False))
    return d.filter(pred).select("doc_id", "lang")


@register(
    "p13_exclusion_dedup",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey NOT IN (SELECT DISTINCT l_partkey FROM lineitem)
    """,
    doc="P13: drop rows whose id appears in another table's reference set "
    "(ref: fetch_yougile_programming.py:208-209 subtask removal) — "
    "explode→distinct→left_anti at scale.",
)
def p13_exclusion_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return J.anti(part, li, {"p_partkey": "l_partkey"}).select("p_partkey", "p_name")


# ---------------------------------------------------------------------------
# §2.4 joins
# ---------------------------------------------------------------------------


@register(
    "j1_dim_enrich",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="J1/J2: fact ⟕ dim broadcast enrich "
    "(ref: create_scripts_dataset.ipynb:161-166 monitoring⟕plugin).",
)
def j1_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return J.enrich(o, c, {"o_custkey": "c_custkey"}, ["c_name", "c_mktsegment"]).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "j3_multi_payload_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_brand, p.p_type
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    """,
    doc="J3/J6/J8: the reference merges the same dim twice to pull two "
    "columns (create_scripts_dataset.ipynb:176-188); one broadcast join "
    "pulls both.",
)
def j3_multi_payload_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return J.enrich(li, p, {"l_partkey": "p_partkey"}, ["p_brand", "p_type"]).select(
        "l_orderkey", "l_linenumber", "p_brand", "p_type"
    )


@register(
    "j4_cast_key_join",
    oracle="""
    SELECT c.c_custkey, n.n_name
    FROM customer c LEFT JOIN nation n ON CAST(c.c_nationkey AS BIGINT) = CAST(n.n_nationkey AS BIGINT)
    """,
    doc="J4: key normalized by cast before join "
    "(ref: create_scripts_dataset.ipynb:198-206 astype('Int64') then merge).",
)
def j4_cast_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").withColumn(
        "c_nationkey", F.col("c_nationkey").cast("long")
    )
    n = load_table(spark, sf_dir, "nation").withColumn(
        "n_nationkey", F.col("n_nationkey").cast("long")
    )
    return J.enrich(c, n, {"c_nationkey": "n_nationkey"}, ["n_name"]).select("c_custkey", "n_name")


@register(
    "j10_snowflake_chain",
    oracle="""
    SELECT n.n_name, count(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE lower(r.r_name) = lower('ASIA')
    GROUP BY n.n_name
    """,
    doc="J10+F20: 3-hop snowflake probe ending in a case-insensitive title "
    "filter (ref: fetch_yougile_programming.py:221-251 task→column→board→"
    "project → title match).",
)
def j10_snowflake_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    probed = J.snowflake_probe(
        c,
        [(n, "c_nationkey", "n_nationkey"), (r, "n_regionkey", "r_regionkey")],
        final_filter=F.lower(F.col("r_name")) == F.lower(F.lit("ASIA")),
    )
    return probed.groupBy("n_name").agg(F.count("*").alias("n_customers"))


@register(
    "j11_array_remap_join",
    oracle="""
    SELECT l.l_orderkey,
           string_agg(DISTINCT s.s_name, ', ' ORDER BY s.s_name) AS suppliers
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY l.l_orderkey
    """,
    doc="J11/F18: id-array → name lookup → joined string "
    "(ref: fetch_yougile_programming.py:195-200,262-267 assigned→realName→', '.join).",
)
def j11_array_remap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    # explode(assigned) ≡ the lineitem rows; broadcast-join the user dim,
    # then re-assemble the per-task string deterministically (sorted).
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"], "inner")
        .groupBy("l_orderkey")
        .agg(F.array_join(F.sort_array(F.collect_set("s_name")), ", ").alias("suppliers"))
    )


@register(
    "j12_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = customer.c_custkey)
    """,
    doc="J12: semi-join pushdown (ref: fetch_yougile_programming.py:221-234 "
    "fetch only dim rows whose ids occur).",
)
def j12_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return J.semi(c, o, {"c_custkey": "o_custkey"}).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# §2.5 aggregations, §2.6 windows, §2.8 set ops
# ---------------------------------------------------------------------------


@register(
    "a1_max_watermark",
    oracle="SELECT max(o_orderkey) AS max_key, max(o_orderdate) AS max_date FROM orders",
    doc="A1: MAX high-watermark for incremental pulls "
    "(ref: fetch_asterisk_cdr.py:44-46; create_projectsync_dataset.ipynb:424-428).",
)
def a1_max_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(F.max("o_orderkey").alias("max_key"), F.max("o_orderdate").alias("max_date"))


@register(
    "a2_count",
    oracle="SELECT count(*) AS cnt FROM lineitem",
    doc="A2: COUNT(*) (ref: create_scripts_dataset.ipynb:279 len(df)).",
)
def a2_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


@register(
    "a3_groupby_count",
    oracle="SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
    doc="A3: value histogram (ref: fetch_yougile_programming.py:337-346 status counts).",
)
def a3_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count("*").alias("cnt"))


@register(
    "a4_groupby_sum",
    oracle="""
    SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="A4: GROUP-BY SUM (ref: fetch_gitlab_lines.py:94-116 LOC per language). "
    "Partial (map-side) aggregation makes this a single shuffle of K rows.",
)
def a4_groupby_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("cnt")
    )


@register(
    "a5_argmax_maxby",
    oracle="""
    SELECT o_orderpriority,
           o_orderkey AS argmax_key,
           round(max(o_totalprice) OVER (PARTITION BY o_orderpriority), 2) AS max_price
    FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey DESC) = 1
    """,
    doc="A5: argmax per group via max_by with (value, key) tiebreak "
    "(ref: fetch_gitlab_lines.py:154 pick branch with max LOC).",
)
def a5_argmax_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias("argmax_key"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "a6_distinct",
    oracle="SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders",
    doc="A6: DISTINCT set construction (ref: fetch_yougile_programming.py:208,228-231).",
)
def a6_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus").distinct()


@register(
    "window_argmax",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal FROM customer
    QUALIFY row_number() OVER (
        PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) = 1
    """,
    doc="§2.6/O3: top-1 per group via window row_number with deterministic "
    "tiebreak — the window-idiomatic form of A5.",
)
def window_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


@register(
    "window_lag_gap",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS gap_us
    FROM events
    """,
    doc="§2.6: lag over an event stream — the windowed form of the "
    "incremental-dedup pattern (K2, fetch_asterisk_cdr.py:39-58). "
    "Exact microseconds in both engines (no truncation/rounding skew).",
)
def window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id", "user_id", (ts_us - F.lag(ts_us).over(w)).alias("gap_us")
    )


@register(
    "u1_union_by_name",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority <> '1-URGENT'
    """,
    doc="U1: UNION ALL by name (ref: fetch_asterisk_cdr.py:68 CSV append).",
)
def u1_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = o.filter(F.col("o_orderpriority") == "1-URGENT")
    lo = o.filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_orderpriority", "o_orderkey"
    )  # scrambled column order on purpose — unionByName realigns
    return hi.unionByName(lo)


@register(
    "u2_anti_join",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = customer.c_custkey)
    """,
    doc="U2: EXCEPT-semantics via anti-join (ref: create_yougile_dataset.ipynb:79-85 "
    "new-mapping-row detection).",
)
def u2_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return J.anti(c, o, {"c_custkey": "o_custkey"}).select("c_custkey")
