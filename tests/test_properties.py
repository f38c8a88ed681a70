"""Hypothesis property tests (SURVEY.md §5.3): the Column-expression
implementations must agree with straightforward pure-Python reference
implementations on arbitrary (incl. Cyrillic/whitespace-weird) inputs."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pipeline_old_spark.functions import classify as C
from etl_pipeline_old_spark.functions import strings as S

# words with Cyrillic, Latin, digits; joined with single underscores/spaces
token = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)


def py_short_name(name: str | None, delim: str = "_") -> str | None:
    # the reference's semantics (create_scripts_dataset.ipynb:95-99)
    if name is None:
        return None
    parts = name.split(delim)
    return delim.join(parts[:2]) if len(parts) >= 2 else name


def py_strip_trailing(path: str | None, user: str | None, delim: str = "_") -> str | None:
    # create_projectsync_dataset.ipynb:175-194
    if path is None:
        return None
    if user is None:
        return path
    parts = path.split(delim)
    if parts and parts[-1].lower() == user.lower():
        return delim.join(parts[:-1])
    return path


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.one_of(st.none(), st.lists(token, min_size=1, max_size=5).map("_".join)),
                min_size=1, max_size=30))
def test_short_name_matches_python_reference(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = [r["s"] for r in df.select(S.short_name("name").alias("s")).collect()]
    assert got == [py_short_name(n) for n in names]


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.lists(token, min_size=1, max_size=4).map("_".join)),
            st.one_of(st.none(), token),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_strip_trailing_matches_python_reference(spark, rows):
    df = spark.createDataFrame(rows, "path string, user string")
    got = [r["s"] for r in df.select(S.strip_trailing_token("path", "user").alias("s")).collect()]
    assert got == [py_strip_trailing(p, u) for p, u in rows]


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.one_of(st.none(), st.text(min_size=0, max_size=40)), min_size=1, max_size=30),
       st.permutations(["АТОМ", "ДОУ", "ИКП"]))
def test_classifier_first_match_wins_property(spark, texts, rule_order):
    rules = [(p, f"label_{p}") for p in rule_order]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["c"] for r in df.select(C.classify_contains("t", rules, "НД").alias("c")).collect()]

    def py_classify(t):
        if t is None:
            return "НД"
        for pat, label in rules:
            if pat in t:
                return label
        return "НД"

    assert got == [py_classify(t) for t in texts]


# printable-ASCII + the whitespace the NORM regex targets: both engines'
# \s and lower() agree on this range unconditionally (Unicode case/space
# mapping edge cases — ß, İ, NBSP — are out of the oracle contract: the
# testdata is ASCII and both NORM implementations are ASCII-\s regexes)
ascii_ws = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=50,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.one_of(ascii_ws, st.text(" \t\n\r", max_size=6)), min_size=1, max_size=20))
def test_md5_long_matches_duckdb(spark, texts):
    """The cross-engine hash underpinning dedup/sampling/split oracles:
    Spark md5_long(s) must equal DuckDB's MD5_LONG_SQL for arbitrary
    strings, or every hash-keyed oracle in the registry is coincidence."""
    import duckdb
    from pyspark.sql import functions as F

    from etl_pipeline_old_spark.operators.dedup import MD5_LONG_SQL, md5_long

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, s string")
    got = {r.i: r.h for r in df.select("i", md5_long(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    sql = "SELECT " + MD5_LONG_SQL.format(x="?")
    for i, t in enumerate(texts):
        assert got[i] == con.execute(sql, [t]).fetchone()[0], repr(t)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.one_of(ascii_ws, st.text(" \t\n\r", max_size=6)), min_size=1, max_size=20))
def test_normalize_text_matches_duckdb(spark, texts):
    """normalize_text (Spark) vs NORMALIZE_SQL (DuckDB) — the shared
    canonical form every text-dedup oracle starts from."""
    import duckdb
    from pyspark.sql import functions as F

    from etl_pipeline_old_spark.operators.dedup import NORMALIZE_SQL, normalize_text

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, s string")
    got = {r.i: r.n for r in df.select("i", normalize_text(F.col("s")).alias("n")).collect()}
    con = duckdb.connect()
    sql = "SELECT " + NORMALIZE_SQL.format(x="?")
    for i, t in enumerate(texts):
        assert got[i] == con.execute(sql, [t]).fetchone()[0], repr(t)


def test_join_left_cardinality_with_duplicate_dim_keys(spark):
    # property boundary: the enrich contract assumes unique-keyed dims;
    # a duplicate dim key MUST fan out (documenting, not hiding, the edge)
    from etl_pipeline_old_spark.operators import joins as J

    fact = spark.createDataFrame([(1,), (2,)], "k long")
    dim = spark.createDataFrame([(1, "a"), (1, "b")], "k long, v string")
    out = J.enrich(fact, dim, "k", ["v"])
    assert out.count() == 3  # row 1 fans out to 2 — caller's contract to dedupe


# ---------------------------------------------------------------------------
# line-level dedup vs pure-Python reference
# ---------------------------------------------------------------------------

_word = st.sampled_from(["aa", "bb", "cc", "dd"])  # tiny vocab -> collisions


def py_line_dedup(texts: list[str], L: int = 3):
    """Reference: global first-occurrence span dedup + ordered reassembly."""
    seen: set[str] = set()
    out = []
    for i, t in enumerate(texts):
        toks = re.sub(r"\s+", " ", t).strip().lower().split(" ")
        lines = [" ".join(toks[j : j + L]) for j in range(0, len(toks), L)]
        kept = []
        for line in lines:
            if line not in seen:
                seen.add(line)
                kept.append(line)
        out.append((i, len(lines), len(kept), "\n".join(kept)))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(_word, min_size=1, max_size=10).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_line_level_dedup_matches_python_reference(spark, texts):
    from etl_pipeline_old_spark.operators.dedup import line_level_dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_lines_total"], r["n_lines_kept"], r["text_deduped"])
        for r in line_level_dedup(df, "text", "doc_id").collect()
    }
    for i, total, kept, text in py_line_dedup(texts):
        assert got[i] == (total, kept, text), f"doc {i}"


# ---------------------------------------------------------------------------
# Misra-Gries shard-summary algebra vs pure-Python reference
# ---------------------------------------------------------------------------


def py_mg_summary(keys: list[str], k: int) -> dict[str, int]:
    """Closed-form MG summary: counts truncated at the (k+1)-th largest
    (ties broken by key, matching the query's ORDER BY c DESC, key)."""
    from collections import Counter

    c = Counter(keys)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    t = ranked[k][1] if len(ranked) > k else 0
    return {key: n - t for key, n in c.items() if n - t > 0}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 31), st.sampled_from("abcdefgh")),
        min_size=1,
        max_size=200,
    )
)
def test_mg_shard_summary_guarantees(spark, items):
    """For arbitrary shard assignments: per-shard truncation + sum-merge
    must (a) under-estimate, (b) have deficit <= sum of shard bounds, and
    (c) retain every key whose global count exceeds N/K."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    K = 4
    df = spark.createDataFrame(items, "pid int, key string")
    c = df.groupBy("pid", "key").agg(F.count("*").alias("c"))
    thr = (
        c.withColumn(
            "rn", F.row_number().over(W.partitionBy("pid").orderBy(F.desc("c"), "key"))
        )
        .filter(F.col("rn") == K + 1)
        .select("pid", F.col("c").alias("t"))
    )
    merged = {
        r["key"]: r["est"]
        for r in (
            c.join(thr, "pid", "left")
            .withColumn(
                "e", F.greatest(F.col("c") - F.coalesce("t", F.lit(0)), F.lit(0))
            )
            .filter(F.col("e") > 0)
            .groupBy("key")
            .agg(F.sum("e").alias("est"))
            .collect()
        )
    }
    # reference: per-shard python MG summaries, summed
    ref: dict[str, int] = {}
    shards: dict[int, list[str]] = {}
    for pid, key in items:
        shards.setdefault(pid, []).append(key)
    for keys in shards.values():
        for key, est in py_mg_summary(keys, K).items():
            ref[key] = ref.get(key, 0) + est
    assert merged == ref
    # and the MG guarantees against global exact counts
    from collections import Counter

    exact = Counter(k for _, k in items)
    n = len(items)
    for key, cnt in exact.items():
        est = merged.get(key, 0)
        assert est <= cnt
        # sum of per-shard deficits <= sum N_p/(K+1) = N/(K+1)
        assert (cnt - est) * (K + 1) <= n
        if cnt * K > n:
            assert est > 0, f"heavy key {key} lost"


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["A", "B", "C"]),
                  st.one_of(st.none(), st.text(min_size=0, max_size=40))),
        min_size=1,
        max_size=30,
    ),
    st.permutations(["АТОМ", "ДОУ", "ИКП"]),
    st.permutations(["ATOM", "ДОУ", "K01"]),
)
def test_f5_class_selected_map_property(spark, rows, order_a, order_b):
    """F5 (create_projectsync_dataset.ipynb:204-242): the rule MAP is chosen
    by the class column, then first-match-wins WITHIN the chosen map, default
    'НД' — checked against a python reference under arbitrary orderings of
    BOTH maps (map order is priority order; maps share the 'ДОУ' pattern
    with different labels, so a wrong class pick is also caught)."""
    rules_a = [(p, f"a_{p}") for p in order_a]
    rules_b = [(p, f"b_{p}") for p in order_b]
    df = spark.createDataFrame(rows, "cls string, t string")
    from pyspark.sql import functions as F

    expr = F.when(
        F.col("cls") == "A", C.classify_contains("t", rules_a, "НД")
    ).otherwise(C.classify_contains("t", rules_b, "НД"))
    got = [r["c"] for r in df.select(expr.alias("c")).collect()]

    def py_f5(cls, t):
        rules = rules_a if cls == "A" else rules_b
        if t is None:
            return "НД"
        for pat, label in rules:
            if pat in t:
                return label
        return "НД"

    assert got == [py_f5(cls, t) for cls, t in rows]


# --- PPJoin exactness: prefix-filtered join == brute-force all-pairs ------

def _py_shingles(text: str, n: int = 3) -> frozenset[str]:
    toks = re.sub(r"\s+", " ", text).strip().lower().split(" ")
    if len(toks) < n:
        return frozenset()
    return frozenset(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))


# tiny vocab + duplicated/perturbed docs force shared shingles, so real
# candidate pairs (incl. J right at the 0.7 boundary) actually occur
_vocab = st.sampled_from(["alpha", "beta", "gamma", "delta", "ех", "юг"])
_doc = st.lists(_vocab, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_doc, min_size=2, max_size=10), st.data())
def test_ppjoin_matches_brute_force(spark, docs, data):
    """ppjoin_dedup claims EXACT set-similarity self-join at rounded
    Jaccard >= 0.7 (true J >= 0.69995, the rounding-safe algebra): its
    prefix/length filters may only prune pairs that provably cannot
    qualify. Brute-force every pair in pure Python and require set
    equality — a missed pair breaks exactness, an extra pair breaks the
    threshold."""
    from etl_pipeline_old_spark.operators.dedup import ppjoin_dedup

    # duplicate one doc sometimes so exact-dup pairs (J=1) are frequent
    if len(docs) >= 2 and data.draw(st.booleans()):
        docs = docs + [docs[0]]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id: long, text: string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ppjoin_dedup(df, "text", "doc_id").collect()
    }

    want = {}
    sets = [_py_shingles(t) for t in docs]
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            if not sets[a] or not sets[b]:
                continue  # <3 tokens: no shingles, can never pair
            inter = len(sets[a] & sets[b])
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= 0.69995:  # round(J,4) >= 0.7 in both engines
                want[(a, b)] = j

    assert set(got) == set(want)
    for pair, j_spark in got.items():
        assert abs(j_spark - want[pair]) <= 0.00005  # round(J,4) vs true J


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_doc, min_size=2, max_size=10))
def test_minhash_lsh_sound_and_finds_exact_dups(spark, docs):
    """MinHash-LSH is probabilistic on NEAR-dups (banding may miss a pair)
    but two properties are exact and must always hold: (1) soundness —
    the verify stage recomputes true Jaccard, so every emitted pair
    really has round(J,4) >= 0.5; (2) identical documents have identical
    signatures, hence identical band keys, hence are ALWAYS candidates —
    an exact-duplicate pair can never be missed."""
    from etl_pipeline_old_spark.operators.dedup import minhash_lsh_dedup

    docs = docs + [docs[0]]  # guarantee at least one exact-dup pair
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id: long, text: string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_dedup(df, "text", "doc_id").collect()
    }

    sets = [_py_shingles(t) for t in docs]

    def true_j(a: int, b: int) -> float:
        inter = len(sets[a] & sets[b])
        return inter / (len(sets[a]) + len(sets[b]) - inter)

    # (1) soundness: no emitted pair below the rounding-safe bound
    for (a, b), j_spark in got.items():
        assert sets[a] and sets[b]
        assert true_j(a, b) >= 0.49995, (a, b)
        assert abs(j_spark - true_j(a, b)) <= 0.00005

    # (2) completeness on EXACT duplicates (same normalized shingle set)
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            if sets[a] and sets[a] == sets[b]:
                assert (a, b) in got, (a, b)
