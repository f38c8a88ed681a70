"""Measured scaling curves for the heavy corpus AND similarity operators.

Inflates the sf0.1 documents table k-fold (distinct ids, texts perturbed
with a per-copy token so content stays unique) and the embeddings table
k-fold (distinct ids, per-copy-shifted coordinates), then times each
operator at k = 1, 4, 16. Near-linear growth is the evidence that the
operator's shuffle shape scales with input size — not with pairs — which
is the 100 TB design claim in SCALE.md.

Run: python tools/scale_probe.py   (writes SCALE_PROBE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_pipeline_old_spark.catalog import load_table  # noqa: E402
from etl_pipeline_old_spark.operators import dedup as DD  # noqa: E402
from etl_pipeline_old_spark.session import get_spark  # noqa: E402

FACTORS = (1, 4, 16)
ID_OFFSET = 10_000_000


def inflate(d, k: int):
    copies = [
        d.select(
            (F.col("doc_id") + i * ID_OFFSET).alias("doc_id"),
            F.concat_ws(" ", "text", F.lit(f"copytoken{i}")).alias("text"),
        )
        for i in range(k)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def probe_ops(d):
    return {
        "exact_dedup_groups": lambda x: DD.exact_dedup_groups(x, "text", "doc_id"),
        "line_level_dedup": lambda x: DD.line_level_dedup(x, "text", "doc_id"),
        "simhash": lambda x: DD.simhash(x, "text", "doc_id"),
        "minhash_lsh_dedup": lambda x: DD.minhash_lsh_dedup(x, "text", "doc_id"),
    }


def inflate_emb(e, k: int):
    copies = [
        e.select(
            (F.col("vec_id") + i * ID_OFFSET).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, off=float(i) * 1e-4: x.cast("double") + F.lit(off),
            ).alias("embedding"),
        )
        for i in range(k)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


QIDS = [0, 1, 2, 3, 4]


def probe_emb_ops():
    from etl_pipeline_old_spark.operators import similarity as SIM
    from etl_pipeline_old_spark.queries.extras7 import _jl_project

    return {
        "jl_projection": lambda x: _jl_project(x),
        "lsh_index_build": lambda x: SIM.hyperplane_lsh_buckets(
            x, n_bits=5, n_tables=6
        ),
        "ann_lsh_topk": lambda x: SIM.lsh_topk(x, QIDS, 10, n_bits=5, n_tables=6),
        "ann_brute_force_topk": lambda x: SIM.brute_force_topk(x, QIDS, 10),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = base.count()

    # warm the JVM/codegen for every op shape so k=1 is not a cold-start
    # measurement (first-use codegen compile dominated it otherwise)
    for op in probe_ops(base).values():
        op(base).count()

    def run_family(base_df, ops, inflate_fn):
        rows = []
        for k in FACTORS:
            d = (base_df if k == 1 else inflate_fn(base_df, k)).persist()
            d.count()  # materialize the inflated input outside the timings
            for name, op in ops.items():
                t0 = time.perf_counter()
                op(d).count()
                rows.append((name, k, round(time.perf_counter() - t0, 2)))
                print(rows[-1], flush=True)
            d.unpersist()
        return rows

    def table(rows):
        by_op: dict[str, dict[int, float]] = {}
        for name, k, secs in rows:
            by_op.setdefault(name, {})[k] = secs
        out = [
            "| operator | "
            + " | ".join(f"k={k}" for k in FACTORS)
            + " | t(k16)/t(k1) |",
            "|---|" + "---|" * (len(FACTORS) + 1),
        ]
        for name, secs in by_op.items():
            ratio = round(secs[FACTORS[-1]] / secs[FACTORS[0]], 1)
            out.append(
                f"| {name} | "
                + " | ".join(f"{secs[k]:.2f}s" for k in FACTORS)
                + f" | {ratio}x |"
            )
        return out

    doc_rows = run_family(base, probe_ops(base), inflate)

    # --- dedup algorithm race (r5 verdict #6): PPJoin vs MinHash-LSH vs
    # bucketed bronze on the SAME n-doubling corpus. Inflation creates
    # k-sized near-dup clusters (copies share almost all shingles), so
    # output pairs grow ~k²·n/2 for every EXACT algorithm — the race
    # measures candidate discipline, not output size.
    from etl_pipeline_old_spark.queries.dedup_text import (  # noqa: E402
        BRONZE_CAP,
        write_bronze_bands,
    )
    from etl_pipeline_old_spark.workdir import table_name  # noqa: E402

    def ppjoin_run(spark, d) -> int:
        return DD.ppjoin_dedup(d, "text", "doc_id", 3).count()

    def lsh_run(spark, d) -> int:
        return DD.minhash_lsh_dedup(d, "text", "doc_id", threshold=0.5).count()

    def bronze_state() -> dict:
        return {"table": None, "sh": None}

    _bronze = bronze_state()

    def bronze_build_and_join(spark, d) -> int:
        """Full bronze cycle: band, write the bucketed index, co-located
        candidate self-join, verify — the one-shot cost that amortizes."""
        sh = DD.shingle_sets(d, "text", "doc_id", 3).persist()
        sh.count()
        banded = DD.lsh_bands(DD.minhash_signatures(sh))
        t = table_name("bronze_scale_probe")
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        write_bronze_bands(spark, banded, t)
        cand = DD.banded_candidate_pairs(
            spark.table(t), bucket_cap=BRONZE_CAP, self_join_hint="merge"
        )
        n = (
            DD.jaccard_pairs(sh, candidates=cand)
            .filter(F.col("jaccard") >= 0.5)
            .count()
        )
        # keep index + shingles for the delta-probe measurement below
        _bronze["table"], _bronze["sh"] = t, sh
        return n

    def bronze_delta_probe(spark, d) -> int:
        """Amortized cost: a ~10% delta probes the ALREADY-BUILT index —
        the recurring-refresh price once the one-shot build is sunk."""
        t, sh = _bronze["table"], _bronze["sh"]
        delta = d.filter(F.col("doc_id") % 10 == 0)
        dsh = DD.shingle_sets(delta, "text", "doc_id", 3).persist()
        dsh.count()
        delta_b = DD.lsh_bands(DD.minhash_signatures(dsh)).select(
            F.col("id").alias("id_a"), "band", "bkey"
        )
        base_b = spark.table(t).select(F.col("id").alias("id_b"), "band", "bkey")
        # the index holds the delta docs too (built from the full corpus),
        # so a delta-delta pair surfaces in both orientations — canonicalize
        # with least/greatest before distinct so this row's pair count is
        # comparable with the other race algorithms (ADVICE r6)
        cand = (
            delta_b.hint("merge")
            .join(base_b, ["band", "bkey"])
            .filter(F.col("id_a") != F.col("id_b"))
            .select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .distinct()
        )
        # verify against the full-corpus shingle cache (covers both sides;
        # the delta's shingles are a subset of it)
        n = (
            DD.jaccard_pairs(sh, candidates=cand)
            .filter(F.col("jaccard") >= 0.5)
            .count()
        )
        dsh.unpersist()
        return n

    def bronze_cleanup(spark):
        if _bronze["table"]:
            spark.sql(f"DROP TABLE IF EXISTS {_bronze['table']}")
        if _bronze["sh"] is not None:
            _bronze["sh"].unpersist()
        _bronze["table"], _bronze["sh"] = None, None

    DEDUP_FACTORS = (1, 2, 4)
    race_algos = (
        ("ppjoin_exact_t0.7", ppjoin_run),
        ("minhash_lsh_t0.5", lsh_run),
        ("bronze_build+join_t0.5", bronze_build_and_join),
        ("bronze_delta_probe(10%)", bronze_delta_probe),
    )
    # warm every algo shape once on the base corpus
    for _, fn in race_algos:
        fn(spark, base)
    bronze_cleanup(spark)

    race_rows: list[tuple[str, int, int, float]] = []
    for k in DEDUP_FACTORS:
        d = (base if k == 1 else inflate(base, k)).persist()
        n_docs = d.count()
        for name, fn in race_algos:
            t0 = time.perf_counter()
            n_pairs = fn(spark, d)
            race_rows.append(
                (name, n_docs, n_pairs, round(time.perf_counter() - t0, 2))
            )
            print(race_rows[-1], flush=True)
        bronze_cleanup(spark)
        d.unpersist()

    # PPJoin on the adversarial identical-doc cluster: every pair is a
    # TRUE duplicate, so the exact output itself is n²/2 — measured at
    # small n to exhibit the inherent quadratic (no algorithm choice can
    # fix an output lower bound; the capped-LSH star contract can).
    adv_pp_rows: list[tuple[int, int, float]] = []
    boiler_text = (
        "terms of service all rights reserved by the operator contact us at "
        "the address below privacy policy cookie notice legal disclaimer "
        "copyright twenty twenty four all trademarks acknowledged hereby"
    )
    for n in (250, 500, 1000):
        d = (
            spark.range(n)
            .select(F.col("id").alias("doc_id"), F.lit(boiler_text).alias("text"))
            .persist()
        )
        d.count()
        t0 = time.perf_counter()
        n_pairs = DD.ppjoin_dedup(d, "text", "doc_id", 3).count()
        adv_pp_rows.append((n, n_pairs, round(time.perf_counter() - t0, 2)))
        print(("ppjoin_adversarial", *adv_pp_rows[-1]), flush=True)
        d.unpersist()

    def race_narrative() -> str:
        """Crossover prose derived from THIS run's race_rows — never
        hardcoded literals next to regenerated tables (r6 review: a rerun
        under different load must not leave prose contradicting its own
        tables)."""
        secs = {(name, n): s for name, n, _, s in race_rows}
        sizes = sorted({n for _, n, _, _ in race_rows})
        n1, n4 = sizes[0], sizes[-1]

        def g(name: str, n: int) -> float:
            return secs[(name, n)]

        def growth(name: str) -> float:
            return g(name, n4) / g(name, n1)

        pp, lsh = "ppjoin_exact_t0.7", "minhash_lsh_t0.5"
        bb, dp = "bronze_build+join_t0.5", "bronze_delta_probe(10%)"
        return (
            f"Reading the crossover (this run): MinHash-LSH vs exact PPJoin "
            f"at n={n1} is {g(lsh, n1):.1f}s vs {g(pp, n1):.1f}s, and their "
            f"growth over the same {n4 // n1}x input is {growth(lsh):.1f}x "
            f"vs {growth(pp):.1f}x — PPJoin's candidate set grows with "
            "rare-shingle collisions, and the inflation's near-dup clusters "
            "feed exactly those, so exactness costs progressively more as "
            "duplication rises; PPJoin is the right tool only when "
            "missed-pair probability must be zero. The bronze build runs "
            f"{g(bb, n4):.1f}s vs the in-memory LSH's {g(lsh, n4):.1f}s at "
            f"n={n4} while ALSO leaving the on-disk index, i.e. the index "
            "is ~free if you were running LSH anyway. The delta probe is "
            f"the cheapest row at every size and grows slowest "
            f"({growth(dp):.1f}x): at these test sizes fixed per-job "
            "overhead (banding + verify session cost) still dominates its "
            "wall — the at-scale separation is structural, not "
            "extrapolated from these walls: the plan-locks "
            "(tests/test_storage_layout.py) prove the probe shuffles ONLY "
            "the delta banding while every full algorithm re-shuffles the "
            "whole corpus, so at 100 TB with a 0.1% daily delta the probe "
            "moves ~1000x fewer bytes. PPJoin's growth stays far from n² "
            "on this organic corpus (ratios track the cluster growth); see "
            "the adversarial table below for its inherent limit."
        )

    def race_table() -> list[str]:
        by_algo: dict[str, list[tuple[int, int, float]]] = {}
        for name, n_docs, n_pairs, secs in race_rows:
            by_algo.setdefault(name, []).append((n_docs, n_pairs, secs))
        sizes = sorted({n for _, n, _, _ in race_rows})
        out = [
            "| algorithm | "
            + " | ".join(f"n={n}" for n in sizes)
            + " | t(n4)/t(n1) | pairs @ n4 |",
            "|---|" + "---|" * (len(sizes) + 2),
        ]
        for name, runs in by_algo.items():
            secs = {n: s for n, _, s in runs}
            pairs = {n: p for n, p, _ in runs}
            ratio = round(secs[sizes[-1]] / secs[sizes[0]], 1)
            out.append(
                f"| {name} | "
                + " | ".join(f"{secs[n]:.2f}s" for n in sizes)
                + f" | {ratio}x | {pairs[sizes[-1]]} |"
            )
        return out

    adv_pp_table = [
        "| n identical docs | output pairs | wall |",
        "|---|---|---|",
        *[
            f"| {n} | {p} (= n(n-1)/2) | {s:.2f}s |"
            for n, p, s in adv_pp_rows
        ],
    ]

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_emb = emb.count()
    # warm on a PERSISTED input: the timed runs read from a persisted copy,
    # and the InMemoryScan shape compiles its own codegen (first measured
    # lsh_index_build otherwise paid ~3s of compile at k=1)
    warm = emb.persist()
    warm.count()
    for op in probe_emb_ops().values():  # warm, same reason as above
        op(warm).count()
    warm.unpersist()
    emb_rows = run_family(emb, probe_emb_ops(), inflate_emb)

    # adversarial boilerplate cluster (r3 verdict #6): N IDENTICAL docs all
    # land in ONE LSH bucket per band. Uncapped, the bucket self-join emits
    # N²/2 pairs (measured on small N to exhibit the quadratic ratio);
    # with bucket_cap the same fixture scales ~linearly to 10⁵ docs.
    boiler = (
        "terms of service all rights reserved by the operator contact us at "
        "the address below privacy policy cookie notice legal disclaimer "
        "copyright twenty twenty four all trademarks acknowledged hereby"
    )

    def boiler_docs(n: int):
        return spark.range(n).select(
            F.col("id").alias("doc_id"), F.lit(boiler).alias("text")
        )

    adv_rows: list[tuple[str, int, float]] = []
    for n, cap in ((500, None), (1000, None), (25_000, 64), (100_000, 64)):
        d = boiler_docs(n).persist()
        d.count()
        t0 = time.perf_counter()
        n_pairs = DD.minhash_lsh_dedup(
            d, "text", "doc_id", threshold=0.5, bucket_cap=cap
        ).count()
        adv_rows.append(
            (f"{'uncapped' if cap is None else f'cap={cap}'} n={n}", n_pairs,
             round(time.perf_counter() - t0, 2))
        )
        print(adv_rows[-1], flush=True)
        d.unpersist()

    adv_table = [
        "| fixture | verified pairs | wall |",
        "|---|---|---|",
        *[f"| {name} | {pairs} | {secs:.2f}s |" for name, pairs, secs in adv_rows],
    ]

    # adversarial ANN hot bucket (r4 verdict #5 — parity with the dedup
    # fixture above): N IDENTICAL vectors hash into ONE (tbl, bucket), so
    # every query probing that bucket scores N candidates uncapped. With
    # bucket_cap the probe keeps the cap lowest-id members — per-query cost
    # becomes independent of the hot bucket's size (bounded recall
    # tradeoff; operators/similarity.py:bucketed_probe truncation path).
    from etl_pipeline_old_spark.operators import similarity as SIM

    DIM, N_Q, ANN_CAP = 16, 512, 64
    vec = F.array(*[F.lit(1.0 + 0.01 * i) for i in range(DIM)])

    def hot_index(n: int):
        return spark.range(n).select(
            F.col("id").alias("neighbor_id"),
            vec.alias("__cv"),
            F.lit(0).alias("tbl"),
            F.lit("hot").alias("bucket"),
        )

    probe_queries = spark.range(N_Q).select(
        F.col("id").alias("query_id"),
        vec.alias("__qv"),
        F.lit(0).alias("tbl"),
        F.lit("hot").alias("bucket"),
    )
    ann_rows: list[tuple[str, int, float]] = []
    for n, cap in (
        (25_000, None),
        (100_000, None),
        (25_000, ANN_CAP),
        (100_000, ANN_CAP),
    ):
        idx = hot_index(n).persist()
        idx.count()
        t0 = time.perf_counter()
        n_hits = SIM.bucketed_probe(idx, probe_queries, k=10, bucket_cap=cap).count()
        ann_rows.append(
            (f"{'uncapped' if cap is None else f'cap={cap}'} n={n}", n_hits,
             round(time.perf_counter() - t0, 2))
        )
        print(ann_rows[-1], flush=True)
        idx.unpersist()

    ann_table = [
        "| fixture | top-k hits | wall |",
        "|---|---|---|",
        *[f"| {name} | {hits} | {secs:.2f}s |" for name, hits, secs in ann_rows],
    ]

    lines = [
        "# SCALE_PROBE — measured scaling of the heavy corpus + similarity operators",
        "",
        f"Input: sf0.1 documents ({n_base} docs) / embeddings ({n_emb} "
        "vectors) inflated k-fold with distinct ids and per-copy-perturbed "
        "content (see tools/scale_probe.py). local[32]; wall seconds per "
        "operator call.",
        "",
        "## Corpus operators",
        "",
        *table(doc_rows),
        "",
        "## Dedup algorithm race: PPJoin vs MinHash-LSH vs bucketed bronze",
        "",
        "Same n-doubling corpus for all algorithms (sf0.1 documents "
        "inflated 1/2/4-fold; copies are near-dups of their originals, so "
        "every exact algorithm's OUTPUT grows ~k² per cluster — the race "
        "measures candidate discipline and shuffle shape, not output "
        "size). `bronze_build+join` is the one-shot index-build cost; "
        "`bronze_delta_probe` is the recurring cost of a 10% delta "
        "probing the already-built index — the amortized refresh price.",
        "",
        *race_table(),
        "",
        race_narrative(),
        "",
        "### PPJoin on the adversarial identical-doc cluster",
        "",
        *adv_pp_table,
        "",
        "Every pair of identical docs IS a true duplicate at any "
        "threshold, so an EXACT algorithm's output — and therefore its "
        "cost — has an n²/2 LOWER BOUND here; no candidate filter can "
        "help (all prefixes collide, all lengths match). Doubling n "
        "quadruples the measured output above, exactly as predicted. "
        "Escaping the bound requires changing the output contract: the "
        "capped-LSH star fallback (next table) emits cap²/2 + (n-cap) "
        "edges per bucket, preserving connectivity for downstream "
        "components at linear cost — the 100 TB answer for boilerplate "
        "clusters.",
        "",
        "## Similarity / embedding operators (fixed 5-query probe set)",
        "",
        *table(emb_rows),
        "",
        "## Adversarial boilerplate cluster (minhash_lsh_dedup bucket_cap)",
        "",
        *adv_table,
        "",
        "N identical docs collide into one LSH bucket per band. Uncapped, "
        "doubling N quadruples the verified-pair count (the N²/2 bucket "
        "self-join — AQE can "
        "split the skewed partition but cannot shrink the join's output). "
        "With bucket_cap, over-cap buckets emit cap²/2 all-pairs edges + "
        "one star edge per extra member (connectivity to the bucket "
        "representative preserved for downstream components), so 100× the "
        "docs costs ~100× — linear, and 100k identical docs complete in "
        "seconds where uncapped would need ~5·10⁹ verify pairs.",
        "",
        "## Adversarial ANN hot bucket (bucketed_probe bucket_cap)",
        "",
        *ann_table,
        "",
        f"{N_Q} queries probe one bucket holding N identical vectors. "
        "Uncapped, each query scores all N members — Q·N pairs; with "
        "bucket_cap the probe truncates every "
        f"bucket to its {ANN_CAP} lowest-id members BEFORE the join, so "
        "per-query cost is flat in the hot bucket's size — the capped "
        "100k row should cost ≈ the capped 25k row. Unlike the dedup "
        "star fallback there is no connectivity to preserve: a probe "
        "just loses redundant near-identical candidates (bounded recall "
        "tradeoff the caller opts into).",
        "",
        "A 16x input with ratio ≈ 16x (or below — fixed per-job overhead "
        "amortizes) is linear scaling: the operator shuffles O(input), "
        "never O(pairs). Super-linear growth here would flag a quadratic "
        "candidate explosion before it ever reached a cluster. The ANN "
        "probes are additionally expected to stay well below the input "
        "growth factor: their per-query cost follows bucket sizes "
        "(lsh_topk) or a single streamed pass (brute force), with the "
        "fixed query set held constant.",
        "",
    ]
    # preserve foreign marker blocks (each owned by a standalone probe
    # that needs its own process/session shape, so they can't run here)
    _FOREIGN_MARKS = [
        ("<!-- memory-pressure:start -->", "<!-- memory-pressure:end -->"),
        ("<!-- warc-throughput:start -->", "<!-- warc-throughput:end -->"),
    ]
    try:
        old = open("SCALE_PROBE.md", encoding="utf-8").read()
        for mark_start, mark_end in _FOREIGN_MARKS:
            if mark_start in old and mark_end in old:
                lines.append(
                    old[old.index(mark_start) : old.index(mark_end) + len(mark_end)]
                )
                lines.append("")
    except OSError:
        pass
    with open("SCALE_PROBE.md", "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    print("SCALE_PROBE.md written")
    spark.stop()


if __name__ == "__main__":
    main()
