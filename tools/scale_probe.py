"""Measured scaling curves for the heavy corpus operators.

Inflates the sf0.1 documents table k-fold (distinct ids, texts perturbed
with a per-copy token so content stays unique) and times each operator at
k = 1, 4, 16. Near-linear growth is the evidence that the operator's
shuffle shape scales with input size — not with pairs — which is the
100 TB design claim in SCALE.md.

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

    rows = []
    for k in FACTORS:
        d = inflate(base, k).persist()
        n = d.count()  # materialize the inflated input outside the timings
        for name, op in probe_ops(d).items():
            t0 = time.perf_counter()
            op(d).count()
            rows.append((name, k, n, round(time.perf_counter() - t0, 2)))
            print(rows[-1], flush=True)
        d.unpersist()

    by_op: dict[str, list] = {}
    for name, k, n, secs in rows:
        by_op.setdefault(name, []).append((k, n, secs))
    lines = [
        "# SCALE_PROBE — measured scaling of the heavy corpus operators",
        "",
        f"Input: sf0.1 documents ({n_base} docs) inflated k-fold with "
        "distinct ids and per-copy-perturbed text (content unique; see "
        "tools/scale_probe.py). local[32]; wall seconds per operator call.",
        "",
        "| operator | " + " | ".join(f"k={k}" for k in FACTORS) + " | t(k16)/t(k1) |",
        "|---|" + "---|" * (len(FACTORS) + 1),
    ]
    for name, pts in by_op.items():
        secs = {k: s for k, _, s in pts}
        ratio = round(secs[FACTORS[-1]] / secs[FACTORS[0]], 1)
        lines.append(
            f"| {name} | "
            + " | ".join(f"{secs[k]:.2f}s" for k in FACTORS)
            + f" | {ratio}x |"
        )
    lines += [
        "",
        f"A 16x input with ratio ≈ 16x (or below — fixed per-job overhead "
        "amortizes) is linear scaling: the operator shuffles O(input), "
        "never O(pairs). Super-linear growth here would flag a quadratic "
        "candidate explosion before it ever reached a cluster.",
        "",
    ]
    with open("SCALE_PROBE.md", "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    print("SCALE_PROBE.md written")
    spark.stop()


if __name__ == "__main__":
    main()
