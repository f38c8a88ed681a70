"""BPE train->apply: the distributed implementation must reproduce an
independently written in-memory reference (dict-based Sennrich-style
learner with left-to-right non-overlapping merge application), the
final tokenization must reconstruct every word losslessly, and the
corpus token count must strictly decrease each round. Value parity of
the full 64-round merge table vs the unrolled DuckDB oracle is covered
by test_oracle_parity."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from etl_pipeline_old_spark.queries.bpe import (
    _K_MERGES,
    _toks,
    _vocab_frame,
    corpus_bpe_train_apply,
)


def _reference_bpe(word_counts: dict[str, int], k: int):
    """Plain-Python BPE, written independently of the Spark path: tuples
    of tokens, Counter pair stats, explicit left-to-right merge walk."""
    state = {w: tuple(w) for w in word_counts}
    merges = []
    for _ in range(k):
        pairs: Counter = Counter()
        for w, toks in state.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += word_counts[w]
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, toks in state.items():
            out: list[str] = []
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            state[w] = tuple(out)
        tokens_after = sum(
            word_counts[w] * len(toks) for w, toks in state.items()
        )
        merges.append((a, b, c, tokens_after))
    return merges, state


def _word_counts(spark, sf_dir) -> dict[str, int]:
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    return {r["w"]: r["count"] for r in rows}


def test_spark_bpe_matches_python_reference(spark, sf_dir):
    got = sorted(
        corpus_bpe_train_apply(spark, sf_dir).collect(),
        key=lambda r: r["round"],
    )
    merges, _state = _reference_bpe(_word_counts(spark, sf_dir), _K_MERGES)
    assert len(got) == len(merges) == _K_MERGES
    for r, (a, b, c, tokens_after) in zip(got, merges):
        assert (r["left_tok"], r["right_tok"]) == (a, b)
        assert r["merged"] == a + b
        assert r["pair_count"] == c
        assert r["corpus_tokens_after"] == tokens_after
        assert r["apply_check"] == 1
    # every merge must make the corpus strictly smaller
    totals = [r["corpus_tokens_after"] for r in got]
    assert all(x > y for x, y in zip(totals, totals[1:]))


def test_final_vocab_reconstructs_words(spark, sf_dir):
    """Lossless tokenization: concatenating a word's final tokens yields
    the word — run AFTER training by replaying the learned merges onto
    the vocab frame through the same string algebra."""
    merges, state = _reference_bpe(_word_counts(spark, sf_dir), _K_MERGES)
    for w, toks in state.items():
        assert "".join(toks) == w
    vocab = _vocab_frame(spark, sf_dir)
    for a, b, _c, _t in merges:
        vocab = vocab.withColumn(
            "st",
            F.replace(F.col("st"), F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|")),
        )
    got = {
        r["word"]: tuple(r["t"])
        for r in vocab.select("word", _toks().alias("t")).collect()
    }
    assert got == state
