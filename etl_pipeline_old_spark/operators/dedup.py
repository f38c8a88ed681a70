"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (its only dedup is the monotone-key append,
fetch_asterisk_cdr.py:53); these are the north-star extensions from
BASELINE.json, designed partition-parallel:

- exact dedup: one hash-groupBy — a single shuffle of (hash, id);
- MinHash + LSH near-dedup: shingle → k-min signature → banded bucket
  join — candidate generation never compares all pairs, so cost scales
  with collisions, not O(n²);
- SimHash: per-token hashed bit votes folded into a 48-bit fingerprint —
  one narrow groupBy per doc;
- n-gram Jaccard verification: exact set-overlap join used both as the
  LSH verifier and as a standalone (quadratic-in-collisions) baseline.

All hashes derive from md5 (deterministic, engine-portable), so every
operator here is hash-checkable against a DuckDB oracle — including the
full MinHash+LSH pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# hashing / normalization primitives (portable across Spark and DuckDB)
# ---------------------------------------------------------------------------


def md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT.

    Portable: DuckDB computes the identical value via
    ``('0x' || substr(md5(x), 1, 15))::UBIGINT::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


MD5_LONG_SQL = "('0x' || substr(md5({x}), 1, 15))::UBIGINT::BIGINT"


def normalize_text(col: Column | str) -> Column:
    """Whitespace-collapse + trim + lowercase (dedup canonical form)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, "\\s+", " ")))


NORMALIZE_SQL = "lower(trim(regexp_replace({x}, '\\s+', ' ', 'g')))"


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles (empty array if fewer than n words)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, " ")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, text_col: str, id_col: str, normalized: bool = True
) -> DataFrame:
    """Group identical texts: (content_hash, keep_id = min id, n_copies).

    One map-side-combined shuffle on the 128-bit content hash — at 100 TB
    this is the cheapest possible exact dedup (no text comparison after
    hashing; md5 collisions are ignorable at these cardinalities).
    """
    key = normalize_text(text_col) if normalized else F.col(text_col)
    return (
        df.select(F.md5(key).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# shingle sets + exact Jaccard (verification / baseline)
# ---------------------------------------------------------------------------


def shingle_sets(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, shingle) pairs over normalized text — distinct by default
    (set semantics for Jaccard/MinHash); ``distinct=False`` keeps
    occurrence multiplicity (bag semantics, e.g. DSIR gram counts).

    PERF: explodes a cheap position sequence and assembles each shingle
    with ``element_at`` — NOT ``explode(word_shingles(...))``: Spark's
    generator re-evaluates the collection expression per emitted row, so
    exploding a transform-built array is O(tokens²) per document (~30×
    slower measured at sf0.1).
    """
    # IMPORTANT: tokenize in a SEPARATE projection — expressions that sit
    # in the same select as the explode get re-evaluated per emitted row.
    toks = df.select(
        F.col(id_col).alias("id"), F.split(normalize_text(text_col), " ").alias("__toks")
    )
    # guard: sequence(1, x) with x < 1 generates a DESCENDING sequence —
    # docs shorter than n must yield an empty array (row dropped by explode)
    positions = F.explode(
        F.when(
            F.size("__toks") >= n, F.sequence(F.lit(1), F.size("__toks") - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
    )
    with_pos = toks.select("id", "__toks", positions.alias("__i"))
    shingle = F.concat_ws(
        " ", *[F.element_at("__toks", F.col("__i") + j) for j in range(n)]
    )
    out = with_pos.select("id", shingle.alias("sh"))
    return out.distinct() if distinct else out


def jaccard_pairs(sh: DataFrame, candidates: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard over shingle sets: (id_a < id_b, jaccard).

    With ``candidates`` (id_a, id_b) only those pairs are intersected —
    candidates drive the join (broadcast when small), so verify cost is
    O(|candidates| · shingles/doc), NOT the all-pairs co-shingle blowup.
    Without, every co-shingle pair is scored — the quadratic-in-collisions
    baseline.

    SIZED candidates — carrying ``n_a``/``n_b`` (each side's shingle-set
    size, e.g. from the signature aggregate via
    ``minhash_signatures(with_count=True)`` → ``lsh_bands`` →
    ``banded_candidate_pairs``, or from PPJoin's ranked prefix relation) —
    skip the sizes aggregate AND both size joins entirely: the former
    re-shuffled the whole (id, sh) relation by id a second time for a
    count the candidate generator already had in hand (guide §2.3/§2.4).
    Same integer arithmetic, same rounding — values identical.

    CONTRACT for sized candidates: ``n_a``/``n_b`` MUST be the DISTINCT
    shingle counts of ``id_a``/``id_b`` computed over this very ``sh``
    relation (same n-gram width, same dedup). The fast path trusts them
    unconditionally — sizes computed over a different shingle relation
    (another n, a non-distinct bag) yield silently wrong jaccard values.
    """
    a = sh.select(F.col("id").alias("id_a"), "sh")
    b = sh.select(F.col("id").alias("id_b"), "sh")
    jac = lambda: F.round(  # noqa: E731
        F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4
    ).alias("jaccard")
    if candidates is not None and {"n_a", "n_b"} <= set(candidates.columns):
        inter = (
            candidates.join(a, "id_a")
            .join(b, ["id_b", "sh"])
            # n_a/n_b are functionally dependent on the ids — grouping by
            # them changes no group
            .groupBy("id_a", "id_b", "n_a", "n_b")
            .agg(F.count("*").alias("n_inter"))
        )
        return inter.select("id_a", "id_b", jac())
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    if candidates is not None:
        # candidates-first: attach a's shingles, keep only those b shares
        inter = (
            candidates.join(a, "id_a")
            .join(b, ["id_b", "sh"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_inter"))
        )
    else:
        inter = (
            a.join(b, "sh")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_inter"))
        )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .select("id_a", "id_b", jac())
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


import random as _random

MINHASH_PRIME = (1 << 61) - 1  # Mersenne prime


def minhash_seeds(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (a, b); a < 2^30 keeps
    a·h32 + b < 2^63 (no 64-bit overflow in either engine)."""
    rng = _random.Random(7)
    return [(rng.randrange(1, 1 << 30), rng.randrange(0, 1 << 30)) for _ in range(num_hashes)]


def md5_int32(col: Column) -> Column:
    """First 32 bits of md5 as BIGINT (portable; keeps products in range)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


MD5_INT32_SQL = "('0x' || substr(md5({x}), 1, 8))::UBIGINT::BIGINT"


def materialize_release(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize ``result`` and release the pipeline's persisted inputs.

    ``localCheckpoint(eager=True)`` computes the result once into executor
    blocks that the ContextCleaner frees as soon as the frame is
    unreferenced, whereas ``persist`` entries live in the CacheManager until
    explicitly unpersisted — so a long-lived session running many queries
    (the 136-query bench) would otherwise accumulate every intermediate
    cache. Call with the small RESULT of a pipeline and its large cached
    intermediates.
    """
    out = result.localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    return out


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 16, with_count: bool = False
) -> DataFrame:
    """k-min-value signature per id.

    One md5 per shingle, then k universal-hash derivations
    h_i = (a_i·h + b_i) mod (2^61-1) — 16x fewer digest computations than
    hashing per-seed, and exactly reproducible in the DuckDB oracle with
    the same integer constants.

    ``with_count=True`` adds ``n_sh`` (the id's shingle-set size) to the
    SAME aggregate — free map-side work here, whereas the downstream
    Jaccard verify would otherwise re-shuffle the whole (id, sh) relation
    by id a second time just to count it (guide §2.4: operations keyed
    the same way share one exchange). ``lsh_bands`` carries the column
    through to the candidate pairs, and :func:`jaccard_pairs` then skips
    its sizes aggregate + both size joins.
    """
    # project the digest into a real column FIRST: the k min-aggregates
    # then derive from one shared md5 per row by construction, instead of
    # each embedding its own md5(sh) call and relying on runtime
    # subexpression elimination to dedup k digests (r14; also keeps the
    # aggregate's expression tree k small terms instead of k digest trees)
    based = sh.select("id", md5_int32(F.col("sh")).alias("__h32"))
    aggs = [
        F.min((F.lit(a) * F.col("__h32") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_seeds(num_hashes))
    ]
    if with_count:
        aggs.append(F.count("*").alias("n_sh"))
    return based.groupBy("id").agg(*aggs)


def lsh_bands(sig: DataFrame, bands: int = 4, rows: int = 4) -> DataFrame:
    """(id, band, bkey) banding of a minhash signature.

    The band key is md5 over the band's row-slice, so a bucket row is two
    small columns regardless of ``rows`` — this is the relation a
    production deployment PERSISTS (bucketed by (band, bkey)) as the
    near-dup index that incremental probes join against.

    A signature carrying ``n_sh`` (minhash_signatures ``with_count=True``)
    keeps it: one extra BIGINT per band row, which lets the candidate
    self-join hand the verify both pair sizes for free (see
    :func:`jaccard_pairs`).
    """
    band_structs = [
        F.struct(
            F.lit(bid).alias("band"),
            F.md5(
                F.concat_ws(",", *[F.col(f"h{bid * rows + r}") for r in range(rows)])
            ).alias("bkey"),
        )
        for bid in range(bands)
    ]
    extra = ["n_sh"] if "n_sh" in sig.columns else []
    return sig.select(
        "id", *extra, F.explode(F.array(*band_structs)).alias("b")
    ).select("id", *extra, F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey"))


def lsh_candidate_pairs(
    sig: DataFrame,
    bands: int = 4,
    rows: int = 4,
    bucket_cap: int | None = None,
    reps: int = 1,
) -> DataFrame:
    """Band the signature (``bands`` × ``rows``) and bucket-join.

    Two docs become a candidate pair iff some band's row-slice matches
    exactly — the classic banding scheme: P(candidate) = 1-(1-j^rows)^bands.
    The join key is (band_id, md5(joined rows)), so the shuffle carries one
    short row per (doc, band).

    ``bucket_cap`` (r3 verdict #6) bounds the quadratic hazard: a
    degenerate bucket — 10⁵ boilerplate-identical docs — would emit ~10¹⁰
    pairs from the self-join before AQE's skew split can help (skew split
    rebalances partitions, it cannot shrink a join's OUTPUT). Buckets with
    ≤ cap members keep the exact all-pairs join; larger buckets fall back
    to a STAR on the bucket's min id (n-1 edges instead of n²/2), so every
    member still gets a candidate edge. Worst-case per-bucket output is
    max(cap², reps·n), i.e. linear in the bucket beyond the cap. The
    number of over-cap rows is logged, never silently swallowed.

    Connectivity caveat (ADVICE r4): candidate edges still face the
    downstream jaccard-≥-threshold VERIFY, so the star guarantees
    post-verify connectivity only for members that actually verify against
    the representative — true for the homogeneous degenerate buckets the
    cap targets (boilerplate-identical docs sharing an exact band slice),
    NOT for an over-cap bucket that mixes distinct near-dup clusters:
    there, members of a cluster not containing a representative lose
    their intra-cluster edges (a recall loss, not just redundancy).
    ``reps`` bounds that: each over-cap member stars against the bucket's
    ``reps`` smallest ids (ids are similarity-agnostic, so reps land in
    clusters ~proportionally to cluster size), and a cluster is missed
    only if it contains no representative — probability falling
    geometrically in ``reps`` — while per-bucket output stays linear
    (reps·(n-1) edges). ``reps=1`` is exact for homogeneous buckets and is
    the default; raise it when buckets may mix clusters.
    """
    banded = lsh_bands(sig, bands, rows)
    # the self-join consumes `banded` twice — persist so the signature
    # computation (and everything upstream) runs once
    banded = banded.persist()
    banded.count()  # eager: both self-join sides must HIT the cache, not race it
    pairs = banded_candidate_pairs(banded, bucket_cap=bucket_cap, reps=reps)
    # pairs are tiny (two ids/row) — materialize them and drop the banded
    # cache so it doesn't outlive this call in the session's CacheManager.
    return materialize_release(pairs, banded)


def banded_candidate_pairs(
    banded: DataFrame,
    bucket_cap: int | None = None,
    reps: int = 1,
    self_join_hint: str | None = None,
) -> DataFrame:
    """Candidate pairs from a (id, band, bkey) banded relation — the shared
    core of the in-memory path (:func:`lsh_candidate_pairs`, which persists
    the banding first) and the bucketed-bronze path
    (queries/dedup_text.py:dedup_bucketed_bronze, where ``banded`` is a
    scan of the (band, bkey)-bucketed table and ``self_join_hint='merge'``
    pins the co-located SortMergeJoin). The caller owns materialization of
    ``banded``; cap/reps semantics are documented on lsh_candidate_pairs.

    When ``banded`` is hash-partitioned by (band, bkey) — a bucketed scan —
    the cap's window and every self-join below reuse that partitioning:
    the whole candidate stage stays Exchange-free.

    A banded relation carrying ``n_sh`` yields SIZED pairs
    (id_a, id_b, n_a, n_b): the verify then needs no sizes aggregate or
    size joins (see :func:`jaccard_pairs`). The distinct() keys widen by
    the two BIGINTs, but n_sh is functionally dependent on the id, so the
    pair cardinality — and the dedup semantics — are unchanged.
    """
    sized = "n_sh" in banded.columns

    def _hinted(df: DataFrame) -> DataFrame:
        return df.hint(self_join_hint) if self_join_hint else df

    out_cols = ["id_a", "id_b", "n_a", "n_b"] if sized else ["id_a", "id_b"]
    a_cols = (
        [F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")]
        if sized
        else [F.col("id").alias("id_a")]
    )
    b_cols = (
        [F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")]
        if sized
        else [F.col("id").alias("id_b")]
    )
    if bucket_cap is not None:
        from pyspark.sql import Window as W

        w = W.partitionBy("band", "bkey")
        stats = banded.withColumn("__n", F.count("*").over(w)).withColumn(
            "__rep", F.min("id").over(w)
        )
        if sized:
            # the representative's n_sh, needed by the star arm below:
            # min_by over the same window — no extra exchange (ids are
            # unique within a bucket, so min_by(n_sh, id) is the n_sh of
            # __rep exactly)
            stats = stats.withColumn("__rep_n", F.min_by("n_sh", "id").over(w))
        small = stats.filter(F.col("__n") <= bucket_cap)
        big = stats.filter(F.col("__n") > bucket_cap)
        n_star = big.count()
        if n_star:
            import logging

            logging.getLogger(__name__).warning(
                "banded_candidate_pairs: %d (doc,band) rows in over-cap "
                "buckets (cap=%d) reduced to star edges on the bucket "
                "representative(s)",
                n_star,
                bucket_cap,
            )
        a = small.select(*a_cols, "band", "bkey")
        b = small.select(*b_cols, "band", "bkey")
        all_pairs = (
            _hinted(a)
            .join(b, ["band", "bkey"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select(*out_cols)
        )
        if reps <= 1:
            star_cols = [
                F.col("__rep").alias("id_a"),
                F.col("id").alias("id_b"),
            ] + ([F.col("__rep_n").alias("n_a"), F.col("n_sh").alias("n_b")] if sized else [])
            star = big.filter(F.col("id") != F.col("__rep")).select(*star_cols).select(*out_cols)
        else:
            # the bucket's `reps` smallest ids each star against every
            # member: reps·(n-1) edges, still linear per bucket
            ranked = big.withColumn(
                "__rk", F.row_number().over(w.orderBy("id"))
            )
            rep_rows = ranked.filter(F.col("__rk") <= reps).select(
                "band", "bkey", *a_cols
            )
            star = (
                _hinted(rep_rows)
                .join(
                    big.select("band", "bkey", *b_cols),
                    ["band", "bkey"],
                )
                .filter(F.col("id_a") < F.col("id_b"))
                .select(*out_cols)
            )
        return all_pairs.unionByName(star).distinct()
    a = banded.select(*a_cols, "band", "bkey")
    b = banded.select(*b_cols, "band", "bkey")
    return (
        _hinted(a)
        .join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(*out_cols)
        .distinct()
    )


def ppjoin_dedup(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int = 3
) -> DataFrame:
    """EXACT set-similarity self-join at shingle Jaccard >= 0.7 via prefix
    filtering (the PPJoin family, Xiao et al. 2008) — the deterministic
    alternative to MinHash-LSH: no missed-pair probability, same shuffle
    shape (element-keyed joins + one pair aggregate). Shingles are
    globally ordered rarest-first; each document exposes only its first
    ``len - ceil(t*len) + 1`` shingles; only documents sharing a PREFIX
    shingle become candidates. The verify accepts ROUNDED round(J,4) >=
    0.7, i.e. true J >= 0.69995, so both the prefix length
    ``(69995*n + 99999) DIV 100000`` and the length filter
    ``20000*min(n) >= 13999*max(n)`` use the rounding-safe 0.69995
    algebra (ADVICE r4): a pruned pair provably cannot pass the verify in
    either engine. Returns (id_a, id_b, jaccard). The integer constants
    encode t = 0.7 exactly; other thresholds need their own safe algebra.

    Scale shape: candidates grow with rare-shingle collisions, not n² —
    but on a degenerate cluster of IDENTICAL documents every pair IS a
    qualifying result, so the OUTPUT (hence any exact algorithm) is
    inherently quadratic there; the capped-LSH star contract
    (minhash_lsh_dedup bucket_cap) is the escape hatch, measured in
    tools/scale_probe.py.
    """
    from pyspark.sql.window import Window as W

    sh = shingle_sets(df, text_col, id_col, shingle_n).persist()
    sh.count()  # eager: df/size/prefix builds + both verify sides hit the cache
    # BOTH per-row statistics ride count-over-windows instead of
    # aggregate+join-back (guide §2.4 — operations keyed the same way
    # share one exchange): the document frequency `df` was a
    # groupBy(sh) aggregate joined back onto the shingle relation (TWO
    # sh-keyed exchanges of the corpus-sized relation), now ONE sh-keyed
    # window; `n_sh` shares the ranking window's id partitioning (r14).
    # Identical values: count of rows per sh / per id over the distinct
    # (id, sh) relation.
    ranked = (
        sh.withColumn("df", F.count("*").over(W.partitionBy("sh")))
        .withColumn("n_sh", F.count("*").over(W.partitionBy("id")))
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("id").orderBy("df", "sh")),
        )
    )
    pref = ranked.filter(
        F.col("rn") <= F.col("n_sh") - F.expr("(69995 * n_sh + 99999) DIV 100000") + 1
    ).select("id", "sh", "n_sh")
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.id") < F.col("b.id"))
            & (20000 * F.col("a.n_sh") >= 13999 * F.col("b.n_sh"))
            & (20000 * F.col("b.n_sh") >= 13999 * F.col("a.n_sh")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            # SIZED candidates: the ranked prefix relation already holds
            # each side's shingle count, so the verify skips its sizes
            # aggregate + joins (see jaccard_pairs; values identical)
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .distinct()
    )
    out = jaccard_pairs(sh, candidates=cand).filter(F.col("jaccard") >= 0.7)
    return materialize_release(out, sh)


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    rows: int = 4,
    threshold: float = 0.5,
    bucket_cap: int | None = None,
    reps: int = 1,
) -> DataFrame:
    """Full near-dup pipeline: shingle → sign → band → bucket-join →
    exact-Jaccard verify ≥ threshold. Returns (id_a, id_b, jaccard).

    The shingle relation feeds the signature AND both verify sides, so it
    is persisted (memory+disk) — at scale this is the standard
    materialize-the-shingles tradeoff: one scan of the corpus, reused
    thrice.  ``bucket_cap`` bounds degenerate LSH buckets (see
    lsh_candidate_pairs) — at 100 TB set it to a few hundred; ``reps``
    stars each over-cap member against that many representatives when
    capped buckets may mix distinct clusters.
    """
    # LAZY persist (r14): the banding materialization below evaluates the
    # signature, which scans sh and fills this cache in passing — a
    # dedicated sh.count() job would only add a full extra pass. The
    # verify's two sh references run strictly AFTER banded.count(), so
    # they hit a fully-populated cache (the cache-race hazard only exists
    # for same-job multi-references, like ppjoin_dedup's single-job shape).
    sh = shingle_sets(df, text_col, id_col, shingle_n).persist()
    # with_count: the signature aggregate (already grouped by id) also
    # emits n_sh, which rides the banding into SIZED candidate pairs — the
    # verify then skips its sizes re-shuffle of the shingle relation (r14)
    sig = minhash_signatures(sh, num_hashes, with_count=True)
    # banding is persisted (the candidate self-join scans it twice) but the
    # candidate PAIRS stay lazy: they feed exactly one consumer (the verify
    # join), so materializing them bought nothing — fusing candidate
    # generation and verification into the final materialization saves one
    # full localCheckpoint job per call (r14; ~1-2 s at sf0.1, and one
    # fewer pass over the pair set at any scale). Both caches release at
    # the end instead of banded releasing mid-pipeline.
    banded = lsh_bands(sig, bands, rows).persist()
    banded.count()  # eager: both self-join sides must HIT the cache, not race it
    cand = banded_candidate_pairs(banded, bucket_cap=bucket_cap, reps=reps)
    verified = jaccard_pairs(sh, candidates=cand).filter(F.col("jaccard") >= threshold)
    return materialize_release(verified, sh, banded)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 48) -> DataFrame:
    """Charikar SimHash fingerprint: per-token md5-derived bit votes,
    weighted by token count, folded into a ``bits``-wide BIGINT.

    One (id, token) aggregate then one per-id aggregate with ``bits``
    conditional sums — no per-bit explode, so the shuffle volume is just
    the distinct (id, token) pairs.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
    )
    tok_counts = toks.groupBy("id", "tok").agg(F.count("*").alias("cnt"))
    hashed = tok_counts.withColumn("h", md5_long(F.col("tok")))
    # the vote aggregates and the fold-up chain are parsed from SQL text:
    # identical expression trees to the Column-API form, but ~10 py4j
    # round-trips total instead of ~10 per bit (r14 driver-time trim)
    votes = hashed.groupBy("id").agg(
        *[
            F.expr(f"sum(((shiftright(h, {p}) & 1) * 2 - 1) * cnt)").alias(f"v{p}")
            for p in range(bits)
        ]
    )
    fingerprint = " + ".join(
        f"(CASE WHEN v{p} > 0 THEN CAST({1 << p} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for p in range(bits)
    )
    return votes.select("id", F.expr(fingerprint).alias("simhash"))


# ---------------------------------------------------------------------------
# line-level dedup (C4-style)
# ---------------------------------------------------------------------------


def line_level_dedup(
    df: DataFrame, text_col: str, id_col: str, line_tokens: int = 3
) -> DataFrame:
    """C4-style line dedup: split each text into consecutive
    ``line_tokens``-token spans, keep ONE occurrence of every distinct span
    corpus-wide (first by (id, position)), reassemble per id.

    Output: (id col, n_lines_total, n_lines_kept, text_deduped). Two
    shuffles: a window keyed BY THE SPAN (dedup decision is local to a
    span's hash partition — scales like exact dedup, never like a
    self-join), then one id-keyed aggregate producing totals, kept counts,
    and the newline-joined surviving text in a single pass.
    """
    from pyspark.sql import Window as W

    L = line_tokens
    # tokenize in its OWN projection so the explode below does not
    # re-evaluate the split per emitted row (see shingle_sets note)
    toks = df.select(
        F.col(id_col), F.split(normalize_text(text_col), " ").alias("__toks")
    )
    n_lines = F.ceil(F.size("__toks") / float(L)).cast("int")
    with_idx = toks.select(
        id_col, "__toks", F.explode(F.sequence(F.lit(0), n_lines - 1)).alias("line_idx")
    )
    lines = with_idx.select(
        id_col,
        "line_idx",
        F.array_join(F.slice("__toks", F.col("line_idx") * L + 1, L), " ").alias("line"),
    )
    first_wins = W.partitionBy("line").orderBy(id_col, "line_idx")
    ranked = lines.withColumn("rn", F.row_number().over(first_wins))
    kept_struct = F.when(F.col("rn") == 1, F.struct("line_idx", "line"))
    return ranked.groupBy(id_col).agg(
        F.count("*").alias("n_lines_total"),
        F.sum((F.col("rn") == 1).cast("long")).alias("n_lines_kept"),
        F.array_join(
            # collect_list drops the nulls the when() leaves for
            # non-first occurrences
            F.transform(F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]),
            "\n",
        ).alias("text_deduped"),
    )
