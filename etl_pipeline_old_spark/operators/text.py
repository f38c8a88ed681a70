"""Text-analysis operators for training-data pipelines (north-star
extensions, BASELINE.json): language ID, quality scoring, token counting,
document fingerprinting. All pure Column expressions — codegen'd, no
Python, shuffle-free (per-row)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import md5_long, normalize_text

# tiny per-language stopword lists for the n-gram/stopword heuristic.
# Order = tiebreak priority (first wins on equal scores).
LANG_STOPWORDS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "a", "of", "and", "is")),
    ("es", ("el", "la", "de", "que", "y")),
    ("de", ("der", "die", "das", "und", "ist")),
    ("fr", ("le", "les", "des", "et", "est")),
)


def _tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(normalize_text(c), " ")


def stopword_hits(col: Column | str, words: tuple[str, ...]) -> Column:
    """Count of tokens belonging to ``words`` (duplicates counted)."""
    return F.size(F.filter(_tokens(col), lambda t: t.isin(*words)))


def lang_id(col: Column | str) -> Column:
    """Stopword-scoring language ID; argmax over LANG_STOPWORDS with
    first-listed-wins tiebreak; 'und' (undetermined) when no hits."""
    scores = [(lang, stopword_hits(col, words)) for lang, words in LANG_STOPWORDS]
    best = None
    for _, s in scores:
        best = s if best is None else F.greatest(best, s)
    # forward when-chain — on score ties the first-listed language wins
    chain = None
    for lang, s in scores:
        cond = (s == best) & (best > 0)
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    return chain.otherwise(F.lit("und"))


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(_tokens(col))


BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def token_count_bpe_ish(col: Column | str) -> Column:
    """BPE-ish regex token count (letter runs / digit runs / solo symbols)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length saturation, English
    stopword density, mean-word-length sanity band. Deterministic,
    SQL-portable."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count_ws(c)
    sw_ratio = stopword_hits(c, LANG_STOPWORDS[0][1]) / n_tok
    mean_len = F.length(normalize_text(c)) / n_tok
    len_sat = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    len_band = F.when((mean_len >= 3.0) & (mean_len <= 8.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(0.5 * len_sat + 0.3 * sw_ratio + 0.2 * len_band, 4)


def char_shingle_fingerprint(col: Column | str, k: int = 8) -> Column:
    """Winnowing-lite document fingerprint: min 60-bit md5 over all char
    k-grams of the normalized text (one array expression per row — no
    explode, no shuffle)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = normalize_text(c)
    return F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1))),
            lambda i: md5_long(F.substring(norm, i, k)),
        )
    )
