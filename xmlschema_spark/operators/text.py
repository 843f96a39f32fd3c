"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting.

All JVM-side Spark SQL expressions (regex + array built-ins) — no Python
in the hot path — so the whole set fuses into the same wide pass as the
facet rules when used as assertion/gate inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword-ratio heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
}


def tokens(col) -> Column:
    """Whitespace+punct tokenization (the BPE-ish regex split)."""
    return F.filter(
        F.split(F.lower(col), r"[^\p{L}\p{N}']+"), lambda t: F.length(t) > 0
    )


def token_count(col) -> Column:
    return F.size(tokens(col))


def char_count(col) -> Column:
    return F.length(col)


def stopword_hits(col, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.array_intersect(tokens(col), F.array(*[F.lit(w) for w in words])))


def detect_language(col) -> Column:
    """Heuristic language ID: the language whose stopword list overlaps the
    token set most; non-Latin scripts (e.g. zh) detected by script range
    first. Returns a language code or 'und'."""
    tok = tokens(col)
    scores = [
        (lang, F.size(F.array_intersect(tok, F.array(*[F.lit(w) for w in ws]))))
        for lang, ws in STOPWORDS.items()
    ]
    best = None
    best_score = None
    for lang, s in scores:
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    has_cjk = col.rlike("[\\u4e00-\\u9fff]")
    return (
        F.when(col.isNull(), F.lit(None))
        .when(has_cjk, F.lit("zh"))
        .when(best_score > 0, best)
        .otherwise(F.lit("und"))
    )


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc quality signals: lengths, token stats, punctuation/digit/
    uppercase ratios, mean word length, stopword ratio (en)."""
    c = F.col(text_col)
    n_chars = F.length(c)
    tok = tokens(c)
    n_tokens = F.size(tok)
    safe_chars = F.greatest(n_chars, F.lit(1))
    safe_toks = F.greatest(n_tokens, F.lit(1))
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[\p{Punct}]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    mean_word_len = F.aggregate(
        tok, F.lit(0), lambda acc, t: acc + F.length(t)
    ) / safe_toks
    stop_ratio = stopword_hits(c, "en") / safe_toks
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_punct / safe_chars).alias("punct_ratio"),
        (n_digit / safe_chars).alias("digit_ratio"),
        (n_upper / safe_chars).alias("upper_ratio"),
        mean_word_len.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Composite [0,1] quality score from the features — a simple
    monotone rubric (long enough, not punct/digit-heavy, plausible word
    lengths)."""
    feats = quality_features(df, text_col, id_col)
    score = (
        F.least(F.col("n_tokens") / 20.0, F.lit(1.0)) * 0.4
        + (1 - F.least(F.col("punct_ratio") * 4, F.lit(1.0))) * 0.2
        + (1 - F.least(F.col("digit_ratio") * 4, F.lit(1.0))) * 0.2
        + F.when((F.col("mean_word_len") >= 2) & (F.col("mean_word_len") <= 12), 0.2)
        .otherwise(0.0)
    )
    return feats.withColumn("quality_score", F.round(score, 6))


def fingerprint(col, k: int = 8) -> Column:
    """Order-insensitive document fingerprint: xxhash64 over the k
    lexicographically-smallest word 3-shingles (a rolling-hash winnowing
    analog, fully JVM-side). Equal fingerprints ⇒ near-identical content."""
    words = F.filter(F.split(F.lower(col), r"[^\p{L}\p{N}]+"), lambda t: F.length(t) > 0)
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - 3, F.lit(0)))
    sh = F.when(
        n >= 3,
        F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, 3)))),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    smallest = F.slice(F.array_sort(F.transform(sh, lambda s: F.xxhash64(s))), 1, k)
    return F.xxhash64(F.concat_ws(",", F.transform(smallest, lambda h: h.cast("string"))))


def fingerprint_md5(col, k: int = 8) -> Column:
    """Like :func:`fingerprint` but built on ``md5`` instead of
    ``xxhash64``: the k smallest md5 hex digests of the word 3-shingles,
    re-hashed into one digest. ~2-3x slower than the xxhash64 variant
    (hex-string materialization) but md5 exists in every engine, so this
    one is DuckDB-oracle verifiable end-to-end; use it when fingerprints
    must be reproducible outside Spark. Still fully JVM-side codegen."""
    words = F.filter(F.split(F.lower(col), r"[^\p{L}\p{N}]+"), lambda t: F.length(t) > 0)
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - 3, F.lit(0)))
    sh = F.when(
        n >= 3,
        F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, 3)))),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    smallest = F.slice(F.array_sort(F.transform(sh, lambda s: F.md5(s))), 1, k)
    return F.md5(F.concat_ws(",", smallest))
