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


def _bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, :func:`tokens`
    tokenization. Docs with < 2 tokens emit nothing."""
    toks = tokens(F.col(text_col))
    n2 = F.size(toks) - 1
    pairs = F.when(
        n2 >= 1,
        F.arrays_zip(
            F.slice(toks, 1, n2).alias("w1"), F.slice(toks, 2, n2).alias("w2")
        ),
    )
    return (
        df.select(F.col(id_col).alias("__id"), F.explode(pairs).alias("__p"))
        .select("__id", F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
    )


def ngram_lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model_df: DataFrame | None = None,
    model_text_col: str | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Bigram language-model quality scoring — the CCNet-style
    perplexity filter: fit add-α bigram statistics on a model corpus
    (default: the scored corpus itself) and score every document by its
    mean log-probability; gibberish, shuffled text and boilerplate-free
    outliers land in the low tail even when every surface feature
    (length, punctuation, stopword ratio — :func:`quality_features`)
    looks normal. ``logp(w1 w2) = ln((c(w1,w2) + α) / (ctx(w1) + α·V))``
    with ``ctx(w1) = Σ_w c(w1, w)`` and ``V`` = the distinct
    next-word vocabulary; unseen bigrams/contexts degrade smoothly to
    the α floor.

    Output: one row per input document — id, ``n_bigrams``,
    ``avg_logp`` (NULL when the doc has < 2 tokens), ``ppl`` =
    exp(−avg_logp).

    Plan at 10^12 docs: the model tables are PRE-AGGREGATED (one row
    per bigram / per context word — vocabulary-bounded, zipf-shaped but
    tiny next to the corpus), so the scoring join is a skewed-fact →
    small-dim join: the doc-bigram side shuffles on (w1, w2) where AQE's
    skew split handles the stopword-pair hot keys, and Spark broadcasts
    the model sides outright when the vocab fits (the usual case). V and
    the two count tables come from ONE explode of the model corpus
    (ReusedExchange collapses the three aggs' shuffles); per-doc
    aggregation is a partial map-side avg. No driver data, no UDFs —
    ln/avg are codegen."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    model = df if model_df is None else model_df
    mtext = text_col if model_text_col is None else model_text_col
    # the model side only feeds corpus-level aggregations, so its id column
    # is irrelevant — use a constant placeholder rather than assuming any
    # positional id column on a caller-supplied model_df
    if model_df is not None:
        model = model.select(F.lit(0).alias("__mid"), F.col(mtext))
        mid = "__mid"
    else:
        mid = id_col
    mbg = _bigram_rows(model, mid, mtext)
    bigram_counts = mbg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c12"))
    ctx_counts = mbg.groupBy("w1").agg(F.count(F.lit(1)).alias("__c1"))
    vocab = mbg.agg(F.count_distinct(F.col("w2")).alias("__v"))

    doc_bg = _bigram_rows(df, id_col, text_col)
    scored = (
        doc_bg.join(bigram_counts, ["w1", "w2"], "left")
        .join(ctx_counts, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "__id",
            F.log(
                (F.coalesce(F.col("__c12"), F.lit(0)) + F.lit(float(alpha)))
                / (
                    F.coalesce(F.col("__c1"), F.lit(0))
                    + F.lit(float(alpha)) * F.col("__v")
                )
            ).alias("__logp"),
        )
    )
    per_doc = scored.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.avg("__logp").alias("avg_logp")
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "avg_logp",
            F.exp(-F.col("avg_logp")).alias("ppl"),
        )
    )


def token_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy — the gibberish /
    keyword-stuffing detector that length-and-punctuation features miss:
    a doc that repeats one token has H ≈ 0, natural prose sits near its
    vocabulary ceiling ``ln(n_distinct)``. Computed as
    ``H = ln(n) − Σ c·ln(c) / n`` over per-token counts c (algebraically
    identical to −Σ p·ln p, but needs no per-row p column).

    Output: id, ``n_tokens``, ``n_distinct``, ``entropy`` (NULL for
    empty docs), ``entropy_ratio`` = H / ln(n_distinct) ∈ [0, 1] (NULL
    when n_distinct < 2 — a 1-token vocabulary has no scale to judge
    against).

    Plan: explode → ONE (doc, token) grouped count (the explode
    collapses map-side, so the shuffle carries distinct (doc, token)
    pairs, not tokens) → one per-doc agg — the :func:`repetition
    <xmlschema_spark.operators.curation.repetition_features>` two-level
    partial-agg shape, linear in corpus size, no UDFs."""
    tok = tokens(F.col(text_col))
    counts = (
        df.select(F.col(id_col).alias("__id"), F.explode(tok).alias("__t"))
        .groupBy("__id", "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    per_doc = counts.groupBy("__id").agg(
        F.sum("__c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        (
            F.log(F.sum("__c"))
            - F.sum(F.col("__c") * F.log("__c")) / F.sum("__c")
        ).alias("entropy"),
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("n_distinct"), F.lit(0)).alias("n_distinct"),
            F.col("entropy"),
            F.when(
                F.col("n_distinct") >= 2,
                F.col("entropy") / F.log(F.col("n_distinct").cast("double")),
            ).alias("entropy_ratio"),
        )
    )
