"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting — all codegen'd Spark expressions (no Python in the
hot path) over a documents table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny built-in stopword profiles for the n-gram/stopword-ratio heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "es"],
}


def words(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


def language_scores(text: Column) -> Column:
    """struct of per-language stopword hit-ratios."""
    w = words(text)
    denom = F.greatest(F.size(w), F.lit(1))
    return F.struct(
        *[
            (F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in sw]))) / denom)
            .alias(lang)
            for lang, sw in STOPWORDS.items()
        ]
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax stopword-profile hit ratio, 'und' if none."""
    scores = language_scores(F.col(text_col)).alias("scores")
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"scores.{lg}") for lg in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lg in langs:
        pred = pred.when(F.col(f"scores.{lg}") == best, F.lit(lg))
    return df.select("*", scores).withColumn("lang_pred", pred).drop("scores")


def token_count(text: Column, model: str = "whitespace") -> Column:
    """Token counting: whitespace model or a BPE-ish regex model
    (words / numbers / punctuation runs, GPT-pretokenizer-flavored)."""
    if model == "whitespace":
        return F.size(F.filter(words(text), lambda w: w != F.lit("")))
    if model == "bpe_regex":
        return F.regexp_count(text, F.lit(r"\w+|[^\w\s]"))
    raise ValueError(f"unknown token model {model}")


def quality_features(text: Column) -> Column:
    """struct of cheap quality signals (length, punct/digit/space ratios,
    mean word length, stopword ratio)."""
    n = F.greatest(F.length(text), F.lit(1))
    w = words(text)
    n_words = F.greatest(F.size(w), F.lit(1))
    punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    spaces = F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit("")))
    en_sw = F.size(
        F.array_intersect(w, F.array(*[F.lit(s) for s in STOPWORDS["en"]]))
    )
    return F.struct(
        F.length(text).alias("n_chars"),
        F.size(w).alias("n_words"),
        (punct / n).alias("punct_ratio"),
        (digits / n).alias("digit_ratio"),
        (spaces / n).alias("space_ratio"),
        ((F.length(text) - spaces) / n_words).alias("mean_word_len"),
        (en_sw / n_words).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score from the feature struct (monotone,
    deterministic — a filterable signal, not a model)."""
    f = quality_features(F.col(text_col)).alias("q")
    out = df.select("*", f)
    score = (
        F.lit(1.0)
        - F.least(F.col("q.punct_ratio") * 2, F.lit(0.4))
        - F.least(F.col("q.digit_ratio") * 2, F.lit(0.3))
        - F.when(F.col("q.mean_word_len") > 12, 0.2).otherwise(0.0)
        - F.when(F.col("q.n_words") < 5, 0.3).otherwise(0.0)
    )
    return out.withColumn("quality", F.round(F.greatest(score, F.lit(0.0)), 4))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: exact-content hash + normalized hash (case and
    whitespace folded) — the cheap two-tier dedup key."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.withColumn("fp_exact", F.xxhash64(F.col(text_col))).withColumn(
        "fp_norm", F.xxhash64(F.trim(norm))
    )


def repetition_features(text: Column) -> Column:
    """Repetition quality signals (round 4): the fraction of non-unique
    words and non-unique word-bigrams — the standard cheap detector for
    degenerate/looping documents in training-data filtering.  Pure codegen
    array expressions (case-sensitive words: repetition is about literal
    repeats, not vocabulary)."""
    ws = F.split(F.trim(text), r"\s+")
    n_w = F.size(ws)
    dup_w = F.round(
        (n_w - F.size(F.array_distinct(ws)))
        / F.greatest(n_w, F.lit(1)), 4,
    )
    bigrams = F.transform(
        F.sequence(F.lit(0), F.greatest(n_w - 2, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(ws, i + 1, 2)),
    )
    n_b = F.size(bigrams)
    dup_b = F.round(
        (n_b - F.size(F.array_distinct(bigrams)))
        / F.greatest(n_b, F.lit(1)), 4,
    )
    return F.struct(
        dup_w.alias("dup_word_frac"),
        dup_b.alias("dup_bigram_frac"),
        n_w.alias("n_words"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("rep", repetition_features(F.col(text_col)))
