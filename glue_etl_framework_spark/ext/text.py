"""Reusable text-analysis verbs (EXT): tokenization, quality scoring,
language scoring against broadcast lexicons, BPE-ish token estimation,
rolling-hash fingerprints. The oracle-checked query forms live in
queries/text.py; these are the composable DataFrame -> DataFrame versions
for pipelines.

All pure column expressions (codegen; no Python UDFs)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un"],
    "de": ["der", "die", "das", "und", "zu", "ein", "ist"],
    "fr": ["le", "la", "de", "et", "que", "un", "est"],
}


def tokenize(df: DataFrame, text_col: str = "text", out_col: str = "tokens") -> DataFrame:
    """Whitespace tokenization after lowercase + punctuation strip."""
    cleaned = F.regexp_replace(F.lower(F.col(text_col)), r"[^\p{L}\p{N}\s]", " ")
    return df.withColumn(out_col, F.filter(F.split(F.trim(cleaned), r"\s+"), lambda x: x != ""))


def estimate_bpe_tokens(text: Column) -> Column:
    """BPE-ish token count estimate without a tokenizer model: words +
    extra tokens for long words (a subword every ~4 chars beyond the
    first 4) + digits/punctuation runs. A standard ~4-chars-per-token
    heuristic, exact enough for budget accounting."""
    words = F.filter(F.split(text, r"\s+"), lambda x: x != "")
    per_word = F.transform(
        words, lambda w: F.lit(1) + F.floor(F.greatest(F.length(w) - 4, F.lit(0)) / 4)
    )
    return F.aggregate(per_word, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long"))


def quality_features(
    df: DataFrame, text_col: str = "text", stopwords: list[str] | None = None
) -> DataFrame:
    """Standard quality-filter feature set: lengths, diversity, stopword
    ratio, punctuation ratio, mean word length."""
    sw = F.array(*[F.lit(w) for w in (stopwords or DEFAULT_STOPWORDS["en"])])
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda x: F.array_contains(sw, x)))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[\p{L}\p{N}\s]", ""))
    return (
        df.withColumn("n_chars_q", F.length(text_col))
        .withColumn("n_words_q", n_words)
        .withColumn("mean_word_len", F.length(text_col).cast("double") / F.greatest(n_words, F.lit(1)))
        .withColumn("stopword_ratio", n_stop.cast("double") / F.greatest(n_words, F.lit(1)))
        .withColumn("punct_ratio", n_punct.cast("double") / F.greatest(F.length(text_col), F.lit(1)))
        .withColumn(
            "lexical_diversity",
            F.size(F.array_distinct(words)).cast("double") / F.greatest(n_words, F.lit(1)),
        )
        .withColumn("est_bpe_tokens", estimate_bpe_tokens(F.col(text_col)))
    )


def language_scores(
    df: DataFrame, text_col: str = "text", lexicons: dict[str, list[str]] | None = None
) -> DataFrame:
    """Per-language stopword-hit counts + argmax prediction. Lexicons are
    literal arrays (broadcast-sized); at scale swap for a broadcast join
    against a lexicon table keyed by (lang, word)."""
    lexicons = lexicons or DEFAULT_STOPWORDS
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    out = df
    for lang, lex in lexicons.items():
        arr = F.array(*[F.lit(w) for w in lex])
        out = out.withColumn(
            f"score_{lang}", F.size(F.filter(words, lambda x: F.array_contains(arr, x)))
        )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in lexicons])
    pred = F.lit("unknown")
    # reversed so earlier lexicons win ties (when/otherwise chain)
    for lang in reversed(list(lexicons)):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("lang_predicted", pred)


def rolling_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 5,
    keep_mod: int = 8,
) -> DataFrame:
    """Winnowing-style document fingerprints: hash every ``window``-gram,
    keep the deterministic ~1/keep_mod subset (hash % keep_mod == 0) — the
    selected fingerprints are a content-addressed sketch for copy detection.
    One row per (doc, fingerprint)."""
    w = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - (window - 1), F.lit(1))),
        lambda i: F.md5(F.array_join(F.slice(w, i, window), " ")),
    )
    kept = F.array_distinct(
        F.filter(grams, lambda g: F.conv(F.substring(g, 1, 4), 16, 10).cast("long") % keep_mod == 0)
    )
    return df.select(id_col, F.explode(kept).alias("fingerprint"))
