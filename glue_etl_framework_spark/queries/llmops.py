"""LLM-corpus curation operators, round 2 additions (EXT — north star
BASELINE.json:6): repetition filtering, benchmark decontamination, length
outlier trimming, bigram language-model scoring.

These extend queries.text / queries.curation with the remaining standard
steps of a large-scale pretraining-data pipeline. All JVM-side column
expressions + keyed shuffles (no Python UDFs, no driver collection);
determinism discipline follows queries/__init__.py (fixed-point integer
log-prob sums, integer-ratio doubles, round(x, 6) display columns).

Registered AFTER the round-2 driver window (see queries.__init__._MODULES):
they get local-oracle coverage now and rotate into driver rows next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glue_etl_framework_spark.queries import register, t

# 2-token sliding window at split-on-space token positions (same anchor
# discipline as queries.dedup.SHINGLE_REGEX — exact for any token content).
BIGRAM_REGEX = r"regexp_extract_all(text, '(?<=^| )(?=(\\S+ \\S+))', 1)"

_BIGRAM_SQL = """
      SELECT doc_id, unnest(list_transform(range(1, length(w)),
                                           i -> w[i] || ' ' || w[i+1])) AS bigram
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      WHERE length(w) >= 2
"""

REPETITION_FLAG = 0.2  # Gopher-style: most-common bigram > 20% of bigrams


@register(
    "text_repetition_ratio",
    oracle=f"""
    WITH bg AS ({_BIGRAM_SQL}),
    cnt AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(MAX(c) AS BIGINT) AS top_bigram_count,
           round(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS repetition_ratio,
           CASE WHEN CAST(MAX(c) AS DOUBLE) / SUM(c) >= {REPETITION_FLAG}
                THEN 1 ELSE 0 END AS flagged
    FROM cnt GROUP BY doc_id
    """,
    category="text",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filter (the Gopher/MassiveText duplicate-line family):
    share of a document's bigrams taken by its single most frequent bigram;
    boilerplate and template spam score high. Two keyed shuffles —
    (doc_id, bigram) count with map-side combine, then a per-doc max/sum —
    both partial+final hash aggregates, linear at any corpus size. Docs
    with < 2 tokens have no bigrams and are (consistently) absent."""
    d = t(spark, sf_dir, "documents")
    bg = d.select("doc_id", F.explode(F.expr(BIGRAM_REGEX)).alias("bigram"))
    cnt = bg.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    ratio = F.max("c").cast("double") / F.sum("c")
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_bigram_count"),
        F.round(ratio, 6).alias("repetition_ratio"),
        F.when(ratio >= REPETITION_FLAG, 1).otherwise(0).alias("flagged"),
    )


BENCH_SOURCE = "src0"  # the held-out "benchmark" subcorpus for decontamination


@register(
    "curation_decontaminate",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(range(1, length(w) - 1),
                                   i -> array_to_string(w[i:i+2], ' '))) AS shingle
      FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)
      WHERE length(w) >= 3
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE source = '{BENCH_SOURCE}'),
    hits AS (
      SELECT c.doc_id, COUNT(*) AS n_shared
      FROM (SELECT doc_id, shingle FROM sh WHERE source <> '{BENCH_SOURCE}') c
      JOIN bench b ON c.shingle = b.shingle
      GROUP BY c.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared_shingles,
           CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS contaminated
    FROM (SELECT doc_id FROM documents WHERE source <> '{BENCH_SOURCE}') d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    category="curation",
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training candidate that shares
    ANY word-3-gram with the held-out benchmark subcorpus (the standard
    n-gram-overlap decontamination step before pretraining; production uses
    13-grams — the plan shape is identical). The candidate->benchmark match
    is a shingle equi-join (shuffle keyed on the shingle, never all-pairs),
    then a per-doc count and a left join so clean docs report 0 — the same
    banded-join scale shape as dedup_against_corpus, but at n-gram rather
    than whole-document granularity."""
    from glue_etl_framework_spark.queries.dedup import SHINGLE_REGEX

    d = t(spark, sf_dir, "documents")
    sh = (
        d.select("doc_id", "source", F.explode(F.expr(SHINGLE_REGEX)).alias("shingle"))
        .distinct()
    )
    bench = sh.filter(F.col("source") == BENCH_SOURCE).select("shingle").distinct()
    cand = sh.filter(F.col("source") != BENCH_SOURCE).select("doc_id", "shingle")
    hits = cand.join(bench, "shingle").groupBy("doc_id").agg(F.count("*").alias("n_shared"))
    base = d.filter(F.col("source") != BENCH_SOURCE).select("doc_id")
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared_shingles"),
        F.when(F.col("n_shared").isNull(), 0).otherwise(1).alias("contaminated"),
    )


TRIM_LO = 0.05
TRIM_HI = 0.95


@register(
    "text_length_outlier_trim",
    oracle=f"""
    WITH stats AS (
      SELECT source,
             quantile_cont(n_chars, {TRIM_LO}) AS lo,
             quantile_cont(n_chars, {TRIM_HI}) AS hi
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars,
           round(s.lo, 6) AS lo_bound, round(s.hi, 6) AS hi_bound
    FROM documents d JOIN stats s ON d.source = s.source
    WHERE d.n_chars < s.lo OR d.n_chars > s.hi
    """,
    category="curation",
)
def text_length_outlier_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-outlier trimming: report the documents outside their source's
    [p5, p95] length band (truncation artifacts below, concatenation junk
    above — trimmed before training). Exact interpolated percentiles
    (Spark `percentile` == DuckDB `quantile_cont`, both linear on sorted
    values) per source — one grouped aggregate over a FEW HUNDRED sources,
    then a broadcast join back and a scan-side filter: the expensive input
    is never shuffled."""
    d = t(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(
        F.percentile("n_chars", TRIM_LO).alias("lo"),
        F.percentile("n_chars", TRIM_HI).alias("hi"),
    )
    return (
        d.join(F.broadcast(stats), "source")
        .filter((F.col("n_chars") < F.col("lo")) | (F.col("n_chars") > F.col("hi")))
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.round("lo", 6).alias("lo_bound"),
            F.round("hi", 6).alias("hi_bound"),
        )
    )


LM_SCALE = 1_000_000  # fixed-point: round(ln(p) * 1e6) summed as BIGINT


@register(
    "text_bigram_logprob",
    oracle=f"""
    WITH bg AS ({_BIGRAM_SQL}),
    split AS (SELECT doc_id, bigram, split_part(bigram, ' ', 1) AS w1 FROM bg),
    bfreq AS (SELECT bigram, COUNT(*) AS cb FROM split GROUP BY bigram),
    ufreq AS (SELECT w1, COUNT(*) AS cu FROM split GROUP BY w1),
    scored AS (
      SELECT s.doc_id,
             CAST(round(ln(CAST(b.cb AS DOUBLE) / u.cu) * {LM_SCALE}) AS BIGINT) AS lp
      FROM split s
      JOIN bfreq b ON s.bigram = b.bigram
      JOIN ufreq u ON s.w1 = u.w1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(lp) AS BIGINT) AS logprob_fp,
           CAST(SUM(lp) // COUNT(*) AS BIGINT) AS per_bigram_fp
    FROM scored GROUP BY doc_id
    """,
    category="text",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score: per-document sum of conditional
    log-probs ln(count(w1 w2) / count(w1 ·)) under the corpus's own bigram
    statistics — scrambled or unnatural word order scores low even when
    text_unigram_logprob (bag-of-words) looks fine. The bigram vocabulary
    grows with the corpus, so unlike the unigram op the frequency joins are
    keyed shuffles, not broadcasts — still linear, with map-side combine on
    both count aggregates. Fixed-point integer log-probs (round(ln*1e6))
    make every sum order-independent and oracle-hashable."""
    d = t(spark, sf_dir, "documents")
    bg = d.select("doc_id", F.explode(F.expr(BIGRAM_REGEX)).alias("bigram"))
    split = bg.select("doc_id", "bigram", F.substring_index("bigram", " ", 1).alias("w1"))
    bfreq = split.groupBy("bigram").agg(F.count("*").alias("cb"))
    ufreq = split.groupBy("w1").agg(F.count("*").alias("cu"))
    lp = F.round(F.log(F.col("cb").cast("double") / F.col("cu")) * LM_SCALE).cast("long")
    scored = split.join(bfreq, "bigram").join(ufreq, "w1").select("doc_id", lp.alias("lp"))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("lp").alias("logprob_fp"),
        (F.sum("lp") / F.count("*")).cast("long").alias("per_bigram_fp"),
    )


# Multi-language stopword lexicons (mirrors queries.text.STOPWORDS; repeated
# here as the single source for the confusion-matrix CASE chains so both
# engines render the identical decision order).
_LANGS = {
    "de": ["der", "die", "das", "und", "zu"],
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "la", "de", "et", "que"],
}


def _hits_sql(lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in _LANGS[lang])
    return f"length(list_filter(string_split(text, ' '), x -> list_contains([{arr}], x)))"


def _predict_case_sql() -> str:
    # explicit CASE chain in alphabetical order; >= keeps score ties on the
    # earlier language, and zero total hits short-circuits to 'unknown'
    langs = sorted(_LANGS)
    hits = {lg: _hits_sql(lg) for lg in langs}
    any_hit = " + ".join(hits.values())
    parts = []
    for lg in langs:
        conds = [f"{hits[lg]} >= {hits[o]}" for o in langs if o != lg]
        parts.append(f"WHEN {' AND '.join(conds)} THEN '{lg}'")
    return f"CASE WHEN ({any_hit}) = 0 THEN 'unknown' {' '.join(parts)} ELSE 'unknown' END"


@register(
    "quality_langid_confusion",
    oracle=f"""
    WITH pred AS (
      SELECT doc_id, lang AS lang_recorded, {_predict_case_sql()} AS lang_predicted
      FROM documents
    ),
    cm AS (
      SELECT lang_recorded, lang_predicted, COUNT(*) AS n_docs
      FROM pred GROUP BY lang_recorded, lang_predicted
    ),
    tot AS (SELECT lang_recorded, SUM(n_docs) AS n FROM cm GROUP BY lang_recorded)
    SELECT c.lang_recorded, c.lang_predicted,
           CAST(c.n_docs AS BIGINT) AS n_docs,
           round(CAST(c.n_docs AS DOUBLE) / t.n, 6) AS share_of_recorded
    FROM cm c JOIN tot t ON c.lang_recorded = t.lang_recorded
    """,
    category="quality",
)
def quality_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-metadata audit: confusion matrix of the recorded ``lang``
    column against the stopword-argmax language prediction (alphabetical
    tie-break, 'unknown' when no lexicon hits) — the standard check before
    trusting upstream language labels for stratified sampling. Scoring is
    a pure scan-side expression; the matrix is a tiny two-level aggregate
    (languages x languages rows), so the only shuffled data is the
    per-(recorded, predicted) partial counts."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")

    def hits_col(lex_words):
        # closure factory: a default-arg lambda would read as a binary
        # (element, index) higher-order-function lambda to PySpark
        lex = F.array(*[F.lit(w) for w in lex_words])
        return F.size(F.filter(words, lambda x: F.array_contains(lex, x)))

    hits = {lg: hits_col(_LANGS[lg]) for lg in sorted(_LANGS)}
    langs = sorted(_LANGS)
    any_hit = hits[langs[0]]
    for lg in langs[1:]:
        any_hit = any_hit + hits[lg]
    pred = F.when(any_hit == 0, F.lit("unknown"))
    for lg in langs:
        cond = None
        for other in langs:
            if other == lg:
                continue
            c = hits[lg] >= hits[other]
            cond = c if cond is None else (cond & c)
        pred = pred.when(cond, F.lit(lg))
    pred = pred.otherwise(F.lit("unknown"))
    cm = (
        d.select(F.col("lang").alias("lang_recorded"), pred.alias("lang_predicted"))
        .groupBy("lang_recorded", "lang_predicted")
        .agg(F.count("*").alias("n_docs"))
    )
    tot = cm.groupBy("lang_recorded").agg(F.sum("n_docs").alias("n"))
    return cm.join(tot, "lang_recorded").select(
        "lang_recorded",
        "lang_predicted",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.col("n_docs").cast("double") / F.col("n"), 6).alias("share_of_recorded"),
    )
