"""Text analysis for training-data pipelines: language ID, quality scoring,
tokenization, fingerprinting.

The reference's analogs: word_count (common/document_parser/lib/
text_length.py:1-3), keyword extraction (lib/keywords.py), min-length
gating (lib/topics.py:30-34). These generalize them to the standard
pretraining-data screens. Everything is native column expressions
(codegen; narrow, shuffle-free) and every formula is reproducible in
portable SQL for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gamechanger_data_spark.operators.dedup import tokens_expr

# Tiny embedded stopword list — deliberately fixed and engine-neutral
# (a real deployment would broadcast a full per-language table).
EN_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on "
    "with as at by from not no"
).split()

TOKEN_REGEX = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\\s]"


def stopword_ratio_expr(text: Column | str) -> Column:
    toks = tokens_expr(text)
    stop = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    return F.when(n > 0, n_stop.cast("double") / n.cast("double")).otherwise(0.0)


def lang_id_expr(text: Column | str, threshold: float = 0.08) -> Column:
    """Heuristic language ID: English iff the stopword ratio clears a
    threshold (an n-gram/stopword heuristic; no model dependency)."""
    return F.when(stopword_ratio_expr(text) >= threshold, F.lit("en")).otherwise(
        F.lit("other")
    )


def token_count_expr(text: Column | str) -> Column:
    """BPE-ish token count: regex split into lowercase runs, capitalized
    runs, digit runs, and single punctuation marks."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0))


def quality_score_expr(text: Column | str) -> Column:
    """Composite quality score in [0,1]:
      0.4 * min(1, words/50)            (length credit)
      + 0.4 * distinct_word_ratio       (repetition penalty)
      + 0.2 * (1 - punct_char_ratio)    (symbol-noise penalty)
    Rounded to 6dp for engine-neutral comparison."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens_expr(c)
    n = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    length_credit = F.least(F.lit(1.0), n / F.lit(50.0))
    distinct_ratio = F.when(n > 0, n_distinct / n).otherwise(0.0)
    n_chars = F.length(c).cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace(c, r"[^A-Za-z0-9\s]", ""))
    ).cast("double")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    return F.round(
        F.lit(0.4) * length_credit + F.lit(0.4) * distinct_ratio
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio),
        6,
    )


def fingerprint_expr(text: Column | str, k: int = 5) -> Column:
    """Document fingerprint: the minimum md5 over word k-gram shingles of
    the normalized token stream (the winnowing/min-shingle scheme reduced
    to window = whole doc). Stable under duplicate-content reordering of
    surrounding batches; string-min is engine-neutral."""
    from gamechanger_data_spark.operators.dedup import shingles_expr

    return F.array_min(F.transform(shingles_expr(text, k), F.md5))


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    flag_token: float = 0.30,
    flag_2gram: float = 0.20,
    flag_3gram: float = 0.18,
) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021, §A1.1):
    per-doc duplicated-token fraction and duplicated n-gram CHARACTER
    fractions for n=2,3 — the filters web-scale corpora apply before
    training. ``dup_<n>gram_frac`` = chars inside grams occurring >= 2x in
    the doc / chars across all grams; ``flagged`` marks docs breaching any
    threshold.

    Scale shape: each metric is explode -> (id, gram) hash count (map-side
    combined) -> per-doc agg; the three branches then join on the SAME
    key (id) so AQE coalesces them into co-partitioned joins. No UDFs,
    no window, nothing O(corpus) on the driver."""
    from gamechanger_data_spark.operators.dedup import shingles_expr, tokens_expr

    def dup_frac(grams: Column, name: str) -> DataFrame:
        per = (
            df.select(F.col(id_col), F.explode(grams).alias("g"))
            .groupBy(id_col, "g")
            .agg(F.count("*").alias("c"))
        )
        chars = F.col("c") * F.length("g")
        return per.groupBy(id_col).agg(
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("c") >= 2, chars)) / F.sum(chars),
                    F.lit(0.0),
                ),
                6,
            ).alias(name)
        )

    toks = dup_frac(tokens_expr(text_col), "dup_token_frac")
    g2 = dup_frac(shingles_expr(text_col, 2), "dup_2gram_frac")
    g3 = dup_frac(shingles_expr(text_col, 3), "dup_3gram_frac")
    out = (
        df.select(id_col)
        .join(toks, id_col, "left")
        .join(g2, id_col, "left")
        .join(g3, id_col, "left")
        .fillna(0.0, ["dup_token_frac", "dup_2gram_frac", "dup_3gram_frac"])
    )
    return out.withColumn(
        "flagged",
        (F.col("dup_token_frac") > flag_token)
        | (F.col("dup_2gram_frac") > flag_2gram)
        | (F.col("dup_3gram_frac") > flag_3gram),
    )


def terms_expr(text: Column | str) -> Column:
    """Lowercase alphabetic terms (the IR-style vocabulary for corpus
    statistics — distinct from TOKEN_REGEX, which keeps punctuation for
    BPE-ish length accounting). Portable: ``regexp_extract_all(lower(t),
    '[a-z]+')`` means the same thing in Spark and DuckDB."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit("[a-z]+"), 0)


def tfidf_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF terms per document — the corpus-statistics upgrade of
    the reference's per-doc keyword extraction (common/document_parser/
    lib/keywords.py ranks by raw frequency only).

    score(t, d) = tf(t, d) * (ln((N + 1) / (df(t) + 1)) + 1)   (smoothed)

    Physical plan (100 TB shape): one explode -> (doc, term) count with
    map-side partial combine; df(t) is a second partial-combining count
    over the FIRST aggregate's output (no re-scan of text); N rides as a
    broadcast 1-row aggregate folded into the same plan (no eager
    driver-side count job); the idf join keys on term (vocabulary rows,
    orders of magnitude smaller than the corpus); top-k per doc is a
    window with a partial WindowGroupLimit pre-rank. No UDF, no driver
    collect. Ties break on term asc for determinism.
    """
    n_docs = docs.agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("N")
    )
    pairs = (
        docs.select(F.col(id_col), F.explode(terms_expr(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_counts.crossJoin(F.broadcast(n_docs)).select(
        "term",
        "df",
        (F.log((F.col("N") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)).alias("idf"),
    )
    scored = pairs.join(idf, "term").withColumn(
        "score", F.col("tf") * F.col("idf")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "rank",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.round("score", 6).alias("score"),
        )
    )


def unigram_surprise(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's own
    add-one-smoothed unigram distribution — a model-free perplexity proxy
    (the standard cheap quality screen: gibberish and boilerplate-stuffed
    docs sit in the distribution tails; cf. CCNet's LM filtering, here
    with the corpus itself as the language model).

    p(t) = (c(t) + 1) / (T + V); surprise(d) = -mean_{t in d} ln p(t).

    Two partial-combining aggregates over the exploded term stream (per-
    term corpus counts, then per-doc means after a term-keyed join of
    vocabulary rows) — never a per-row UDF, never a driver collect; the
    scalar (T, V) normalizer rides along as a cross-joined 1-row literal.
    Docs with no alphabetic terms are absent from the output (nothing to
    judge).
    """
    toks = docs.select(F.col(id_col), F.explode(terms_expr(text_col)).alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").cast("double").alias("T"), F.count(F.lit(1)).cast("double").alias("V")
    )
    probs = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        (-F.log((F.col("c") + F.lit(1.0)) / (F.col("T") + F.col("V")))).alias("nlp"),
    )
    return (
        toks.join(probs, "term")
        .groupBy(id_col)
        .agg(F.round(F.avg("nlp"), 6).alias("surprise"))
    )
