"""F17 — paragraph / sentence segmentation, Spark-first.

Reference behavior reproduced (citations into /root/reference/):
``syntok.segmenter.process(page_text)`` yields paragraphs (token groups);
the reference re-joins each paragraph's tokens into one whitespace-
normalized string, keeps a doc-global paragraph counter, and derives the
paragraph id ``"<filename>_<count>"``
(common/document_parser/lib/document/document.py:104-130 get_par_dicts,
:149-166 tokens_to_str, make_paragraph_id).

Re-expressed as ONE native projection — no Python in the hot path:

  * paragraph boundaries are blank lines (syntok's paragraph rule);
    ``split`` -> array ``filter`` (drops whitespace-only paragraphs BEFORE
    the explode, so indices stay dense with no window/shuffle) ->
    ``posexplode``;
  * per-paragraph whitespace normalization (tokens_to_str's re-join)
    and the ``<id>_<n>`` derivation ride the same select;
  * sentence counting via a Java/RE2-portable regex in the same pass.

At 100 TB the plan is a pure map — split/filter/explode never shuffle,
and the explode multiplies rows AFTER the scan so column pruning still
reaches parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Blank-line paragraph boundary (syntok's paragraph rule).
PARA_SPLIT_RX = r"\n\s*\n"
# One sentence: a run without terminators plus its terminator cluster
# (or end-of-string for an unterminated trailing fragment). Portable
# Java <-> RE2 subset: no lookaround, no backrefs.
SENTENCE_RX = r"[^.!?]+(?:[.!?]+|$)"


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def paragraphs_expr(col: Column | str) -> Column:
    """array<string> of non-empty paragraphs, split on blank lines,
    order-preserving (filter runs on the array, keeping indices dense)."""
    return F.filter(
        F.split(_col(col), PARA_SPLIT_RX),
        lambda x: F.trim(x) != F.lit(""),
    )


def sentences_expr(col: Column | str) -> Column:
    """array<string> of trimmed sentences of one paragraph/text."""
    return F.filter(
        F.transform(
            F.regexp_extract_all(_col(col), F.lit(SENTENCE_RX), 0),
            lambda s: F.trim(s),
        ),
        lambda s: s != F.lit(""),
    )


def segment_paragraphs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(par_id, <id_col>, par_inc_count, par_text, n_sentences) — one row
    per non-empty paragraph, the reference's par_dict contract:
    ``par_id = f"{id}_{count}"``, ``par_inc_count`` dense per document,
    ``par_text`` whitespace-normalized (document.py:112-126, 149-166)."""
    out = df.select(
        id_col, F.posexplode(paragraphs_expr(text_col)).alias("par_inc_count", "raw")
    )
    par = F.trim(F.regexp_replace(F.col("raw"), r"\s+", " "))
    return out.select(
        F.concat_ws(
            "_", F.col(id_col), F.col("par_inc_count").cast("string")
        ).alias("par_id"),
        F.col(id_col),
        F.col("par_inc_count").cast("int").alias("par_inc_count"),
        par.alias("par_text"),
        F.size(F.regexp_extract_all(par, F.lit(SENTENCE_RX), 0))
        .cast("int")
        .alias("n_sentences"),
    )


def remove_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
) -> DataFrame:
    """Corpus-wide repeated-paragraph scrub — the Common-Crawl-pipeline
    boilerplate stage (headers, footers, cookie banners, license blocks):
    a paragraph whose whitespace-normalized text appears in ``min_docs``
    or more DISTINCT documents is dropped from every document; survivors
    are re-joined blank-line-separated in original order.

    Returns (id_col, text, n_dropped); a document whose every paragraph
    was boilerplate disappears from the output (nothing left to keep) —
    the downstream min-length gate is the intended next stage.

    Physical plan (100 TB shape): one paragraph explode; document
    frequency is a two-level aggregate on (paragraph, doc) with map-side
    partial combine — hot paragraphs (the boilerplate itself, by
    definition the most-repeated strings in the corpus) collapse in the
    partial stage, so the shuffle carries one row per distinct
    (paragraph, doc), not per occurrence; the df join keys on paragraph
    text; reassembly is one partial-combining collect_list per doc. No
    UDF, no driver collect. (The reference has no corpus-level analog —
    its parser is per-document; this is the scale stage above
    document.py's per-doc paragraph loop.)
    """
    pars = df.select(
        F.col(id_col), F.posexplode(paragraphs_expr(text_col)).alias("i", "raw")
    ).select(
        id_col,
        "i",
        F.trim(F.regexp_replace(F.col("raw"), r"\s+", " ")).alias("par"),
    )
    dfc = pars.groupBy("par").agg(F.count_distinct(id_col).alias("pdf"))
    joined = pars.join(dfc, "par")
    kept = joined.filter(F.col("pdf") < min_docs)
    totals = pars.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_total"))
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "par"))),
                    lambda x: x["par"],
                ),
                "\n\n",
            ).alias(text_col),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .join(totals, id_col)
        .select(
            id_col,
            text_col,
            (F.col("n_total") - F.col("n_kept")).cast("int").alias("n_dropped"),
        )
    )


def content_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    modulus: int = 16,
) -> DataFrame:
    """Content-defined chunking: chunk boundaries open where the portable
    hash of the 3-token window ending at a position ≡ 0 (mod ``modulus``)
    — the rolling-hash cut rule (Rabin/CDC) that makes boundaries a pure
    function of LOCAL content. Unlike fixed-size chunking, an insertion
    near the head shifts only its own chunk: downstream boundaries
    re-synchronize, so sub-document dedup over chunk hashes survives
    prefix edits (the property delta-encoding backup systems and
    chunk-level corpus dedup rely on). Mean chunk length ≈ ``modulus``
    tokens.

    Output: (id, chunk_idx, chunk_text, n_tokens). Plan: one explode, two
    lags + one running sum sharing a single doc-keyed window partition,
    one partial-combining rebuild per chunk — no UDF, no driver collect.
    """
    from gamechanger_data_spark.operators.dedup import tokens_expr
    from gamechanger_data_spark.operators.sampling import hash_bucket60

    t = df.select(
        F.col(id_col), F.posexplode(tokens_expr(text_col)).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    g = t.select(
        id_col, "pos", "tok",
        F.lag("tok", 1).over(w).alias("p1"),
        F.lag("tok", 2).over(w).alias("p2"),
    )
    gram = F.concat_ws(" ", F.col("p2"), F.col("p1"), F.col("tok"))
    brk = F.when(
        (F.col("pos") >= 2)
        & (F.pmod(hash_bucket60(gram), F.lit(modulus)) == 0),
        1,
    ).otherwise(0)
    cum = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.withColumn("cid", F.sum(brk).over(cum))
    return (
        c.groupBy(id_col, "cid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("chunk_text"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .select(
            id_col,
            F.col("cid").cast("int").alias("chunk_idx"),
            "chunk_text",
            "n_tokens",
        )
    )
