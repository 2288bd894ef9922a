"""Document deduplication suite — exact, n-gram Jaccard, MinHash+LSH, SimHash.

The reference dedups at two grains: exact content hashes (version_hash
anti-join, rpa/rpa_landing_zone_mover.py:100-128) and deterministic
sink ids (gc_elasticsearch_publisher.py:84-94). A training-data pipeline
additionally needs NEAR-duplicate detection at corpus scale; these
operators provide it Spark-first.

All hashing is md5-based with explicit hex->int conversion so an external
SQL engine (the DuckDB oracle) reproduces identical signatures — no
engine-private hash functions in any comparison path.

Scale notes (100 TB corpus):
  * tokenize/shingle/minhash are narrow per-row transforms (codegen, no
    shuffle);
  * LSH banding turns the O(n^2) pair space into groupBy(band_id, band_key)
    — one shuffle whose fan-in per reducer is the bucket size; band width
    controls the precision/recall/bucket-size tradeoff;
  * candidate verification is a self-join on bucket keys only (skew-safe:
    giant buckets indicate degenerate shingles and can be length-capped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gamechanger_data_spark.functions.text import normalize_text_expr


def tokens_expr(col: Column | str) -> Column:
    """Whitespace tokens, empties removed (portable: both engines split on
    single space and filter '')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda x: x != "")


def shingles_expr(col: Column | str, k: int = 3) -> Column:
    """Word k-gram shingles as space-joined strings."""
    toks = tokens_expr(col)
    n = F.size(toks)
    # i in 0 .. n-k  ->  slice(tokens, i+1, k) joined by ' '
    return F.when(n >= k, F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )).otherwise(F.array(F.array_join(toks, " ")))


def portable_hash64(c: Column, seed: int) -> Column:
    """Deterministic 60-bit integer hash reproducible in any SQL engine:
    first 15 hex chars of md5(seed || '#' || value), base-16 -> decimal.
    (15 hex chars = 60 bits, safely inside a signed 64-bit integer.)"""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}#"), c)), 1, 15), 16, 10
    ).cast("long")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on the sha256 of NORMALIZED text: one hash-groupBy
    (map-side combining — scales to any corpus), canonical = min id.
    Output: (content_key, canonical_id, n_dupes)."""
    return (
        df.select(
            F.sha2(normalize_text_expr(text_col), 256).alias("content_key"),
            F.col(id_col),
        )
        .groupBy("content_key")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_dupes"),
        )
    )


def capped_shingles_expr(
    col: Column | str, k: int = 3, max_shingles: int | None = None
) -> Column:
    """Distinct shingles, optionally capped to the ``max_shingles``
    lexicographically-smallest — a DETERMINISTIC, SQL-portable truncation
    (sort + slice) that bounds per-doc signature/verification cost against
    degenerate giant documents."""
    sh = F.array_distinct(shingles_expr(col, k))
    if max_shingles is not None:
        sh = F.slice(F.array_sort(sh), 1, max_shingles)
    return sh


def minhash_signature(df: DataFrame, text_col: str = "text", k_shingle: int = 3,
                      n_hashes: int = 12,
                      max_shingles: int | None = None) -> DataFrame:
    """Append minhash_0..n-1 columns: min over shingles of portable_hash64.

    Narrow, shuffle-free; n_hashes independent min-aggregations over the
    shingle array happen inside one projection (whole-stage codegen)."""
    sh = capped_shingles_expr(text_col, k_shingle, max_shingles)

    def hasher(seed: int):
        # one-arg lambda: a two-arg lambda would make pyspark bind the
        # ARRAY INDEX to the second parameter
        return lambda s: portable_hash64(s, seed)

    out = df
    for i in range(n_hashes):
        out = out.withColumn(
            f"minhash_{i}", F.array_min(F.transform(sh, hasher(i)))
        )
    return out


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    max_shingles: int | None = 512,
    max_bucket: int | None = 64,
) -> DataFrame:
    """Near-dup candidate pairs via LSH banding: docs sharing any band of
    rows_per_band consecutive minhashes collide. Output: (id_a, id_b) with
    id_a < id_b, distinct.

    Physical plan: projection (signatures) -> explode bands (xrows) ->
    groupBy-free self-join on (band, band_key) -> distinct. The join is the
    only shuffle; band_key is a composed string so the join key is one
    column.

    Skew caps — ON by default (the values minhash_lsh_verified uses):
    ``max_shingles`` bounds per-doc shingle sets to the lexicographically
    smallest N (degenerate repeated-token docs); ``max_bucket`` drops LSH
    buckets with more members than the cap BEFORE the self-join — a
    degenerate bucket of B docs would emit O(B^2) pairs and concentrate
    them on one reducer; at corpus scale such buckets are boilerplate/junk
    collisions, the textbook LSH skew guard. Pass None for either to get
    the uncapped textbook banding (exactness baselines only — an uncapped
    self-join is unsafe at corpus scale)."""
    sig = minhash_signature(
        df.select(id_col, text_col), text_col, k_shingle, n_hashes,
        max_shingles=max_shingles,
    )
    return _band_candidate_pairs(sig, id_col, n_hashes, bands, max_bucket)


def _band_candidate_pairs(
    sig: DataFrame, id_col: str, n_hashes: int, bands: int,
    max_bucket: int | None,
) -> DataFrame:
    """Band the minhash_* columns, optionally drop oversized buckets, and
    self-join to distinct (id_a < id_b) candidate pairs."""
    rows_per_band = n_hashes // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_", *[F.col(f"minhash_{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        F.col(id_col).alias("id"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", "bk.band", "bk.band_key")
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "band_key")
        banded = (
            banded.withColumn("__bsz", F.count("*").over(w))
            .filter(F.col("__bsz") <= max_bucket)
            .drop("__bsz")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_verified(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    n_hashes: int = 12,
    bands: int = 6,
    threshold: float = 0.4,
    max_shingles: int | None = 512,
    max_bucket: int | None = 64,
    persist_shingles: bool = True,
) -> DataFrame:
    """LSH candidates + EXACT-Jaccard verification (the stage round-1
    lacked): emits only CONFIRMED near-dup pairs (jaccard >= threshold),
    not raw band collisions.

    Plan: the capped shingle sets are computed ONCE (tokenize + distinct +
    sort + slice is the expensive per-doc work); the minhash signatures
    derive from that same column, and the candidate pairs join back to it
    for exact Jaccard — two hash joins keyed by doc id. Verification cost
    ∝ candidates, never O(n^2): the 100 TB shape.
    Output: (id_a, id_b, jaccard)."""
    sh_t = df.select(
        F.col(id_col).alias("__vid"),
        capped_shingles_expr(text_col, k_shingle, max_shingles).alias("__sh"),
    )
    if persist_shingles:
        # sh_t feeds three plan branches (signatures + both verification
        # join sides); persisting materializes the expensive per-doc chain
        # (tokenize/distinct/sort/slice) exactly once. MEMORY_AND_DISK —
        # the capped sets are bounded at max_shingles strings per doc.
        from pyspark import StorageLevel

        sh_t = sh_t.persist(StorageLevel.MEMORY_AND_DISK)

    def hasher(seed: int):
        return lambda s: portable_hash64(s, seed)

    sig = sh_t
    for i in range(n_hashes):
        sig = sig.withColumn(
            f"minhash_{i}", F.array_min(F.transform(F.col("__sh"), hasher(i)))
        )
    cand = _band_candidate_pairs(sig, "__vid", n_hashes, bands, max_bucket)
    j = (
        cand.join(
            sh_t.select(F.col("__vid"), F.col("__sh").alias("__sh_a")),
            cand.id_a == F.col("__vid"),
        )
        .drop("__vid")
        .join(
            sh_t.select(F.col("__vid"), F.col("__sh").alias("__sh_b")),
            cand.id_b == F.col("__vid"),
        )
        .drop("__vid")
    )
    inter = F.size(F.array_intersect("__sh_a", "__sh_b")).cast("double")
    union = F.size(F.array_union("__sh_a", "__sh_b")).cast("double")
    return (
        j.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_vs_query(
    df: DataFrame,
    query_tokens: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.3,
) -> DataFrame:
    """Unigram-set Jaccard of every doc against a fixed query token set —
    the O(n) screening form of n-gram Jaccard dedup. Output:
    (id, jaccard) for docs >= threshold, jaccard rounded to 6dp."""
    qs = F.array_distinct(F.array(*[F.lit(t) for t in query_tokens]))
    toks = F.array_distinct(tokens_expr(text_col))
    inter = F.size(F.array_intersect(toks, qs)).cast("double")
    union = F.size(F.array_union(toks, qs)).cast("double")
    jac = F.round(inter / union, 6)
    return (
        df.select(F.col(id_col), jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash over distinct unigrams (portable md5-bit formulation).

    For bit position b: vote = sum over tokens of +1/-1 depending on bit b
    of the token's 16-bit md5 prefix; simhash bit b = 1 iff vote > 0.
    Implemented as explode(tokens) x explode(bits) -> groupBy(id, bit) sum
    -> groupBy(id) bit-assembly. Two shuffles, both map-side combined; at
    corpus scale the (id, bit) key space is 16x docs — uniform, no skew."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_expr(text_col))).alias("tok"),
    ).withColumn(
        "h", F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("int")
    )
    bits = toks.select(
        id_col, "h", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit")
    ).withColumn(
        # shiftright with a COLUMN shift amount needs the SQL form (the
        # python F.shiftright binds only literal shifts)
        "vote",
        F.when(F.expr("(shiftright(h, bit) & 1) = 1"), 1).otherwise(-1),
    )
    votes = bits.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return (
        votes.groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("v") > 0, F.expr("shiftleft(1, bit)")).otherwise(0)
            )
            .cast("int")
            .alias("simhash")
        )
    )


def ngram_contamination(
    docs: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_hits: int = 2,
) -> DataFrame:
    """Benchmark decontamination screen: flag corpus docs sharing at least
    ``min_hits`` distinct word k-gram shingles with ANY probe (eval-set)
    document. Returns (id, n_hits, contaminated) for every corpus doc.

    Scale shape: the probe side (eval benchmarks) is tiny next to the
    corpus, so its distinct shingles are BROADCAST and the corpus-side
    shingle explode inner-joins without shuffling the corpus; the hit
    count is a map-side-combined distinct-agg per doc. Corpus cost is one
    scan + explode — no all-pairs anything."""
    doc_sh = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_expr(text_col, k))).alias("sh"),
    )
    probe_sh = (
        probes.select(F.explode(shingles_expr(text_col, k)).alias("sh")).distinct()
    )
    hits = (
        doc_sh.join(F.broadcast(probe_sh), "sh")
        .groupBy(id_col)
        .agg(F.count_distinct("sh").alias("n_hits"))
    )
    n = F.coalesce(F.col("n_hits"), F.lit(0).cast("long"))
    return docs.select(id_col).join(hits, id_col, "left").select(
        F.col(id_col),
        n.alias("n_hits"),
        (n >= F.lit(min_hits)).alias("contaminated"),
    )
