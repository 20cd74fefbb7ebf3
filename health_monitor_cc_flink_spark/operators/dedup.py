"""Deduplication operators for training-data curation at scale.

All hot paths stay JVM-side (built-in array/string/hash functions inside
whole-stage codegen) — no Python UDFs.  Hashing is md5-based so results
are deterministic and reproducible across engines and runs.

Scale design:
- exact dedup: one hash-shuffle on the dedup key (minimum possible).
- MinHash-LSH: shingling + signatures are narrow per-row map work; the
  only shuffles are the per-(doc, seed) min-aggregation and the band
  self-join, whose fan-out is bounded by band-bucket sizes (near-dup
  clusters), not by corpus size.  At 100 TB, band buckets are the skew
  risk — a bucket-size cap / salting guard belongs in front of the
  self-join (documented on lsh_candidate_pairs).
- SimHash: pure map + 16 tiny per-doc aggregations, one shuffle on doc.
- n-gram Jaccard: inverted-index join on shingle; explicit
  frequency-stop filter drops ubiquitous shingles (the classic
  stop-shingle optimization) to bound pair fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# -- exact ---------------------------------------------------------------------


def dedup_exact(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the minimum id per key; returns
    (keeper=min id, n_copies) per distinct key."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keeper"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def normalized_text(col: str = "text") -> F.Column:
    """Canonical normalization: lowercase + whitespace collapse."""
    return F.lower(F.regexp_replace(F.col(col), r"\s+", " "))


# -- MinHash + LSH -------------------------------------------------------------


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct k-word shingles per document: (id, shingle) rows.

    Tokenization is a plain single-space split (deterministic, engine-
    portable); shingle = k consecutive tokens joined by spaces.
    """
    toks = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))
    sh = toks.select(
        id_col,
        F.when(
            F.size("toks") >= k,
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, size(toks) - {k}), "
                    f"i -> concat_ws(' ', slice(toks, i + 1, {k})))"
                )
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("shingles"),
    )
    return sh.select(id_col, F.explode("shingles").alias("shingle"))


def minhash_signatures(
    sh: DataFrame, id_col: str, n_hashes: int = 16
) -> DataFrame:
    """MinHash signature rows (id, j, mh) for j in [0, n_hashes).

    Hash family: md5(shingle + '#' + j) — lexicographic min over the hex
    digest is a uniform min-hash.  One shuffle: the (id, j) min-agg.
    """
    spark = sh.sparkSession
    seeds = spark.range(n_hashes).select(F.col("id").alias("j"))
    return (
        sh.crossJoin(F.broadcast(seeds))
        .select(
            id_col,
            "j",
            F.md5(F.concat(F.col("shingle"), F.lit("#"), F.col("j").cast("string"))).alias("h"),
        )
        .groupBy(id_col, "j")
        .agg(F.min("h").alias("mh"))
    )


def lsh_bands(sig: DataFrame, id_col: str, rows_per_band: int = 4) -> DataFrame:
    """Band table (id, band, band_key): band_key concatenates the band's
    minhashes in seed order."""
    banded = sig.withColumn("band", F.expr(f"j div {rows_per_band}"))
    return (
        banded.groupBy(id_col, "band")
        .agg(F.sort_array(F.collect_list(F.struct("j", "mh"))).alias("ms"))
        .select(
            id_col,
            "band",
            F.concat_ws("|", F.expr("transform(ms, x -> x.mh)")).alias("band_key"),
        )
    )


def lsh_candidate_pairs(
    bands: DataFrame, id_col: str, max_bucket: int | None = None
) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing ≥1 band bucket.

    ``max_bucket`` is the 100 TB guard: buckets larger than it (degenerate
    near-dup clusters / skew) are dropped before the self-join so a
    single hot bucket can't quadratically explode a task.
    """
    if max_bucket is not None:
        sizes = bands.groupBy("band", "band_key").agg(F.count(F.lit(1)).alias("bsz"))
        bands = bands.join(
            sizes.filter(F.col("bsz") <= max_bucket), on=["band", "band_key"]
        ).drop("bsz")
    a = bands.select(F.col(id_col).alias("doc_a"), "band", "band_key")
    b = bands.select(F.col(id_col).alias("doc_b"), "band", "band_key")
    return (
        a.join(b, on=["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 16,
    rows_per_band: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup candidates with signature-match
    counts: (doc_a, doc_b, n_match) where n_match = #seeds whose
    minhashes agree (n_match / n_hashes estimates Jaccard; integer
    output keeps the result engine-exact)."""
    sh = shingles(df, id_col, text_col, k)
    sig = minhash_signatures(sh, id_col, n_hashes).cache()
    pairs = lsh_candidate_pairs(lsh_bands(sig, id_col, rows_per_band), id_col, max_bucket)
    sa = sig.select(F.col(id_col).alias("doc_a"), "j", F.col("mh").alias("mh_a"))
    sb = sig.select(F.col(id_col).alias("doc_b"), "j", F.col("mh").alias("mh_b"))
    return (
        pairs.join(sa, on="doc_a")
        .join(sb, on=["doc_b", "j"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum((F.col("mh_a") == F.col("mh_b")).cast("int")).alias("n_match"))
    )


# -- SimHash -------------------------------------------------------------------


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash per document over distinct tokens.

    Token hash = first 4 hex chars of md5 (a 16-bit integer); simhash
    bit b is the sign of Σ_tokens (2·bit_b(h) − 1).  All-integer math →
    engine-exact; the 16-bit width keeps the oracle SQL tractable while
    exercising the real dataflow (widen to 64 bits by raising BITS).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    )
    h = toks.select(
        id_col, F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("int").alias("h")
    )
    spark = df.sparkSession
    bits = spark.range(16).select(F.col("id").cast("int").alias("b"))
    contrib = h.crossJoin(F.broadcast(bits)).select(
        id_col,
        "b",
        F.expr("2 * (shiftright(h, b) & 1) - 1").alias("c"),
    )
    return (
        contrib.groupBy(id_col, "b")
        .agg(F.sum("c").alias("s"))
        .groupBy(id_col)
        .agg(F.expr("sum(CASE WHEN s > 0 THEN shiftleft(1, b) ELSE 0 END)").alias("simhash"))
    )


# -- n-gram Jaccard ------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_common: int = 2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard via inverted-index join.

    Output (doc_a, doc_b, n_common, n_a, n_b) — all integers, so
    jaccard = n_common / (n_a + n_b − n_common) is consumer-exact.
    ``max_doc_freq`` drops stop-shingles (appearing in more than that
    many docs) before pairing — the fan-out bound that makes this viable
    on skewed corpora.
    """
    sh = shingles(df, id_col, text_col, k).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
        sh_j = sh.join(freq.filter(F.col("df_") <= max_doc_freq), on="shingle").drop("df_")
    else:
        sh_j = sh
    a = sh_j.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh_j.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return common.join(na, on="doc_a").join(nb, on="doc_b")
