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


def _spread_for_cpu(df: DataFrame) -> DataFrame:
    """Repartition ONLY when the input arrives as far fewer splits than
    the cluster has cores (the local single-file-parquet shape): the
    shingle/hash stages are CPU-bound map work that would otherwise run
    on a handful of tasks.  When the scan is already well-split — a
    100 TB corpus has thousands of input splits — repartitioning here
    would shuffle the full raw text for nothing, so it is skipped and
    the module's shuffle accounting (min-aggregation + band join only)
    holds at scale."""
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        # file COUNT as the split proxy: metadata-only (~3 ms vs ~1.3 s for
        # df.rdd.getNumPartitions(), which converts the whole plan to an
        # RDD).  Conservative: one big splittable file under-counts and
        # triggers a harmless repartition; a 100 TB corpus always has far
        # more files than cores and skips.  Non-file sources return [] and
        # also spread — correct for the in-memory test shape.
        n_splits = len(df.inputFiles())
    except Exception:
        n_splits = 0
    if n_splits >= max(1, par // 2):
        return df
    return df.repartition(par)


# -- MinHash + LSH -------------------------------------------------------------


def shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, distinct: bool = True
) -> DataFrame:
    """k-word shingles per document: (id, shingle) rows — distinct by
    default (set-semantics for Jaccard/MinHash); ``distinct=False``
    keeps multiplicities (bag semantics, e.g. repetition profiling).

    Tokenization is a plain single-space split (deterministic, engine-
    portable); shingle = k consecutive tokens joined by spaces.

    Implementation: posexplode tokens → per-doc lead() window →
    concat_ws → distinct.  The window/concat path is JVM-native
    (higher-order array lambdas would drop the stage to interpreted
    eval — measured ~3× slower); _spread_for_cpu repartitions ONLY when
    the corpus arrives as few input splits, so a well-split 100 TB scan
    never pays a raw-text shuffle here.  Per-doc window partitions are
    bounded by document length, so no skew risk.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"shingles: k must be >= 1, got {k}")
    toks = _spread_for_cpu(df).select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w")
    )
    if k == 1:
        # unigram shingles: the token itself, no window needed
        out = toks.select(id_col, F.col("w").alias("shingle"))
        return out.distinct() if distinct else out
    win = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("w", i).over(win) for i in range(1, k)]
    out = (
        toks.select(
            id_col,
            F.concat_ws(" ", F.col("w"), *leads).alias("shingle"),
            leads[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .drop("_last")
    )
    return out.distinct() if distinct else out


# Universal-hash family over a single 32-bit md5-prefix base hash:
# h_j(x) = (A_j·h32(x) + B_j) mod P.  One md5 per shingle instead of one
# per (shingle, seed) — 16× less hash CPU, the dominant cost at corpus
# scale.  Constants are deterministic and shared with the DuckDB oracle
# (registry_pipeline_ops builds the same expressions from these values).
MINHASH_PRIME = 4_294_967_291  # largest prime < 2^32
def minhash_coefficients(n_hashes: int) -> list[tuple[int, int]]:
    # A_j odd, < 2^20 so A·h32 + B stays < 2^52 (exact in int64/BIGINT
    # arithmetic in both engines); Knuth-style multiplicative spread.
    return [
        (((j * 2_654_435_761 + 1_013_904_223) % (1 << 20)) | 1, (j * 40_503 + 7) % MINHASH_PRIME)
        for j in range(n_hashes)
    ]


def minhash_signature_arrays(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 16,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Per-doc MinHash signature as one array<bigint> column.

    Base hash: first 8 hex chars of md5(shingle) as a 32-bit int; per-seed
    hashes via the universal family above, aggregated with one
    partially-aggregated min-groupBy (the shuffle carries only
    n_docs × n_hashes minima).  All plain codegen'd column math — no
    higher-order lambdas (those drop to interpreted eval).

    ``shingles_df``: a pre-built (id, shingle) relation to reuse (ideally
    localCheckpointed) — the shingle explode is the dominant corpus cost,
    so a caller feeding several consumers should materialize it once.
    """
    sh = shingles_df if shingles_df is not None else shingles(df, id_col, text_col, k)
    coeffs = minhash_coefficients(n_hashes)
    h32 = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("bigint")
    hashed = sh.select(
        id_col,
        *[
            ((F.lit(a) * h32 + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"m{j}")
            for j, (a, b) in enumerate(coeffs)
        ],
    )
    agg = hashed.groupBy(id_col).agg(
        *[F.min(f"m{j}").alias(f"mh{j}") for j in range(n_hashes)]
    )
    return agg.select(
        id_col, F.array(*[F.col(f"mh{j}") for j in range(n_hashes)]).alias("sig")
    )


def lsh_bands_from_arrays(
    sigs: DataFrame, id_col: str, rows_per_band: int = 4
) -> DataFrame:
    """Band table from array signatures — still map-side (posexplode of
    n_bands elements per doc, no shuffle).  A signature shorter than one
    band yields NO band rows (the CASE guard): without it,
    ``sequence(0, -1)`` auto-descends to ``[0, -1]`` and emits a
    negative-index garbage band sliced from the array tail."""
    n = rows_per_band
    if n < 1:
        raise ValueError(f"rows_per_band must be >= 1, got {n}")
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"CASE WHEN size(sig) >= {n} THEN "
                f"transform(sequence(0, size(sig) div {n} - 1), "
                f"b -> concat_ws('|', slice(sig, b * {n} + 1, {n}))) "
                f"ELSE array() END"
            )
        ).alias("band", "band_key"),
    )
    return banded


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
    output keeps the result engine-exact).

    Plan shape: map-side signatures/bands, one broadcast-friendly band
    self-join for candidates, then an array zip comparison per pair —
    no per-(doc, seed) shuffle anywhere.
    """
    if n_hashes % rows_per_band != 0:
        raise ValueError(
            f"n_hashes ({n_hashes}) must be a multiple of rows_per_band "
            f"({rows_per_band}) — trailing minhashes would be silently unbanded"
        )
    # lazy localCheckpoint, not .cache(): same reuse across the three
    # consumers below, but the materialized RDD is released by the
    # ContextCleaner when this plan is garbage collected — .cache()
    # entries live in the CacheManager until someone unpersists, which
    # no caller of this lazy-returning function can do
    sigs = minhash_signature_arrays(df, id_col, text_col, k, n_hashes).localCheckpoint(
        eager=False
    )
    pairs = lsh_candidate_pairs(
        lsh_bands_from_arrays(sigs, id_col, rows_per_band), id_col, max_bucket
    )
    sa = sigs.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
            .cast("bigint")
            .alias("n_match"),
        )
    )


# -- SimHash -------------------------------------------------------------------


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash per document over distinct tokens.

    Token hash = first 4 hex chars of md5 (a 16-bit integer); simhash
    bit b is the sign of Σ_tokens (2·bit_b(h) − 1).  All-integer math →
    engine-exact; the 16-bit width keeps the oracle SQL tractable while
    exercising the real dataflow.  One hash-aggregate with 16 per-bit
    sum columns (map-side partials): no bit fan-out rows, one shuffle
    of |docs| wide rows instead of |tokens|·16 exploded rows.
    """
    toks = _spread_for_cpu(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    )
    h = toks.select(
        id_col, F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("int").alias("h")
    )
    # one aggregation, 16 per-bit sum columns — no bit fan-out rows, no
    # second shuffle: the grouped relation is |docs| wide-rows instead of
    # |tokens|·16 exploded rows, and each sum gets a map-side partial
    sums = h.groupBy(id_col).agg(
        *[
            F.sum(F.expr(f"2 * (shiftright(h, {b}) & 1) - 1")).alias(f"s{b}")
            for b in range(16)
        ]
    )
    # CAST keeps the output BIGINT: the oracle declares BIGINT, and bare
    # shiftleft(1, b) would narrow the column to INT (driver schema gate)
    bit_terms = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN shiftleft(CAST(1 AS BIGINT), {b}) ELSE CAST(0 AS BIGINT) END)"
        for b in range(16)
    )
    return sums.select(id_col, F.expr(bit_terms).alias("simhash"))


# -- n-gram Jaccard ------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_common: int = 2,
    max_doc_freq: int | None = None,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard via inverted-index join.

    Output (doc_a, doc_b, n_common, n_a, n_b) — all integers, so
    jaccard = n_common / (n_a + n_b − n_common) is consumer-exact.
    ``max_doc_freq`` drops stop-shingles (appearing in more than that
    many docs) before pairing — the fan-out bound that makes this viable
    on skewed corpora.  When it is set, n_a/n_b are ALSO computed over
    the filtered shingle sets, so the jaccard triple stays internally
    consistent ("Jaccard over informative shingles"); mixing filtered
    n_common with unfiltered sizes would systematically underestimate.

    ``shingles_df``: a pre-built (id, shingle) relation to reuse — the
    caller is responsible for having materialized it (localCheckpoint)
    when it also feeds other consumers.
    """
    # lazy localCheckpoint, not .cache(): released on GC (see
    # minhash_lsh_pairs)
    sh = (
        shingles_df
        if shingles_df is not None
        else shingles(df, id_col, text_col, k).localCheckpoint(eager=False)
    )
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
        sh_j = sh.join(
            freq.filter(F.col("df_") <= max_doc_freq), on="shingle"
        ).drop("df_").localCheckpoint(eager=False)
    else:
        sh_j = sh
    sizes = sh_j.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
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


# -- near-dup clustering -------------------------------------------------------


def connected_components(
    edges: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b", max_iters: int = 20
) -> DataFrame:
    """Connected components over an undirected pair list by iterative
    min-label propagation: each node's label converges to the smallest
    node id in its component (the canonical dedup-cluster keeper).

    Converges in O(component diameter) rounds — near-dup clusters are
    shallow, so a handful of joins; lineage is truncated with
    localCheckpoint each round so plans don't snowball.  Returns
    (node, cluster_id) for every node appearing in an edge.

    Raises RuntimeError if labels are still changing after ``max_iters``
    rounds: returning silently would split one real component into
    several cluster_ids and dedup would keep multiple "keepers" of the
    same duplicate family (long boilerplate chains can exceed any fixed
    cap) — callers should raise ``max_iters`` for deep graphs.
    """
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.groupBy("src").agg(
        F.least(F.col("src"), F.min("dst")).alias("lbl")
    ).select(F.col("src").alias("node"), "lbl")

    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        # carry the previous label through the propagation select so
        # the convergence probe is a filter over the already-
        # materialized checkpoint instead of a join of two rounds'
        # frames (one fewer driver round-trip per iteration)
        stepped = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
                F.col("lbl").alias("_prev"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            stepped.filter(F.col("lbl") != F.col("_prev")).limit(1).count()
        )
        labels = stepped.select("node", "lbl")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"(a component's diameter exceeds the cap); raise max_iters"
        )
    return labels.select(F.col("node"), F.col("lbl").alias("cluster_id"))


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document over distinct tokens, emitted as two
    32-bit halves ``(simhash_hi, simhash_lo)``.

    Token hash = first 16 hex chars of md5, parsed as two 32-bit words
    (a single 64-bit parse can overflow signed BIGINT for values ≥ 2^63;
    the halves stay exact in both engines).  Bit b of the sketch is the
    sign of Σ_tokens (2·bit_b(h) − 1); hamming distance downstream is
    ``bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)``.  All-integer →
    oracle-exact.  Same single-aggregation dataflow as
    :func:`simhash16`, with 64 per-bit sum columns.
    """
    toks = _spread_for_cpu(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    )
    h = toks.select(
        id_col,
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("bigint").alias("h_hi"),
        F.conv(F.substring(F.md5("w"), 9, 8), 16, 10).cast("bigint").alias("h_lo"),
    )
    # one aggregation, 64 per-bit sum columns — no bit fan-out rows, no
    # second shuffle (see simhash16)
    lo_sums = [
        F.sum(F.expr(f"2 * (shiftright(h_lo, {b}) & 1) - 1")).alias(f"s{b}")
        for b in range(32)
    ]
    hi_sums = [
        F.sum(F.expr(f"2 * (shiftright(h_hi, {b - 32}) & 1) - 1")).alias(f"s{b}")
        for b in range(32, 64)
    ]
    sums = h.groupBy(id_col).agg(*lo_sums, *hi_sums)
    hi_terms = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN shiftleft(CAST(1 AS BIGINT), {b - 32}) ELSE CAST(0 AS BIGINT) END)"
        for b in range(32, 64)
    )
    lo_terms = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN shiftleft(CAST(1 AS BIGINT), {b}) ELSE CAST(0 AS BIGINT) END)"
        for b in range(32)
    )
    return sums.select(
        id_col,
        F.expr(hi_terms).alias("simhash_hi"),
        F.expr(lo_terms).alias("simhash_lo"),
    )


# -- paragraph-level dedup (MassiveText-style) -----------------------------------


def paragraph_fingerprint(col) -> F.Column:
    """Normalized paragraph fingerprint: md5 over lowercase text with
    whitespace collapsed — the MassiveText/Gopher normalization
    (Rae et al. 2021 §A.1.2 dedup on normalized exact match)."""
    return F.md5(F.lower(F.regexp_replace(col, r"\s+", " ")))


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """MassiveText-style PARAGRAPH-level exact dedup — the cheap
    middle granularity between doc-level MinHash and span-level
    ExactSubstr that real ingest pipelines run first (Rae et al. 2021):
    split each document into paragraphs on ``sep``, fingerprint each
    normalized paragraph, keep ONLY the first occurrence corpus-wide
    (the minimum (doc_id, paragraph index) — an aggregate, so the
    result is deterministic regardless of partitioning; contrast
    C4-style drop-ALL in corpus_span_dedup_global), and reassemble the
    surviving paragraphs in original order.

    Returns every input document: (doc_id, n_paras, n_removed,
    text_clean) — n_removed = 0 and text_clean = text for documents
    whose every paragraph is globally first.

    Scale shape: one narrow paragraph explode, one hash-agg on the
    16-byte fingerprint (the keeper census), one fingerprint-keyed
    join back, one per-doc reassembly agg — no pairwise comparison
    anywhere.  The shuffle key is the md5 fingerprint, never the
    paragraph text."""
    paras = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(text_col, sep)).alias("idx", "para"),
        )
        .filter(F.trim("para") != "")
        .withColumn("fp", paragraph_fingerprint(F.col("para")))
    )
    # keeper = min (doc_id, idx) per fingerprint, attached via a
    # whole-partition window min rather than groupBy + join-back: one
    # fp-keyed exchange instead of two, and the paragraph explode +
    # fingerprint subtree evaluates once instead of once per join
    # side (identical output — the window min is the same aggregate).
    from pyspark.sql import Window as _W

    marked = paras.withColumn(
        "keeper",
        F.min(F.struct("doc_id", "idx")).over(_W.partitionBy("fp")),
    ).withColumn(
        "is_kept",
        (F.col("doc_id") == F.col("keeper.doc_id"))
        & (F.col("idx") == F.col("keeper.idx")),
    )
    out = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum((~F.col("is_kept")).cast("long")).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("is_kept"), F.struct("idx", "para"))
                    )
                ),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text_clean"),
    )
    # documents made entirely of empty/whitespace paragraphs never
    # reach `paras`; restore them with zero counts
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(out, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
        F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )


# -- duplicated spans (suffix-array-style ExactSubstr) ---------------------------

#: Stop-gram lists larger than this are NOT broadcast: the list size is
#: data-dependent (a heavy-tailed corpus can push millions of grams
#: above max_gram_freq), and an unbounded broadcast is a driver/executor
#: OOM at 100 TB.  Above the limit the anti-join falls back to a
#: shuffle join (same result, bounded memory).
DEFAULT_HOT_BROADCAST_LIMIT = 1_000_000


def _anti_join_hot(grams: DataFrame, hot: DataFrame, keys,
                   hot_broadcast_limit: int | None) -> DataFrame:
    """Anti-join the gram stream against the stop-gram list, broadcast
    ONLY when the list is verifiably small.  ``hot_broadcast_limit``
    None = unconditional broadcast (the pre-guard behavior, for plans
    that must stay action-free); an int = persist the list, count at
    most limit+1 rows, and broadcast iff the count stays at or under
    the limit — otherwise shuffle.  The persist makes the census run
    once whichever path executes the join; it is left cached (Spark's
    LRU evicts MEMORY_AND_DISK blocks under pressure) because
    unpersisting before the lazy join executes would recompute the
    census inside the join."""
    if hot_broadcast_limit is None:
        return grams.join(F.broadcast(hot), keys, "left_anti")
    from pyspark import StorageLevel

    hot = hot.persist(StorageLevel.MEMORY_AND_DISK)
    n = hot.limit(int(hot_broadcast_limit) + 1).count()
    if n <= hot_broadcast_limit:
        return grams.join(F.broadcast(hot), keys, "left_anti")
    return grams.join(hot, keys, "left_anti")


def _maybe_hash_grams(grams: DataFrame,
                      use_hashed_grams: bool) -> DataFrame:
    """Optionally replace the gram STRING with xxhash64(gram) — the
    narrow-shuffle variant for 100 TB runs: the census/anti-join/
    equi-join shuffle 8-byte keys instead of k-token strings.  A hash
    collision can only fabricate an isolated 1-gram candidate
    alignment, which the min_tokens span filter discards (a run of r
    matches is needed for a span of r + k - 1 tokens).  The string
    path stays the default so the DuckDB oracle replicates the join
    byte-for-byte."""
    if not use_hashed_grams:
        return grams
    return grams.withColumn("gram", F.xxhash64("gram"))


def kgram_positions(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 6
) -> DataFrame:
    """Every k-token gram of every document WITH its 0-based token
    position -> (doc_id, pos, gram).  In-plan narrow work: split +
    transform(sequence) + posexplode, no shuffle, no Python.  Documents
    shorter than k tokens contribute nothing (guarded: F.sequence with
    start > stop would generate a DESCENDING range)."""
    docs = df.select(
        F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("words")
    )
    return (
        docs.filter(F.size("words") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("words") - k),
                    lambda i: F.array_join(F.slice("words", i + 1, k), " "),
                )
            ).alias("pos", "gram"),
        )
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 6,
    min_tokens: int = 8,
    max_gram_freq: int = 50,
    use_hashed_grams: bool = False,
    hot_broadcast_limit: int | None = DEFAULT_HOT_BROADCAST_LIMIT,
) -> DataFrame:
    """Cross-document duplicated-SPAN detection — the suffix-array-style
    train-data dedup of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better", ExactSubstr), re-expressed bucketed
    for Spark instead of via a monolithic suffix array:

    1. anchor: every k-token gram with its position (narrow map work);
    2. stop-gram filter: grams whose GLOBAL frequency exceeds
       ``max_gram_freq`` are dropped via an anti-join, capping per-gram
       join fan-out at max_gram_freq^2 — the equi-join is bucketed by
       gram, NEVER all-pairs.  The stop-gram list is broadcast ONLY
       while its counted size stays at or under
       ``hot_broadcast_limit`` (its size is data-dependent: heavy-
       tailed corpora can push millions of grams over the cap); above
       the limit the anti-join falls back to a shuffle join —
       identical result, bounded memory.  ``hot_broadcast_limit=None``
       restores the unconditional pre-guard broadcast;
    3. candidate alignments: gram equi-join across doc pairs
       (doc_a < doc_b), each match pinned to a diagonal
       diag = pos_a - pos_b;
    4. maximal spans: gaps-and-islands along each (doc_a, doc_b, diag)
       — a run of r consecutive matching gram positions is EXACTLY a
       maximal duplicated span of r + k - 1 tokens (extending it by one
       token either side would add another matching gram to the run).

    Returns (doc_a, doc_b, start_a, start_b, span_tokens, span_md5) for
    maximal spans of >= ``min_tokens`` tokens; start_* are 0-based token
    offsets and span_md5 hashes the span text sliced back out of doc_a.
    Granularity caveat (same as any anchor-based ExactSubstr
    approximation): spans are detected at k-gram resolution, so
    duplicates shorter than k tokens are invisible and span boundaries
    are exact to the token.

    Scale shape: one gram hash-agg (frequency census), one size-guarded
    anti-join, one gram equi-join whose fan-out the census bounds, one
    window + hash-agg on (doc-pair, diag), one doc-keyed join to slice
    span text.  ``use_hashed_grams=True`` is the 100 TB narrow-shuffle
    variant: every join/census key becomes xxhash64(gram) (8 bytes
    instead of a k-token string); a hash collision can only fabricate
    an isolated 1-gram candidate, which the min_tokens filter discards.
    The string path stays the default so the DuckDB oracle replicates
    the join byte-for-byte."""
    docs = df.select(
        F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("words")
    )
    grams = _maybe_hash_grams(
        kgram_positions(df, id_col, text_col, k), use_hashed_grams
    )
    hot = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > max_gram_freq)
        .select("gram")
    )
    gf = _anti_join_hot(grams, hot, "gram", hot_broadcast_limit)
    a = gf.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "gram"
    )
    b = gf.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "gram"
    )
    pairs = (
        a.join(b, "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("diag", F.col("pos_a") - F.col("pos_b"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    runs = pairs.withColumn("isl", F.col("pos_a") - F.row_number().over(w))
    spans = (
        runs.groupBy("doc_a", "doc_b", "diag", "isl")
        .agg(
            F.min("pos_a").cast("long").alias("start_a"),
            F.min("pos_b").cast("long").alias("start_b"),
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_tokens)
        .drop("diag", "isl")
    )
    wa = docs.select(F.col("doc_id").alias("doc_a"), "words")
    return spans.join(wa, "doc_a").select(
        "doc_a",
        "doc_b",
        "start_a",
        "start_b",
        "span_tokens",
        F.md5(
            F.array_join(
                F.slice("words", F.col("start_a") + 1, F.col("span_tokens")), " "
            )
        ).alias("span_md5"),
    )


def strip_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 6,
    min_tokens: int = 8,
    max_gram_freq: int = 50,
    use_hashed_grams: bool = False,
    hot_broadcast_limit: int | None = DEFAULT_HOT_BROADCAST_LIMIT,
) -> DataFrame:
    """The ExactSubstr dedup ACTION (Lee et al. 2022 apply step): drop
    every token covered by a cross-document duplicated span, KEEPING
    the occurrence in the lowest-doc_id document of each pair, and
    reassemble the surviving text in original token order.  Keep-first
    is an aggregate property (the doc is the larger id of the pair),
    so the result is deterministic regardless of partitioning.

    Returns every document: (doc_id, n_tokens, n_removed, text_clean)
    — n_removed = 0 and text_clean = text for untouched docs.

    Scale shape: duplicated_spans' bucketed pipeline, plus one bounded
    explode of span token positions (span volume, not corpus volume),
    one (doc, pos) anti-join against the token stream, and one per-doc
    reassembly agg."""
    spans = duplicated_spans(df, id_col, text_col, k, min_tokens,
                             max_gram_freq, use_hashed_grams,
                             hot_broadcast_limit)
    covered = (
        spans.select(
            F.col("doc_b").alias("doc_id"),
            F.explode(
                F.sequence(
                    F.col("start_b"),
                    F.col("start_b") + F.col("span_tokens") - 1,
                )
            ).alias("pos"),
        )
        .distinct()
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("words")
    ).select("doc_id", F.posexplode("words").alias("pos", "token"))
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    out = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: s["token"],
            ),
            " ",
        ).alias("text_clean"),
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(text_col, " ")).cast("long").alias("n_tokens"),
    )
    # every doc appears in `toks`, so absence from `out` means ZERO
    # kept tokens (fully-stripped doc), not an untouched one
    return base.join(out, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
    )


def repeated_spans_within_doc(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_tokens: int = 3,
    max_gram_freq: int = 50,
    use_hashed_grams: bool = False,
    hot_broadcast_limit: int | None = DEFAULT_HOT_BROADCAST_LIMIT,
) -> DataFrame:
    """INTRA-document repeated spans — the within-doc complement of
    :func:`duplicated_spans` (boilerplate / tandem-repeat detection):
    maximal substrings that occur at least twice INSIDE one document.
    Each later occurrence pairs with each earlier one on a positive
    diagonal d = pos_late - pos_early (the repeat distance); runs of
    consecutive gram matches along one (doc, d) are maximal repeats of
    run + k - 1 tokens, including overlapping tandem repeats (d <
    span length).  The frequency cap here is PER-DOCUMENT (a gram
    repeated > max_gram_freq times in one doc is degenerate boilerplate
    and would square the self-join) — at 100 TB per-doc caps bound the
    fan-out even for book-length documents.

    Returns (doc_id, start_early, start_late, distance, span_tokens,
    span_md5)."""
    docs = df.select(
        F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("words")
    )
    grams = _maybe_hash_grams(
        kgram_positions(df, id_col, text_col, k), use_hashed_grams
    )
    hot = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > max_gram_freq)
        .select("doc_id", "gram")
    )
    gf = _anti_join_hot(grams, hot, ["doc_id", "gram"], hot_broadcast_limit)
    a = gf.select("doc_id", F.col("pos").alias("pos_late"), "gram")
    b = gf.select("doc_id", F.col("pos").alias("pos_early"), "gram")
    pairs = (
        a.join(b, ["doc_id", "gram"])
        .filter(F.col("pos_late") > F.col("pos_early"))
        .withColumn("distance", F.col("pos_late") - F.col("pos_early"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id", "distance").orderBy("pos_late")
    runs = pairs.withColumn(
        "isl", F.col("pos_late") - F.row_number().over(w)
    )
    spans = (
        runs.groupBy("doc_id", "distance", "isl")
        .agg(
            F.min("pos_early").cast("long").alias("start_early"),
            F.min("pos_late").cast("long").alias("start_late"),
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_tokens)
        .drop("isl")
    )
    return spans.join(docs, "doc_id").select(
        "doc_id",
        "start_early",
        "start_late",
        F.col("distance").cast("long").alias("distance"),
        "span_tokens",
        F.md5(
            F.array_join(
                F.slice("words", F.col("start_early") + 1,
                        F.col("span_tokens")),
                " ",
            )
        ).alias("span_md5"),
    )


def duplicated_spans_incremental(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 6,
    min_tokens: int = 8,
    max_gram_freq: int = 50,
    use_hashed_grams: bool = False,
    hot_broadcast_limit: int | None = DEFAULT_HOT_BROADCAST_LIMIT,
) -> DataFrame:
    """Incremental ExactSubstr: duplicated spans between an INGEST
    BATCH and an existing corpus only (never corpus x corpus) — the
    asymmetric new-vs-old shape of dedup_incremental_against_corpus,
    so per-batch cost scales with the batch, not the corpus.  The
    frequency cap is computed over corpus + batch grams together (the
    stop-gram list is a corpus artifact at scale).  Returns spans with
    doc_a = corpus doc, doc_b = batch doc, same columns/semantics as
    :func:`duplicated_spans`."""
    corpus_grams = _maybe_hash_grams(
        kgram_positions(corpus_df, id_col, text_col, k), use_hashed_grams
    )
    new_grams = _maybe_hash_grams(
        kgram_positions(new_df, id_col, text_col, k), use_hashed_grams
    )
    hot = (
        corpus_grams.unionAll(new_grams)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > max_gram_freq)
        .select("gram")
    )
    # the two anti-joins share one persisted census: Spark's cache
    # manager dedupes on the canonicalized plan, so the guard count
    # runs the census once
    a = _anti_join_hot(corpus_grams, hot, "gram", hot_broadcast_limit).select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "gram"
    )
    b = _anti_join_hot(new_grams, hot, "gram", hot_broadcast_limit).select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "gram"
    )
    pairs = a.join(b, "gram").withColumn(
        "diag", F.col("pos_a") - F.col("pos_b")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    runs = pairs.withColumn("isl", F.col("pos_a") - F.row_number().over(w))
    spans = (
        runs.groupBy("doc_a", "doc_b", "diag", "isl")
        .agg(
            F.min("pos_a").cast("long").alias("start_a"),
            F.min("pos_b").cast("long").alias("start_b"),
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_tokens)
        .drop("diag", "isl")
    )
    docs_a = corpus_df.select(
        F.col(id_col).alias("doc_a"), F.split(text_col, " ").alias("words")
    )
    return spans.join(docs_a, "doc_a").select(
        "doc_a",
        "doc_b",
        "start_a",
        "start_b",
        "span_tokens",
        F.md5(
            F.array_join(
                F.slice("words", F.col("start_a") + 1, F.col("span_tokens")),
                " ",
            )
        ).alias("span_md5"),
    )
