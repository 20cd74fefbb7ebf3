"""Planted-duplicate recall: the near-dup operators must actually FIND
duplicates, not just compute deterministically.  A synthetic corpus with
known mutated copies pins recall/precision behavior."""

import pytest
from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash16,
)

# ~40 tokens per doc: a one-token mutation keeps shingle-Jaccard ≈ 0.85,
# where 16-hash/4-row LSH banding has ≳95% candidate probability —
# matching the operator's design point (high-similarity near-dups).
def _fill(tag: str) -> str:
    # distinct per-doc filler so base docs share no shingles with each other
    return " ".join(f"{tag}{i}" for i in range(28))


BASE_DOCS = [
    f"the quick brown fox jumps over the lazy dog near the quiet river bank today {_fill('ax')}",
    f"spark executes declarative query plans with catalyst optimizer and tungsten engine runtime {_fill('bx')}",
    f"large scale training data pipelines require careful deduplication and quality filtering stages {_fill('cx')}",
    f"streaming window aggregation with watermarks handles late arriving events in append mode {_fill('dx')}",
    f"minhash signatures approximate jaccard similarity between shingled documents very efficiently {_fill('ex')}",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    doc_id = 0
    for i, text in enumerate(BASE_DOCS):
        rows.append((doc_id, text)); doc_id += 1
        # near-dup: one token changed
        toks = text.split(" ")
        toks[3] = "MUTATED"
        rows.append((doc_id, " ".join(toks))); doc_id += 1
    # unrelated filler
    for j in range(20):
        rows.append((doc_id, f"completely unrelated filler document number {j} with random extra words alpha beta gamma delta")); doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_minhash_lsh_finds_planted_pairs(corpus):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(corpus, "doc_id", "text").collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(len(BASE_DOCS))}
    found = planted & pairs
    assert len(found) >= 4, f"LSH recall too low: found {found}"
    # precision: no pair between unrelated base docs
    cross_base = {(a, b) for a in (0, 2, 4, 6, 8) for b in (0, 2, 4, 6, 8) if a < b}
    assert not (pairs & cross_base)


def test_ngram_jaccard_ranks_planted_pairs_highest(corpus):
    rows = ngram_jaccard_pairs(corpus, "doc_id", "text", min_common=2).collect()
    jac = {
        (r.doc_a, r.doc_b): r.n_common / (r.n_a + r.n_b - r.n_common) for r in rows
    }
    planted = {(2 * i, 2 * i + 1) for i in range(len(BASE_DOCS))}
    for p in planted:
        assert p in jac and jac[p] > 0.7, f"planted pair {p} missing/weak: {jac.get(p)}"
    others = [v for k, v in jac.items() if k not in planted]
    assert all(v < min(jac[p] for p in planted) for v in others)


def test_simhash_close_for_planted_pairs(corpus):
    out = simhash16(corpus, "doc_id", "text")
    # the oracle declares BIGINT; the single-aggregation rewrite must not
    # narrow the sketch column to INT (driver schema gate)
    assert out.schema["simhash"].dataType.typeName() == "long"
    sh = {r.doc_id: r.simhash for r in out.collect()}
    for i in range(len(BASE_DOCS)):
        a, b = sh[2 * i], sh[2 * i + 1]
        assert bin(a ^ b).count("1") <= 6  # one-token mutation ⇒ few flipped bits


def test_clusters_group_planted_duplicates(spark, corpus):
    pairs = minhash_lsh_pairs(corpus, "doc_id", "text").select("doc_a", "doc_b")
    clusters = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    grouped = sum(
        1
        for i in range(len(BASE_DOCS))
        if clusters.get(2 * i) is not None
        and clusters.get(2 * i) == clusters.get(2 * i + 1)
    )
    assert grouped >= 4


@pytest.mark.parametrize("n_hashes,rows_per_band", [(8, 4), (16, 4), (32, 4), (32, 8)])
def test_minhash_config_sweep(corpus, n_hashes, rows_per_band):
    """Recall/estimate behavior across permutation counts and band widths
    (the tuning knobs of the LSH S-curve): every config must keep finding
    the planted one-token mutations, the Jaccard estimate n_match/n_hashes
    must sit in a sane band for them, and wider bands (higher rows_per_band)
    must not ADD candidates (banding only gets stricter)."""
    pairs = {
        (r.doc_a, r.doc_b): r.n_match
        for r in minhash_lsh_pairs(
            corpus, "doc_id", "text", n_hashes=n_hashes, rows_per_band=rows_per_band
        ).collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(len(BASE_DOCS))}
    found = planted & set(pairs)
    floor = 3 if rows_per_band == 8 else 4
    assert len(found) >= floor, f"{n_hashes}x{rows_per_band}: found only {found}"
    for p in found:
        est = pairs[p] / n_hashes
        assert est >= 0.5, f"planted pair {p} estimate {est} too low"
    cross_base = {(a, b) for a in (0, 2, 4, 6, 8) for b in (0, 2, 4, 6, 8) if a < b}
    assert not (set(pairs) & cross_base)


def test_minhash_more_bands_superset_of_stricter(corpus):
    """rows_per_band=8 candidates must be a subset of rows_per_band=4's
    (every 8-row band agreement contains two 4-row band agreements)."""
    loose = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(corpus, "doc_id", "text", n_hashes=32, rows_per_band=4).collect()
    }
    strict = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(corpus, "doc_id", "text", n_hashes=32, rows_per_band=8).collect()
    }
    assert strict <= loose


def test_minhash_parameter_sweep(corpus):
    """The (n_hashes, rows_per_band) config sweep (roadmap item): the
    threshold curve P(candidate) = 1-(1-s^r)^b must show up in the
    measured candidate sets — looser bands (smaller r) admit at least
    as many candidates as stricter ones, the shipped design point
    (16, 4) finds every planted pair with zero false candidates, and
    everything is deterministic (md5 hash family), so these are exact
    assertions, not statistical ones."""
    planted = {(2 * i, 2 * i + 1) for i in range(5)}

    def candidates(n_hashes, rows_per_band):
        return {
            (r.doc_a, r.doc_b)
            for r in minhash_lsh_pairs(
                corpus, "doc_id", "text", k=3,
                n_hashes=n_hashes, rows_per_band=rows_per_band,
            ).collect()
        }

    loose = candidates(8, 2)     # b=4 bands of 2 rows: most permissive
    design = candidates(16, 4)   # shipped config: b=4 bands of 4 rows
    strict = candidates(32, 8)   # b=4 bands of 8 rows: most selective

    assert design & planted == planted, "design point must find all planted pairs"
    # the filler docs differ by one token from EACH OTHER (true near-dups),
    # so false-positive accounting is over the 10 base/mutated docs only
    base_pairs = {(a, b) for (a, b) in design if a < 10 and b < 10}
    assert base_pairs == planted, "design point admits no false base-doc candidates"
    assert planted <= loose, "loosening bands must not lose planted pairs"
    assert strict <= loose | planted | design or len(strict) <= len(loose), (
        "stricter bands must not admit more candidates than looser ones"
    )
    assert len(strict) <= len(design) <= len(loose)


def test_shingles_k1_and_band_edge_cases(spark):
    """Review fixes: k=1 (unigram) shingles work; a signature shorter
    than one band yields no band rows instead of a negative-index
    garbage band; non-divisible banding configs are rejected loudly."""
    from pyspark.sql import functions as F

    from health_monitor_cc_flink_spark.operators.dedup import (
        lsh_bands_from_arrays,
        minhash_lsh_pairs,
        shingles,
    )

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "b c d")], "doc_id long, text string"
    )
    uni = {(r.doc_id, r.shingle) for r in shingles(docs, "doc_id", "text", k=1).collect()}
    assert uni == {(0, "a"), (0, "b"), (0, "c"), (1, "b"), (1, "c"), (1, "d")}

    sigs = spark.createDataFrame([(0, [1, 2, 3])], "doc_id long, sig array<bigint>")
    assert lsh_bands_from_arrays(sigs, "doc_id", rows_per_band=4).count() == 0
    ok = lsh_bands_from_arrays(sigs, "doc_id", rows_per_band=3).collect()
    assert [(r.band, r.band_key) for r in ok] == [(0, "1|2|3")]

    with pytest.raises(ValueError, match="multiple of rows_per_band"):
        minhash_lsh_pairs(docs, "doc_id", "text", n_hashes=16, rows_per_band=5)


def test_connected_components_raises_instead_of_splitting(spark):
    """A chain whose diameter exceeds max_iters must raise, not silently
    report one component as several clusters."""
    from health_monitor_cc_flink_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=2)
    # and with enough rounds the same chain is ONE component
    labels = {r.node: r.cluster_id for r in connected_components(chain).collect()}
    assert set(labels.values()) == {0}


def test_ngram_jaccard_sizes_consistent_under_stop_shingle_filter(spark):
    """With max_doc_freq, n_a/n_b count the FILTERED shingle sets so the
    jaccard triple is internally consistent."""
    from health_monitor_cc_flink_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingles,
    )

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat today ok"),
            (1, "the cat sat on the rug today ok"),
            (2, "the cat sat on a box today ok"),
        ],
        "doc_id long, text string",
    )
    rows = ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, min_common=1, max_doc_freq=2
    ).collect()
    # expected sizes: per-doc count of shingles appearing in <= 2 docs
    sh = shingles(docs, "doc_id", "text", k=3)
    from pyspark.sql import functions as F

    freq = sh.groupBy("shingle").agg(F.count("*").alias("df_"))
    filt_sizes = {
        r.doc_id: r.n
        for r in sh.join(freq.filter(F.col("df_") <= 2), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n_a == filt_sizes[r.doc_a] and r.n_b == filt_sizes[r.doc_b]
        assert r.n_common <= min(r.n_a, r.n_b)  # consistency of the triple


def test_duplicated_spans_planted_recall(spark):
    """ExactSubstr-style span dedup: every planted cross-doc span of
    >= min_tokens must be recovered EXACTLY (position + maximal length),
    and no span may be reported where none was planted."""
    import hashlib

    from health_monitor_cc_flink_spark.operators.dedup import duplicated_spans
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    docs = spark.createDataFrame(
        [
            # doc 0: shared span at token offset 2
            (0, "x0 y0 " + shared + " z0 w0"),
            # doc 1: the same 10-token span at offset 0
            (1, shared + " q1 r1 s1"),
            # doc 2: a DIFFERENT 7-token overlap with doc 3
            (2, "m2 n2 one two three four five six seven p2"),
            (3, "one two three four five six seven k3 l3 j3"),
            # doc 4: unique text, must appear in no pair
            (4, "u4 v4 w4 x4 y4 z4 a4 b4 c4 d4"),
        ],
        "doc_id long, text string",
    )
    rows = duplicated_spans(docs, k=6, min_tokens=7, max_gram_freq=50).collect()
    got = {(r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens) for r in rows}
    assert got == {
        (0, 1, 2, 0, 10),   # maximal: the full 10-token shared span
        (2, 3, 2, 0, 7),    # maximal: the 7-token overlap
    }, got
    # the reported md5 is the md5 of the actual span text of doc_a
    by_pair = {(r.doc_a, r.doc_b): r.span_md5 for r in rows}
    assert by_pair[(0, 1)] == hashlib.md5(shared.encode()).hexdigest()
    assert by_pair[(2, 3)] == hashlib.md5(
        b"one two three four five six seven"
    ).hexdigest()


def test_duplicated_spans_stop_gram_cap_and_short_docs(spark):
    """Grams above the global frequency cap must not generate pairs
    (boilerplate suppression), and sub-k-token docs are skipped, not
    crashed (F.sequence would otherwise go descending)."""
    from health_monitor_cc_flink_spark.operators.dedup import duplicated_spans
    boiler = "the same six token header here"
    docs = spark.createDataFrame(
        [(i, boiler + f" tail{i} t{i}") for i in range(6)] + [(99, "too short")],
        "doc_id long, text string",
    )
    # boilerplate gram appears 6x > cap 5 -> dropped -> zero spans
    assert duplicated_spans(docs, k=6, min_tokens=6, max_gram_freq=5).count() == 0
    # raise the cap -> all 15 doc pairs share the 6-token header span
    # (exactly one matching gram position -> run of 1 -> span of k tokens)
    rows = duplicated_spans(docs, k=6, min_tokens=6, max_gram_freq=50).collect()
    assert len(rows) == 15
    assert all(r.span_tokens == 6 and r.start_a == 0 and r.start_b == 0 for r in rows)


def test_duplicated_spans_plan_never_all_pairs(spark):
    """The candidate join must be a gram EQUI-join: no CartesianProduct
    or BroadcastNestedLoopJoin anywhere in the physical plan."""
    from health_monitor_cc_flink_spark.operators.dedup import duplicated_spans
    from health_monitor_cc_flink_spark.sources.testdata import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        duplicated_spans(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_strip_duplicated_spans_keep_first(spark):
    """The apply step removes the HIGHER-id occurrence only, keeps the
    lower, passes untouched docs through, and empties full duplicates."""
    from health_monitor_cc_flink_spark.operators.dedup import (
        strip_duplicated_spans,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (0, "pre0 " + shared + " post0"),
            (1, shared + " tail1 tail2"),     # copy at offset 0 -> stripped
            (2, shared),                      # exact full duplicate -> empty
            (3, "u3 v3 w3 x3 y3 z3 a3 b3"),   # unique -> untouched
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in strip_duplicated_spans(
        docs, k=6, min_tokens=8, max_gram_freq=50).collect()}
    assert len(rows) == 4
    # doc 0 is the keeper: nothing removed
    assert rows[0].n_removed == 0
    assert rows[0].text_clean == "pre0 " + shared + " post0"
    # doc 1 loses exactly the 8 shared tokens, keeps its tail
    assert rows[1].n_removed == 8
    assert rows[1].text_clean == "tail1 tail2"
    # doc 2 is fully covered
    assert rows[2].n_removed == 8 and rows[2].text_clean == ""
    # doc 3 untouched
    assert rows[3].n_removed == 0
    assert rows[3].text_clean == "u3 v3 w3 x3 y3 z3 a3 b3"
    assert all(r.n_tokens - r.n_removed ==
               (len(r.text_clean.split()) if r.text_clean else 0)
               for r in rows.values())


def test_repeated_spans_within_doc_tandem(spark):
    """Intra-doc spans: simple repeats at the right distance, tandem
    (overlapping) repeats included, and unique docs produce nothing."""
    from health_monitor_cc_flink_spark.operators.dedup import (
        repeated_spans_within_doc,
    )

    docs = spark.createDataFrame(
        [
            # 'one two three' repeated with junk between: distance 5
            (0, "one two three j0 j1 one two three j2 j3"),
            # tandem: 'ra pa pam' x3 back-to-back -> distances 3 and 6
            (1, "ra pa pam ra pa pam ra pa pam end1 end2"),
            (2, "all unique tokens here nothing repeats at all"),
        ],
        "doc_id long, text string",
    )
    rows = repeated_spans_within_doc(docs, k=3, min_tokens=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(
            (r.start_early, r.start_late, r.distance, r.span_tokens)
        )
    assert by_doc[0] == [(0, 5, 5, 3)]
    # doc 1: distance 3 run covers positions 3..6 (late) -> 6-token span
    # starting early=0; distance 6 run -> 3-token span
    assert set(by_doc[1]) == {(0, 3, 3, 6), (0, 6, 6, 3)}, by_doc[1]
    assert 2 not in by_doc


def test_duplicated_spans_incremental_asymmetric(spark):
    """Incremental spans: batch-vs-corpus pairs only — corpus-internal
    and batch-internal duplicates must NOT appear."""
    from health_monitor_cc_flink_spark.operators.dedup import (
        duplicated_spans_incremental,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    corpus = spark.createDataFrame(
        [
            (0, shared + " c0 c1"),
            (1, shared + " c2 c3"),   # corpus-internal dup of doc 0
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "b0 " + shared + " b1"),
            (11, "b2 " + shared + " b3"),  # batch-internal dup of doc 10
            (12, "totally fresh batch document nothing shared here ok"),
        ],
        "doc_id long, text string",
    )
    rows = duplicated_spans_incremental(batch, corpus, k=6, min_tokens=8).collect()
    pairs = {(r.doc_a, r.doc_b) for r in rows}
    assert pairs == {(0, 10), (0, 11), (1, 10), (1, 11)}, pairs
    assert all(r.span_tokens == 8 and r.start_b == 1 for r in rows)


def test_span_dedup_guard_and_hashed_paths_identical(spark):
    """The stop-gram size guard (hot_broadcast_limit=0 forces the
    shuffle anti-join fallback) and the xxhash64 narrow-shuffle
    variant must produce spans identical to the string/broadcast
    default, across the whole family."""
    from health_monitor_cc_flink_spark.operators.dedup import (
        duplicated_spans,
        duplicated_spans_incremental,
        repeated_spans_within_doc,
        strip_duplicated_spans,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs far "
            "away home tonight"),
        (2, "a b c the quick brown fox jumps over the lazy dog and runs "
            "far x y z"),
        (3, "common common common common words only here nothing shared "
            "with others at all"),
        (4, "unrelated text entirely different tokens everywhere zebra "
            "yak xylophone walrus vulture"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    variants = (
        dict(),                                            # broadcast+string
        dict(hot_broadcast_limit=0),                       # forced fallback
        dict(use_hashed_grams=True),                       # narrow shuffle
        dict(use_hashed_grams=True, hot_broadcast_limit=0),
        dict(hot_broadcast_limit=None),                    # pre-guard path
    )
    outs = [sorted(map(tuple, duplicated_spans(df, **kw).collect()))
            for kw in variants]
    assert len(outs[0]) > 0
    assert all(o == outs[0] for o in outs[1:])

    strips = [sorted(map(tuple, strip_duplicated_spans(df, **kw).collect()))
              for kw in (dict(), dict(use_hashed_grams=True,
                                      hot_broadcast_limit=0))]
    assert strips[0] == strips[1]

    doubled = df.selectExpr("doc_id", "concat(text, ' ', text) AS text")
    intra = [sorted(map(tuple, repeated_spans_within_doc(doubled, **kw)
                        .collect()))
             for kw in (dict(), dict(use_hashed_grams=True,
                                     hot_broadcast_limit=0))]
    assert len(intra[0]) > 0 and intra[0] == intra[1]

    new = df.limit(1).selectExpr("doc_id + 100 AS doc_id", "text")
    inc = [sorted(map(tuple,
                      duplicated_spans_incremental(new, df, **kw).collect()))
           for kw in (dict(), dict(use_hashed_grams=True,
                                   hot_broadcast_limit=0))]
    assert len(inc[0]) > 0 and inc[0] == inc[1]


def test_paragraph_dedup_keep_first_semantics(spark):
    from health_monitor_cc_flink_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "alpha beta\n\nshared footer\n\ngamma delta"),
        (2, "shared footer\n\nepsilon zeta"),           # footer dup of doc 1
        (3, "Shared   FOOTER\n\nunique tail"),          # normalized dup
        (4, "\n\n \n\n"),                               # only empty paragraphs
        (5, "alpha beta"),                              # dup of doc 1 para 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert got[1].n_paras == 3 and got[1].n_removed == 0
    assert got[1].text_clean == "alpha beta\n\nshared footer\n\ngamma delta"
    assert got[2].n_paras == 2 and got[2].n_removed == 1
    assert got[2].text_clean == "epsilon zeta"
    # normalization: case/extra-space variant is the SAME paragraph
    assert got[3].n_removed == 1 and got[3].text_clean == "unique tail"
    # whitespace-only docs survive with zero counts
    assert got[4].n_paras == 0 and got[4].text_clean == ""
    assert got[5].n_removed == 1 and got[5].text_clean == ""


def test_bloom_flag_is_sound(spark):
    """_bloom_maybe must be TRUE for every key present in dim (no
    false negatives), so bloom AND exact == exact."""
    from health_monitor_cc_flink_spark.registry_pipeline_ops import _bloom_flag

    dim = spark.range(0, 200).selectExpr("CAST(id * 7 AS STRING) AS k")
    probe = spark.range(0, 600).selectExpr("id", "CAST(id AS STRING) AS k")
    out = _bloom_flag(probe, "k", dim, "k").collect()
    members = {str(i * 7) for i in range(200)}
    for r in out:
        if r.k in members:
            assert r._bloom_maybe, r.k
    # and it prunes SOMETHING (not degenerate all-true)
    assert any(not r._bloom_maybe for r in out)
