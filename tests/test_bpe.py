"""Pin the distributed BPE merge trainer (`bpe_train_merges`) against a
pure-Python reference implementation of the same algorithm: word-frequency
pre-aggregation, overlapping adjacent-pair counts weighted by word frequency,
argmax with (count desc, left asc, right asc) tie-break, left-to-right
non-overlapping merge application.  This is the dedicated test that backs the
rows-only driver row (iterative argmax training is not one SQL statement)."""

import collections

import pyarrow.parquet as pq

from health_monitor_cc_flink_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"
N_MERGES = 8


def _reference_bpe(texts, n_merges):
    wc = collections.Counter(w for t in texts for w in t.split(" ") if w != "")
    vocab = {w: list(w) for w in wc}
    merges = []
    for rank in range(n_merges):
        pair_counts = collections.Counter()
        for w, syms in vocab.items():
            f = wc[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        (l, r), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _encode_word(word, merges):
    syms = list(word)
    for _, l, r, _cnt in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_merges_match_reference(spark):
    spec = {s.name: s for s in all_queries()}["bpe_train_merges"]
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in spec.fn(spark, SF_DIR).collect()
    ]
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    want = _reference_bpe(texts, N_MERGES)
    assert got == want
    # second-order merges (a learned symbol reused as a merge operand) must be
    # reachable — otherwise the iteration isn't actually feeding back
    assert len(got) == N_MERGES


def test_bpe_encode_matches_reference(spark):
    specs = {s.name: s for s in all_queries()}
    texts = pq.read_table(f"{SF_DIR}/documents.parquet")
    doc_ids = texts["doc_id"].to_pylist()
    doc_texts = texts["text"].to_pylist()
    merges = _reference_bpe(doc_texts, N_MERGES)

    want = {}
    for did, t in zip(doc_ids, doc_texts):
        words = [w for w in t.split(" ") if w != ""]
        n_char = sum(len(w) for w in words)
        n_bpe = sum(len(_encode_word(w, merges)) for w in words)
        want[did] = (len(words), n_char, n_bpe, n_char - n_bpe)

    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_char_tokens"],
            r["n_bpe_tokens"],
            r["tokens_saved"],
        )
        for r in specs["bpe_encode_docs"].fn(spark, SF_DIR).collect()
    }
    assert got == want
    # merges must actually compress — otherwise the fold chain is a no-op
    assert sum(v[3] for v in got.values()) > 0


def test_bpe_merge_fold_adversarial_words(spark):
    """The native fold must implement left-to-right NON-OVERLAPPING merging
    exactly: 'aaa' + (a,a) -> [aa, a] (the merged token never re-merges with
    the following operand), multi-merges, unicode, and 1-char words."""
    from pyspark.sql import functions as F

    from health_monitor_cc_flink_spark.registry_pipeline_ops import _bpe_merge_fold

    words = ["aaa", "aaaa", "abab", "aab", "baa", "a", "", "ü", "üü", "xaay"]
    df = spark.createDataFrame([(w,) for w in words], "word string").select(
        "word", F.expr("filter(split(word, ''), s -> s <> '')").alias("syms")
    )
    for l, r in [("a", "a"), ("ü", "ü")]:
        got = {
            row["word"]: row["merged"]
            for row in df.select(
                "word", _bpe_merge_fold(l, r).alias("merged")
            ).collect()
        }
        for w in words:
            syms = [c for c in w]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            assert got[w] == out, (l, r, w, got[w], out)
