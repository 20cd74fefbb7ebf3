"""Unigram-LM tokenizer: the Spark EM trainer and encoder are pinned
bit-exact against an INDEPENDENT pure-Python reference implementing
the same published algorithm (Kudo 2018, hard-EM variant) with the
same deterministic tie rules."""

import math
from collections import Counter

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
VOCAB_SIZE = 64
N_EM = 3
MAX_LEN = 4


def _word_counts() -> Counter:
    text = pq.read_table(
        SF_DIR + "/documents.parquet", columns=["text"])
    wc: Counter = Counter()
    for t in text["text"].to_pylist():
        for w in t.split(" "):
            if w:
                wc[w] += 1
    return wc


def _ref_viterbi(word: str, logp: dict) -> list:
    """Reference decoder: DP over end positions, last-piece lengths
    tried short-to-long, strictly-greater replacement."""
    n = len(word)
    best = [float("-inf")] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for ln in range(1, min(MAX_LEN, i) + 1):
            lp = logp.get(word[i - ln:i])
            if lp is None:
                continue
            if best[i - ln] + lp > best[i]:
                best[i] = best[i - ln] + lp
                back[i] = ln
    assert best[n] > float("-inf"), word
    out = []
    i = n
    while i:
        out.append(word[i - back[i]:i])
        i -= back[i]
    return out[::-1]


def _ref_train(wc: Counter):
    """Reference trainer: substring seeding -> hard-EM with
    driver-float M-step and zero-mass pruning (singles immune)."""
    seed: Counter = Counter()
    for w, fq in wc.items():
        for ln in range(1, MAX_LEN + 1):
            for i in range(len(w) - ln + 1):
                seed[w[i:i + ln]] += fq
    ranked = sorted(seed.items(), key=lambda t: (-t[1], t[0]))
    ranked = ranked[:4 * VOCAB_SIZE]
    singles = {p: c for p, c in ranked if len(p) == 1}
    multi = [(p, c) for p, c in ranked if len(p) > 1]
    counts = dict(singles)
    counts.update(dict(multi[:max(0, VOCAB_SIZE - len(singles))]))

    def m_step(cnts):
        total = sum(cnts.values())
        return {p: math.log(c) - math.log(total)
                for p, c in cnts.items() if c > 0}

    logp = m_step(counts)
    em_counts = dict(counts)
    for _ in range(N_EM):
        em: Counter = Counter()
        for w, fq in wc.items():
            for p in _ref_viterbi(w, logp):
                em[p] += fq
        em_counts = dict(em)
        for p in list(logp):
            if len(p) == 1 and p not in em_counts:
                em_counts[p] = 0
        kept = {p: c for p, c in em_counts.items()
                if c > 0 or len(p) == 1}
        logp = m_step({p: max(c, 1) if len(p) == 1 else c
                       for p, c in kept.items()})
        em_counts = kept
    return sorted(((p, logp[p], em_counts.get(p, 0))
                   for p in logp), key=lambda t: (-t[2], t[0]))


@pytest.fixture(scope="module")
def ref_model():
    return _ref_train(_word_counts())


def test_viterbi_tie_rule():
    """Exact ties keep the FIRST (short-to-long scan) candidate —
    the rule both implementations share."""
    from health_monitor_cc_flink_spark.registry_pipeline_ops import (
        unigram_viterbi,
    )

    logp = {"a": -1.0, "b": -1.0, "ab": -2.0}
    # "ab" via single chars scores -2.0; piece "ab" also -2.0.
    # i=2: ln=1 ('b') found first -> strictly-greater fails for
    # ln=2 -> singles win
    assert unigram_viterbi("ab", logp, 4) == ["a", "b"]
    assert _ref_viterbi("ab", logp) == ["a", "b"]
    # a genuinely better long piece wins
    logp2 = {"a": -1.0, "b": -1.0, "ab": -1.5}
    assert unigram_viterbi("ab", logp2, 4) == ["ab"]
    assert _ref_viterbi("ab", logp2) == ["ab"]
    with pytest.raises(ValueError):
        unigram_viterbi("ax", {"a": -1.0}, 4)


def test_trainer_parity_bit_exact(spark, ref_model):
    """The distributed trainer reproduces the reference piece table
    EXACTLY: same pieces, same order, same EM counts, same
    micro-scaled log-probs (driver-float M-step both sides)."""
    from health_monitor_cc_flink_spark.registry_pipeline_ops import (
        unigram_train_pieces,
    )

    rows = unigram_train_pieces(
        spark, SF_DIR, VOCAB_SIZE, N_EM).collect()
    got = [(r.piece, r.em_count, r.logp_micro) for r in rows]
    want = [(p, c, int(round(lp * 1_000_000)))
            for p, lp, c in ref_model]
    assert got == want
    # structural properties: singles immune, multis carry mass
    singles = {p for p, _, _ in got if len(p) == 1}
    corpus_chars = set()
    for w in _word_counts():
        corpus_chars |= set(w)
    assert corpus_chars <= singles
    assert all(c > 0 for p, c, _ in got if len(p) > 1)


def test_encoder_parity(spark, ref_model):
    """Per-document token counts match the reference encoder under
    the reference model."""
    from health_monitor_cc_flink_spark.registry_pipeline_ops import (
        unigram_encode_docs,
    )

    logp = {p: lp for p, lp, _ in ref_model}
    text = pq.read_table(
        SF_DIR + "/documents.parquet",
        columns=["doc_id", "text"])
    want = {}
    for did, t in zip(text["doc_id"].to_pylist(),
                      text["text"].to_pylist()):
        words = [w for w in t.split(" ") if w]
        want[did] = (
            len(words),
            sum(len(w) for w in words),
            sum(len(_ref_viterbi(w, logp)) for w in words),
        )
    rows = unigram_encode_docs(
        spark, SF_DIR, VOCAB_SIZE, N_EM).collect()
    assert len(rows) == len(want)
    for r in rows:
        nw, nc, nu = want[r.doc_id]
        assert (r.n_words, r.n_char_tokens,
                r.n_unigram_tokens) == (nw, nc, nu), r.doc_id
        assert r.tokens_saved == nc - nu
