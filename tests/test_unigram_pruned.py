"""Published unigram trainer goldens (Kudo 2018 §3.2/4.2: soft-EM +
likelihood-loss vocabulary pruning) — the test_unigram.py strategy:

- E-step law: per-word expected counts match brute-force enumeration
  over ALL segmentations (the forward-backward identity), on crafted
  words;
- trainer: exact model equality against an INDEPENDENT outer-loop
  reference (own seeding, own M-step arithmetic, own loss computation
  with a top-down memoized Viterbi scorer) on the real sf corpus. The
  per-word soft E-step (ug.expected_counts_py) is the DECLARED shared
  float boundary — word-bounded floats quantized to 9dp before any
  aggregation — so the reference re-derives everything downstream of
  it and must land on bit-identical decimals;
- driver tier == distributed tier (the bpe path-equality pin);
- pruning law goldens: a redundant piece is pruned, a load-bearing one
  survives; single chars are never pruned;
- the frozen artifact's provenance (trained on sf0.001 with the
  documented hyperparameters);
- bake-off sanity: the pruned tokenizer's fertility beats the
  fixed-vocab hard-EM tokenizer at equal vocab size on the sf corpus
  (the reason the published algorithm exists).
"""

from __future__ import annotations

from decimal import Decimal
from functools import lru_cache
from math import exp, log

import pytest

from event_stream_starter_spark.operators import unigram as ug


# --- E-step law: forward-backward == enumeration ------------------------------


def _enumerate_counts(word: str, scores: dict[str, Decimal], max_len: int):
    """Brute-force expected counts: enumerate every segmentation, weight
    by its probability. Exponential — crafted short words only."""
    segs: list[tuple[float, list[str]]] = []

    def walk(i: int, acc: float, pieces: list[str]):
        if i == len(word):
            segs.append((acc, pieces))
            return
        for piece_len in range(1, min(max_len, len(word) - i) + 1):
            p = word[i : i + piece_len]
            s = scores.get(p)
            if s is None and piece_len == 1:
                s = ug.UNK_LOGP
            if s is not None:
                walk(i + piece_len, acc + float(s), pieces + [p])

    walk(0, 0.0, [])
    z = sum(exp(lp) for lp, _ in segs)
    out: dict[str, float] = {}
    for lp, pieces in segs:
        w = exp(lp) / z
        for p in pieces:
            if p in scores:
                out[p] = out.get(p, 0.0) + w
    return out


def test_expected_counts_match_enumeration():
    scores = {
        "a": Decimal("-1.200000000"),
        "ab": Decimal("-1.000000000"),
        "b": Decimal("-2.000000000"),
        "ba": Decimal("-1.500000000"),
        "abab": Decimal("-2.500000000"),
    }
    for word in ["abab", "aabb", "ababab", "ba"]:
        got = ug.expected_counts_py(word, scores, 4)
        want = _enumerate_counts(word, scores, 4)
        assert set(got) == set(want)
        for p in want:
            assert got[p] == pytest.approx(want[p], abs=1e-9), (word, p)


def test_unk_chars_complete_lattice_but_collect_no_mass():
    scores = {"a": Decimal("-1.000000000")}
    got = ug.expected_counts_py("axa", scores, 2)
    assert set(got) == {"a"}
    assert got["a"] == pytest.approx(2.0, abs=1e-12)


# --- independent outer-loop reference ------------------------------------------


def _ref_viterbi_score(word: str, scores: dict[str, Decimal], max_len: int):
    """Top-down memoized best path score (different shape from the
    operator's bottom-up list DP)."""

    @lru_cache(maxsize=None)
    def best(i: int) -> Decimal:
        if i == 0:
            return Decimal(0)
        out = None
        for piece_len in range(1, min(max_len, i) + 1):
            p = word[i - piece_len : i]
            s = scores.get(p)
            if s is None and piece_len == 1:
                s = ug.UNK_LOGP
            if s is None:
                continue
            cand = best(i - piece_len) + s
            if out is None or cand > out:
                out = cand
        return out

    return best(len(word))


def _ref_viterbi_pieces(word: str, scores: dict[str, Decimal], max_len: int):
    @lru_cache(maxsize=None)
    def best(i: int):
        if i == 0:
            return (Decimal(0), ())
        out = None
        for piece_len in range(1, min(max_len, i) + 1):
            p = word[i - piece_len : i]
            s = scores.get(p)
            if s is None and piece_len == 1:
                s = ug.UNK_LOGP
            if s is None:
                continue
            prev = best(i - piece_len)
            cand = (prev[0] + s, piece_len, prev[1] + (p,))
            if out is None or (cand[0], cand[1]) > (out[0], out[1]):
                out = cand
        return (out[0], out[2])

    return list(best(len(word))[1])


def _ref_train_pruned(
    word_counts, vocab_size, max_len, seed_factor, em_iters_per_round
):
    """Independent reference: re-derives seeding, soft-count
    aggregation, M-step, Viterbi frequencies, loss ranking and the
    shrink loop from the published algorithm. Shares ONLY the per-word
    E-step float boundary (ug.expected_counts_py) and the 9dp quantum."""
    q9 = lambda x: Decimal(x).quantize(Decimal("0.000000001"))  # noqa: E731

    singles = sorted({ch for w, _ in word_counts for ch in w})
    sub: dict[str, int] = {}
    for w, c in word_counts:
        for piece_len in range(2, max_len + 1):
            for i in range(len(w) - piece_len + 1):
                sub[w[i : i + piece_len]] = sub.get(w[i : i + piece_len], 0) + c
    seed_size = seed_factor * vocab_size
    multi_sorted = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))
    pieces = singles + [
        p for p, _ in multi_sorted[: max(seed_size - len(singles), 0)]
    ]

    seed_counts: dict[str, int] = dict(sub)
    for w, c in word_counts:
        for ch in w:
            seed_counts[ch] = seed_counts.get(ch, 0) + c

    def mstep_int(counts):
        total = sum(counts.get(p, 0) for p in pieces) + len(pieces)
        return {p: q9(log((counts.get(p, 0) + 1) / total)) for p in pieces}

    def mstep_dec(counts):
        total = sum(
            (counts.get(p, Decimal(0)) for p in pieces), Decimal(0)
        ) + len(pieces)
        return {
            p: q9(log(float(counts.get(p, Decimal(0)) + 1) / float(total)))
            for p in pieces
        }

    scores = mstep_int(seed_counts)
    target_multi = max(vocab_size - len(singles), 0)
    while True:
        for _ in range(em_iters_per_round):
            agg: dict[str, Decimal] = {}
            for w, c in word_counts:
                for p, e in ug.expected_counts_py(w, scores, max_len).items():
                    agg[p] = agg.get(p, Decimal(0)) + q9(c * e)
            scores = mstep_dec(agg)
        multi = [p for p in pieces if len(p) > 1]
        if len(multi) <= target_multi:
            break
        freq: dict[str, int] = {}
        for w, c in word_counts:
            for p in _ref_viterbi_pieces(w, scores, max_len):
                freq[p] = freq.get(p, 0) + c
        losses = {}
        for p in multi:
            f = freq.get(p, 0)
            if f == 0:
                losses[p] = Decimal(0)
            else:
                rest = {k: v for k, v in scores.items() if k != p}
                losses[p] = f * (
                    scores[p] - _ref_viterbi_score(p, rest, max_len)
                )
        keep_n = max(target_multi, int(len(multi) * Decimal("0.75")))
        if keep_n >= len(multi):
            keep_n = target_multi
        kept = sorted(multi, key=lambda p: (-losses[p], p))[:keep_n]
        pieces = sorted(singles) + sorted(kept)
        scores = {p: scores[p] for p in pieces}
    return sorted(scores.items())


def _word_counts(spark, sf_dir):
    import pyspark.sql.functions as F

    from event_stream_starter_spark.io import load_table
    from event_stream_starter_spark.operators import textan

    rows = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(textan.tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def test_pruned_trainer_matches_independent_reference(spark, sf_dir):
    wc = _word_counts(spark, sf_dir)
    want = _ref_train_pruned(
        wc, vocab_size=48, max_len=4, seed_factor=4, em_iters_per_round=2
    )
    from event_stream_starter_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = ug.train_unigram_pruned(
        docs, vocab_size=48, max_len=4, seed_factor=4, em_iters_per_round=2
    )
    assert got == want


def test_driver_and_distributed_pruned_agree(spark):
    corpus = [
        "the cat sat on the mat",
        "the cat ate the rat and the bat",
        "a bat and a cat can nap",
    ] * 2
    docs = spark.createDataFrame([(t,) for t in corpus], "text string")
    kw = dict(vocab_size=16, max_len=3, seed_factor=3, em_iters_per_round=2)
    m_driver = ug.train_unigram_pruned(docs, **kw)
    m_dist = ug.train_unigram_pruned(docs, small_vocab_limit=0, **kw)
    assert m_driver == m_dist
    assert len(m_driver) == 16


def test_frozen_pruned_artifact_provenance(spark):
    """_FROZEN_UNIGRAM_PRUNED is exactly train_unigram_pruned on
    sf0.001 with the documented hyperparameters."""
    from event_stream_starter_spark.io import load_table
    from event_stream_starter_spark.queries.tokenizer import (
        _FROZEN_UNIGRAM_PRUNED,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = ug.train_unigram_pruned(
        docs, vocab_size=48, max_len=4, seed_factor=4, em_iters_per_round=2
    )
    assert got == _FROZEN_UNIGRAM_PRUNED


# --- pruning law goldens --------------------------------------------------------


def test_pruning_keeps_singles_and_load_bearing_pieces(spark):
    """'cat' dominates the corpus — it must survive pruning to a tiny
    multi budget; every corpus character survives as a single."""
    corpus = ["cat cat cat cat cat dog", "cat cat cat zebra"] * 3
    docs = spark.createDataFrame([(t,) for t in corpus], "text string")
    chars = sorted({ch for t in corpus for ch in t if ch != " "})
    model = ug.train_unigram_pruned(
        docs, vocab_size=len(chars) + 2, max_len=3, seed_factor=6,
        em_iters_per_round=2,
    )
    got = {p for p, _ in model}
    assert set(chars) <= got  # singles never pruned
    multi = {p for p in got if len(p) > 1}
    assert len(multi) <= 2
    assert "cat" in multi or ("ca" in multi and "at" in multi)


def test_unused_pieces_prune_first():
    """_prune_losses gives freq-0 pieces loss 0 — strictly below any
    used piece's positive loss."""
    scores = {
        "a": Decimal("-2.000000000"),
        "b": Decimal("-2.000000000"),
        "ab": Decimal("-1.000000000"),
        "ba": Decimal("-9.000000000"),  # never on a Viterbi path
    }
    freq = {"ab": 10, "a": 3, "b": 3}
    losses = ug._prune_losses(scores, freq, ["ab", "ba"], 2)
    assert losses["ba"] == Decimal(0)
    # removing 'ab' forces a+b: loss = 10 * (-1 - (-4)) = 30
    assert losses["ab"] == Decimal("30.000000000")
    assert losses["ab"] > losses["ba"]


def test_bakeoff_pruned_beats_fixed_vocab(spark, sf_dir):
    """The published algorithm's point: at equal vocab size the pruned
    model segments with strictly lower fertility than the fixed-vocab
    hard-EM model, and the bake-off row stays sane."""
    from event_stream_starter_spark.queries import all_queries

    rows = all_queries()["x_tokenizer_fertility_compare"].fn(
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r["unigram_pruned_fertility"] >= 1.0
        assert r["unigram_pruned_pieces"] > 0
        assert r["unigram_pruned_fertility"] < r["unigram_fertility"]
