"""Unigram LM tokenizer goldens (the test_bpe.py strategy):

- trainer: exact score-for-score equality against an INDEPENDENT
  pure-Python EM reference (recursive memoized Viterbi, different code
  shape from the operator's iterative DP), on the real sf corpus;
- driver tier == distributed tier (the bpe path-equality pin);
- encoder: 3-way agreement (codegen fold == Arrow UDF == python twin)
  PLUS a planted adversarial encoder (greedy longest-match) that the
  agreement law must DISTINGUISH from Viterbi — proving
  x_unigram_encode_cert's law discriminates, not just agrees;
- the frozen artifact's provenance (trained on sf0.001 with the
  documented hyperparameters).
"""

from __future__ import annotations

from decimal import Decimal
from functools import lru_cache
from math import log

import pyspark.sql.functions as F
import pytest

from event_stream_starter_spark.operators import unigram as ug


# --- independent reference implementation ------------------------------------


def _ref_viterbi(word: str, scores: dict[str, Decimal], max_len: int):
    """Recursive memoized best segmentation — same LAW, different code
    shape (top-down instead of the operator's bottom-up DP)."""

    @lru_cache(maxsize=None)
    def best(i: int):  # best (score, pieces tuple) for word[:i]
        if i == 0:
            return (Decimal(0), ())
        out = None
        for piece_len in range(1, min(max_len, i) + 1):
            piece = word[i - piece_len : i]
            s = scores.get(piece)
            if s is None and piece_len == 1:
                s = ug.UNK_LOGP
            if s is None:
                continue
            prev = best(i - piece_len)
            cand = (prev[0] + s, piece_len, prev[1] + (piece,))
            # max score, then LONGER last piece — the operator's law
            if out is None or (cand[0], cand[1]) > (out[0], out[1]):
                out = cand
        return (out[0], out[2])

    return list(best(len(word))[1])


def _ref_train(word_counts, vocab_size, max_len, iters):
    """Independent hard-EM reference trainer."""
    singles = sorted({ch for w, _ in word_counts for ch in w})
    sub: dict[str, int] = {}
    for w, c in word_counts:
        for piece_len in range(2, max_len + 1):
            for i in range(len(w) - piece_len + 1):
                sub[w[i : i + piece_len]] = sub.get(w[i : i + piece_len], 0) + c
    multi = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))
    pieces = singles + [p for p, _ in multi[: max(vocab_size - len(singles), 0)]]

    def mstep(counts):
        total = sum(counts.get(p, 0) for p in pieces) + len(pieces)
        return {
            p: Decimal(log((counts.get(p, 0) + 1) / total)).quantize(
                Decimal("0.000000001")
            )
            for p in pieces
        }

    seed: dict[str, int] = dict(sub)
    for w, c in word_counts:
        for ch in w:
            seed[ch] = seed.get(ch, 0) + c
    scores = mstep({p: seed.get(p, 0) for p in pieces})
    for _ in range(iters):
        counts: dict[str, int] = {}
        for w, c in word_counts:
            for p in _ref_viterbi(w, scores, max_len):
                counts[p] = counts.get(p, 0) + c
        scores = mstep(counts)
    return sorted(scores.items())


def _word_counts(spark, sf_dir):
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


# --- trainer ------------------------------------------------------------------


def test_trainer_matches_independent_reference(spark, sf_dir):
    wc = _word_counts(spark, sf_dir)
    want = _ref_train(wc, vocab_size=48, max_len=4, iters=2)
    from event_stream_starter_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = ug.train_unigram(docs, vocab_size=48, max_len=4, em_iters=2)
    assert got == want


def test_driver_and_distributed_trainers_agree(spark):
    corpus = [
        "the cat sat on the mat",
        "the cat ate the rat and the bat",
        "a bat and a cat can nap",
    ] * 2
    docs = spark.createDataFrame([(t,) for t in corpus], "text string")
    m_driver = ug.train_unigram(docs, vocab_size=20, max_len=3, em_iters=2)
    m_dist = ug.train_unigram(
        docs, vocab_size=20, max_len=3, em_iters=2, small_vocab_limit=0
    )
    assert m_driver == m_dist


def test_frozen_artifact_provenance(spark):
    """_FROZEN_UNIGRAM is exactly train_unigram on sf0.001 with the
    documented hyperparameters — the frozen-model contract."""
    from event_stream_starter_spark.io import load_table
    from event_stream_starter_spark.queries.tokenizer import _FROZEN_UNIGRAM

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = ug.train_unigram(docs, vocab_size=48, max_len=4, em_iters=2)
    assert got == _FROZEN_UNIGRAM


# --- encoder ------------------------------------------------------------------

_TOY = [
    ("a", Decimal("-1.200000000")),
    ("ab", Decimal("-1.000000000")),
    ("b", Decimal("-5.000000000")),
    ("bc", Decimal("-1.200000000")),
    ("c", Decimal("-5.000000000")),
]


def _greedy_longest(word: str, scores: dict[str, Decimal], max_len: int):
    """The PLANTED ADVERSARIAL encoder: greedy longest-match (a common
    wrong implementation of unigram decoding). Must disagree with
    Viterbi on the crafted case below."""
    out, i = [], 0
    while i < len(word):
        for piece_len in range(min(max_len, len(word) - i), 0, -1):
            p = word[i : i + piece_len]
            if p in scores or piece_len == 1:
                out.append(p)
                i += piece_len
                break
    return out


def test_viterbi_beats_greedy_and_agreement_law_discriminates():
    """'abc' under _TOY: greedy takes ab+c (-6.0), Viterbi a+bc (-2.4).
    The adversarial encoder MUST differ — if this assert ever fails the
    agreement cert has lost its power to distinguish a broken tier."""
    table = dict(_TOY)
    vit = ug._viterbi_py("abc", table, 4)
    greedy = _greedy_longest("abc", table, 4)
    assert vit == ["a", "bc"]
    assert greedy == ["ab", "c"]
    assert vit != greedy


def test_three_way_tier_agreement(spark):
    texts = [
        "abc abab cab",
        "the quick brown fox",
        "zürich café",  # chars outside the toy vocab -> UNK law
        "ab\xa0c",  # NBSP is NOT Java \s: one word, UNK char inside
        "a",
        "",
    ]
    table = dict(_TOY)
    py = {t: ug.encode_text_py(t, table, 4) for t in texts}
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    words_sql = (
        "filter(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '),"
        " w -> length(w) > 0)"
    )
    enc = ug.viterbi_encode_words_expr(words_sql, _TOY, 4)
    fold = {r["text"]: list(r["p"]) for r in df.select("text", enc.alias("p")).collect()}
    udf = {
        r["text"]: list(r["p"])
        for r in df.select(
            "text", ug.unigram_encode_udf(_TOY, 4)(df.text).alias("p")
        ).collect()
    }
    assert fold == py
    assert udf == py


def test_unknown_chars_encode_as_unk_singles():
    table = dict(_TOY)
    assert ug._viterbi_py("axc", table, 4) == ["a", "x", "c"]
    # an unknown char cannot be absorbed into a multi-char piece
    assert ug._viterbi_py("zz", table, 4) == ["z", "z"]


def test_tie_breaks_to_longer_piece():
    """Equal path scores must pick the LONGER last piece in every tier
    (the lexicographic struct-max law)."""
    scores = [
        ("a", Decimal("-1.000000000")),
        ("aa", Decimal("-2.000000000")),  # 'aa' == 'a'+'a' exactly
    ]
    table = dict(scores)
    assert ug._viterbi_py("aa", table, 2) == ["aa"]
    assert ug._viterbi_py("aaa", table, 2) == ["a", "aa"]


def test_fertility_compare_orders_tokenizers_sanely(spark, sf_dir):
    """The bake-off table: every language row carries both fertilities,
    both >= 1 (a piece can never cover more than a word) and positive
    piece masses."""
    from event_stream_starter_spark.queries import all_queries

    rows = all_queries()["x_tokenizer_fertility_compare"].fn(
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r["bpe_fertility"] >= 1.0
        assert r["unigram_fertility"] >= 1.0
        assert r["bpe_pieces"] > 0 and r["unigram_pieces"] > 0


def test_encode_cert_counts_and_planted_divergence(spark):
    """The registered cert law (certs.tier_agreement) must count a
    planted greedy-vs-Viterbi divergence — the broken-arm golden for
    the unigram family."""
    from event_stream_starter_spark.operators import certs

    table = dict(_TOY)
    texts = ["abc", "abab", "a"]
    rows = [
        (
            " ".join(ug.encode_text_py(t, table, 4)),
            " ".join(
                p for w in t.lower().split() for p in _greedy_longest(w, table, 4)
            ),
        )
        for t in texts
    ]
    df = spark.createDataFrame(rows, "e string, u string")
    got = certs.tier_agreement(df, "e", "u").collect()[0]
    assert got["n_docs"] == 3
    assert got["n_agree"] == 2  # 'abc' diverges; the law sees it
