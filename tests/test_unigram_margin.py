"""Segmentation-margin (2-best Viterbi) goldens:

- the 2-best DP's (best, second) scores match brute-force enumeration
  of ALL segmentations (multiset semantics: equal-score distinct paths
  are rank 1 and 2) on crafted words;
- the rank-1 pieces are bit-identical to the 1-best law (_viterbi_py);
- an exact tie yields margin 0 and counts as ambiguous;
- a single-path word yields no margin (None);
- the registered query emits sane decimals on the real corpus.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from event_stream_starter_spark.operators import unigram as ug

_TOY = {
    "a": Decimal("-1.200000000"),
    "ab": Decimal("-1.000000000"),
    "b": Decimal("-5.000000000"),
    "bc": Decimal("-1.200000000"),
    "c": Decimal("-5.000000000"),
}


def _enumerate_scores(word: str, scores: dict, max_len: int) -> list[Decimal]:
    out: list[Decimal] = []

    def walk(i: int, acc: Decimal):
        if i == len(word):
            out.append(acc)
            return
        for piece_len in range(1, min(max_len, len(word) - i) + 1):
            p = word[i : i + piece_len]
            s = scores.get(p)
            if s is None and piece_len == 1:
                s = ug.UNK_LOGP
            if s is not None:
                walk(i + piece_len, acc + s)

    walk(0, Decimal(0))
    return sorted(out, reverse=True)


def test_two_best_matches_enumeration_and_one_best_law():
    for word in ["abc", "abab", "aabbcc", "bca", "a"]:
        best, second, pieces = ug._viterbi2_py(word, _TOY, 4)
        ranked = _enumerate_scores(word, _TOY, 4)
        assert best == ranked[0], word
        if len(ranked) > 1:
            assert second == ranked[1], word
        else:
            assert second is None
        assert pieces == ug._viterbi_py(word, _TOY, 4), word


def test_exact_tie_is_margin_zero():
    scores = {
        "a": Decimal("-1.000000000"),
        "aa": Decimal("-2.000000000"),  # 'aa' == 'a'+'a' exactly
    }
    best, second, pieces = ug._viterbi2_py("aa", scores, 2)
    assert best == second == Decimal("-2.000000000")
    assert pieces == ["aa"]  # rank-1 keeps the longer-piece tie-break


def test_single_path_word_has_no_margin():
    best, second, pieces = ug._viterbi2_py("z", {"z": Decimal("-1")}, 2)
    assert second is None and pieces == ["z"]


def test_margin_udf_splits_on_ascii_whitespace_like_codegen_arm(spark):
    """PLANTED Unicode-whitespace golden (r9 ADVICE): a document with
    \\xa0 / NEL between letters must segment IDENTICALLY in the margin
    UDF and the certified codegen 1-best arm — Python str.split() would
    split on those (different words, different margins); the declared
    word law (Java \\s) does not."""
    toy = sorted(_TOY.items())
    texts = [
        "ab\xa0c bc",  # NBSP glues 'ab' + 'c' into ONE word under Java \s
        "ab",  # NEL inside a word
        "ab \t\r\n bc",  # ASCII runs still collapse
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    words_sql = (
        "filter(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '),"
        " w -> length(w) > 0)"
    )
    fold = {
        r["text"]: list(r["p"])
        for r in df.select(
            "text", ug.viterbi_encode_words_expr(words_sql, toy, 4).alias("p")
        ).collect()
    }
    udf = {
        r["text"]: list(r["m"]["pieces"])
        for r in df.select(
            "text", ug.unigram_margin_udf(toy, 4)(df.text).alias("m")
        ).collect()
    }
    assert udf == fold
    # the plant is live: NBSP kept 'ab' and 'c' in one word, so the UNK
    # law (no piece spans the \xa0) must appear in the segmentation
    assert "\xa0" in "".join(fold["ab\xa0c bc"])


def test_margin_query_emits_sane_decimals(spark, sf_dir):
    from event_stream_starter_spark.queries import all_queries

    rows = all_queries()["x_unigram_margin"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_pieces"] > 0
        if r["min_margin"] is not None:
            assert r["min_margin"] >= 0
        assert r["n_ambiguous"] >= 0
