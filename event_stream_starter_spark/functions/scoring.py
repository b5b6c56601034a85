"""Scoring / numeric-policy expressions.

Reference: api/events.py:344-377 (_compute_candidate_score);
api/rules_sentiment.py:11-84 (lexicon sentiment);
api/routes_expert_onchain.py:39-54, api/routes/signals_summary.py:51-57
(3-dp HALF_UP quantize + clamp).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference lexicon (api/rules_sentiment.py) — a small deterministic word
# list; the engine treats it as config, this is the default.
POSITIVE_WORDS = (
    "good", "great", "bull", "bullish", "moon", "pump", "win", "up",
    "gain", "profit", "fast", "best", "strong", "buy",
)
NEGATIVE_WORDS = (
    "bad", "bear", "bearish", "dump", "rug", "scam", "down", "loss",
    "crash", "slow", "weak", "sell", "fud", "dead",
)


def clamp(c: Column, lo: float, hi: float) -> Column:
    return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))


def clamp01(c: Column) -> Column:
    return clamp(c, 0.0, 1.0)


def quantize3(c: Column) -> Column:
    """3-dp HALF_UP rounding (reference signals_summary.py:51-57).

    Spark ``round`` is HALF_UP for decimals; route through DecimalType.
    """
    return F.round(c.cast("decimal(18,9)"), 3).cast("decimal(18,3)")


def candidate_score(sentiment_score: Column, n_keywords: Column) -> Column:
    """clamp01(0.6*(sent+1)/2 + 0.4*min(n_keywords/5, 1)).

    Reference: api/events.py:344-377 (_compute_candidate_score).
    """
    sent_part = (F.coalesce(sentiment_score, F.lit(0.0)) + F.lit(1.0)) / F.lit(2.0)
    kw_part = F.least(F.coalesce(n_keywords, F.lit(0)).cast("double") / F.lit(5.0), F.lit(1.0))
    return clamp01(F.lit(0.6) * sent_part + F.lit(0.4) * kw_part)


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def lexicon_sentiment_score(
    text: Column,
    positive: tuple[str, ...] = POSITIVE_WORDS,
    negative: tuple[str, ...] = NEGATIVE_WORDS,
) -> Column:
    """(pos_cnt - neg_cnt) / n_tokens * 3, clamped to [-1, 1].

    Counts duplicate occurrences (reference api/rules_sentiment.py:11-84
    iterates tokens, not a set).
    """
    toks = _tokens(text)
    pos_arr = F.array(*[F.lit(w) for w in positive])
    neg_arr = F.array(*[F.lit(w) for w in negative])
    pos_cnt = F.size(F.filter(toks, lambda t: F.array_contains(pos_arr, t)))
    neg_cnt = F.size(F.filter(toks, lambda t: F.array_contains(neg_arr, t)))
    n = F.greatest(F.size(toks), F.lit(1))
    raw = (pos_cnt - neg_cnt).cast("double") / n.cast("double") * F.lit(3.0)
    return clamp(raw, -1.0, 1.0)


def lexicon_sentiment_label(score: Column, threshold: float = 0.1) -> Column:
    """pos/neg/neu at ±threshold — STRICT inequalities: the reference
    labels `score > 0.1` pos and `score < -0.1` neg, so exactly ±0.1
    (reachable: diff/len*3, e.g. 1/30) is neu
    (api/rules_sentiment.py:76-82)."""
    return (
        F.when(score > threshold, F.lit("pos"))
        .when(score < -threshold, F.lit("neg"))
        .otherwise(F.lit("neu"))
    )
