"""Deterministic refiner + summarizer fallbacks (SURVEY.md §2.12 U4/U6).

The reference degrades LLM refinement to a regex RulesRefiner with
confidence 0.35 (api/refiner.py:166-231) and the card summarizer to a
template (api/cards/summarizer.py:224-323). These fallbacks are the
engine's DEFAULT behavior (critical for oracle determinism); the LLM
backends are pluggable UDFs layered on top, off under test.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SUMMARY_MAX = 80
CARD_SUMMARY_MAX = 280
RISK_NOTE_MAX = 160
FALLBACK_CONFIDENCE = 0.35

# type-detection patterns (rule order = priority)
_TYPE_PATTERNS = (
    ("listing", "listing|listed|launch"),
    ("hack", "hack|exploit|rug|scam"),
    ("partnership", "partner|integrat|collab"),
    ("market", "pump|dump|moon|crash"),
)


def refined_type(text: Column) -> Column:
    lowered = F.lower(text)
    out = F.lit("other")
    for name, pat in reversed(_TYPE_PATTERNS):
        out = F.when(lowered.rlike(pat), F.lit(name)).otherwise(out)
    return out


def refined_summary(text: Column) -> Column:
    """First SUMMARY_MAX chars of the whitespace-collapsed text."""
    return F.substring(F.trim(F.regexp_replace(text, r"\s+", " ")), 1, SUMMARY_MAX)


def impacted_assets(text: Column, max_assets: int = 5) -> Column:
    """$TOKEN mentions, order-preserving dedup, uppercased, max 5
    (api/schemas/refine_schema.py: impacted_assets<=5)."""
    toks = F.regexp_extract_all(F.upper(text), F.lit(r"\$[A-Z]{2,10}"), 0)
    return F.slice(F.array_distinct(toks), 1, max_assets)


def refine_reasons(text: Column) -> Column:
    """1-4 reasons: which type patterns matched (rule ids as reasons)."""
    lowered = F.lower(text)
    hits = F.array(
        *[F.when(lowered.rlike(pat), F.lit(f"matched:{name}")) for name, pat in _TYPE_PATTERNS]
    )
    some = F.filter(hits, lambda x: x.isNotNull())
    return F.when(F.size(some) > 0, F.slice(some, 1, 4)).otherwise(
        F.array(F.lit("no-pattern"))
    )


def card_summary(card_type: Column, assets: Column, score: Column) -> Column:
    """U6 template fallback: '<type>: <assets> (score <s>)' ≤ 280 chars."""
    joined = F.when(F.size(assets) > 0, F.array_join(assets, ",")).otherwise(F.lit("-"))
    return F.substring(
        F.concat(card_type, F.lit(": "), joined, F.lit(" (score "), score.cast("string"), F.lit(")")),
        1,
        CARD_SUMMARY_MAX,
    )


def risk_note(level: Column, n_reasons: Column) -> Column:
    """U6 risk-note template ≤ 160 chars."""
    return F.substring(
        F.concat(F.lit("level="), level, F.lit(" reasons="), n_reasons.cast("string")),
        1,
        RISK_NOTE_MAX,
    )
