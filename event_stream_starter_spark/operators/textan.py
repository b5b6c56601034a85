"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (oracle-expressible in ANSI SQL). At 100TB
these are map-only stages — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists per language for n-gram-heuristic
# language ID. Real deployments swap in fastText-style models via the
# pandas-UDF plugin point; this heuristic is the deterministic default.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"),
    "fr": ("le", "la", "de", "et", "est", "un", "une", "les", "des", "que"),
}


def tokens(text: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), " ")


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation runs
    via regexp splitting on a GPT-style pre-tokenizer-ish pattern.
    """
    pieces = F.regexp_extract_all(
        F.lower(text), F.lit(r"([a-z]{1,8}|[0-9]{1,3}|[^a-z0-9\s])"), 1
    )
    return F.size(pieces)


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_scores(text: Column, toks: Column | None = None) -> list[tuple[str, Column]]:
    t = tokens(text) if toks is None else toks
    n = F.greatest(F.size(t), F.lit(1)).cast("double")
    return [
        (lang, stopword_hits(t, words).cast("double") / n)
        for lang, words in LANG_STOPWORDS.items()
    ]


def detect_lang(
    text: Column, min_score: float = 0.0, toks: Column | None = None
) -> Column:
    """Language with max stopword-ratio score; 'und' when all zero.

    Ties break by language-code order (deterministic): the comparison is
    strict-greater, so the first language in LANG_STOPWORDS order wins.
    Pass a precomputed ``toks`` column to avoid re-tokenizing per language.
    """
    scores = lang_scores(text, toks)
    best_lang = F.lit("und")
    best_score = F.lit(min_score)
    for lang, s in scores:
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def quality_score(text: Column, toks: Column | None = None) -> Column:
    """Deterministic doc-quality heuristic in [0,1]:
    0.4*length_score + 0.3*(1 - punct_ratio) + 0.3*stopword_ratio_en.

    length_score = min(n_tokens/100, 1); punct_ratio = punct chars / chars.
    """
    toks = tokens(text) if toks is None else toks
    n_toks = F.greatest(F.size(toks), F.lit(1)).cast("double")
    length_score = F.least(n_toks / F.lit(100.0), F.lit(1.0))
    n_chars = F.greatest(F.length(text), F.lit(1)).cast("double")
    n_punct = (
        F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    ).cast("double")
    punct_ratio = n_punct / n_chars
    sw_ratio = F.least(
        stopword_hits(toks, LANG_STOPWORDS["en"]).cast("double") / n_toks * F.lit(5.0),
        F.lit(1.0),
    )
    return (
        F.lit(0.4) * length_score
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * sw_ratio
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: sha256 of whitespace-normalized
    lowercase text, truncated to 16 hex chars. Exact-dedup key.
    """
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.substring(F.sha2(norm, 256), 1, 16)
