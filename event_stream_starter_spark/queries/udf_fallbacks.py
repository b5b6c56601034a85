"""Model-backed UDF surface with deterministic fallbacks as defaults
(SURVEY.md §2.12 U4/U6, §2.8 T8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import inference as I
from ..functions import refine as R
from ..functions.scoring import NEGATIVE_WORDS, POSITIVE_WORDS


def _words_sql(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"
from ..io import load_table
from ..operators.mmr import mmr_keyphrases
from . import query


@query(
    "u4_u6_rules_refiner",
    """
    WITH base AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 4 = 0 THEN ' listing $ABC soon' ELSE '' END
                    || CASE WHEN doc_id % 7 = 0 THEN ' hack pump $XY' ELSE '' END
                   AS t
        FROM documents
    ), refined AS (
        SELECT doc_id, t,
               CASE WHEN regexp_matches(lower(t), 'listing|listed|launch') THEN 'listing'
                    WHEN regexp_matches(lower(t), 'hack|exploit|rug|scam') THEN 'hack'
                    WHEN regexp_matches(lower(t), 'partner|integrat|collab') THEN 'partnership'
                    WHEN regexp_matches(lower(t), 'pump|dump|moon|crash') THEN 'market'
                    ELSE 'other' END AS refined_type,
               substring(trim(regexp_replace(t, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), 1, 80) AS refined_summary,
               (SELECT list(x ORDER BY fp)[:5] FROM (
                    SELECT x, MIN(o) AS fp
                    FROM (SELECT unnest(regexp_extract_all(upper(t), '\\$[A-Z]{2,10}')) AS x,
                                 unnest(generate_series(1, len(regexp_extract_all(upper(t), '\\$[A-Z]{2,10}')))) AS o)
                    GROUP BY x))
                   AS impacted_assets,
               CAST(0.35 AS DOUBLE) AS refine_confidence
        FROM base
    )
    , reasons AS (
        SELECT *,
               COALESCE(NULLIF(list_filter([
                   CASE WHEN regexp_matches(lower(t), 'listing|listed|launch') THEN 'matched:listing' END,
                   CASE WHEN regexp_matches(lower(t), 'hack|exploit|rug|scam') THEN 'matched:hack' END,
                   CASE WHEN regexp_matches(lower(t), 'partner|integrat|collab') THEN 'matched:partnership' END,
                   CASE WHEN regexp_matches(lower(t), 'pump|dump|moon|crash') THEN 'matched:market' END
               ], x -> x IS NOT NULL)[:4], []), ['no-pattern']) AS refine_reasons
        FROM refined
    )
    SELECT doc_id, refined_type, refined_summary,
           COALESCE(array_to_string(impacted_assets, '|'), '') AS impacted_assets,
           refine_confidence,
           array_to_string(refine_reasons, '|') AS refine_reasons,
           substring(refined_type || ': ' ||
               CASE WHEN len(COALESCE(impacted_assets, [])) > 0
                    THEN array_to_string(impacted_assets, ',') ELSE '-' END ||
               ' (score ' || CAST(doc_id % 100 AS VARCHAR) || ')', 1, 280) AS card_summary,
           substring('level=' || refined_type || ' reasons=' ||
               CAST(len(refine_reasons) AS VARCHAR), 1, 160) AS risk_note
    FROM reasons
    """,
    survey_ids="U4 (rules-refiner fallback: type/summary/assets/confidence 0.35), U6 (template summarizer), R5 shape",
)
def u4_u6_rules_refiner(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(" listing $ABC soon")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" hack pump $XY")).otherwise(F.lit("")),
    )
    base = docs.select("doc_id", t.alias("t"))
    assets = R.impacted_assets(F.col("t"))
    reasons = R.refine_reasons(F.col("t"))
    return base.select(
        "doc_id",
        R.refined_type(F.col("t")).alias("refined_type"),
        R.refined_summary(F.col("t")).alias("refined_summary"),
        F.array_join(assets, "|").alias("impacted_assets"),
        F.lit(R.FALLBACK_CONFIDENCE).alias("refine_confidence"),
        F.array_join(reasons, "|").alias("refine_reasons"),
        R.card_summary(
            R.refined_type(F.col("t")), assets, (F.col("doc_id") % 100)
        ).alias("card_summary"),
        # U6 risk-note template over (level, n_reasons) — the <=160-char
        # contract is oracle-checked, not dead surface.
        R.risk_note(R.refined_type(F.col("t")), F.size(reasons)).alias("risk_note"),
    )


@query(
    "u4_refine_seam",
    """
    WITH refined AS (
        SELECT doc_id, text AS t,
               CASE WHEN regexp_matches(lower(text), 'listing|listed|launch') THEN 'listing'
                    WHEN regexp_matches(lower(text), 'hack|exploit|rug|scam') THEN 'hack'
                    WHEN regexp_matches(lower(text), 'partner|integrat|collab') THEN 'partnership'
                    WHEN regexp_matches(lower(text), 'pump|dump|moon|crash') THEN 'market'
                    ELSE 'other' END AS refined_type,
               substring(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), 1, 80) AS s80,
               (SELECT list(x ORDER BY fp)[:5] FROM (
                    SELECT x, MIN(o) AS fp
                    FROM (SELECT unnest(regexp_extract_all(upper(text), '\\$[A-Z]{2,10}')) AS x,
                                 unnest(generate_series(1, len(regexp_extract_all(upper(text), '\\$[A-Z]{2,10}')))) AS o)
                    GROUP BY x))
                   AS assets
        FROM documents
    ), reasons AS (
        SELECT *,
               COALESCE(NULLIF(list_filter([
                   CASE WHEN regexp_matches(lower(t), 'listing|listed|launch') THEN 'matched:listing' END,
                   CASE WHEN regexp_matches(lower(t), 'hack|exploit|rug|scam') THEN 'matched:hack' END,
                   CASE WHEN regexp_matches(lower(t), 'partner|integrat|collab') THEN 'matched:partnership' END,
                   CASE WHEN regexp_matches(lower(t), 'pump|dump|moon|crash') THEN 'matched:market' END
               ], x -> x IS NOT NULL)[:4], []), ['no-pattern']) AS refine_reasons
        FROM refined
    )
    SELECT doc_id, refined_type,
           CASE WHEN len(s80) < 4 THEN substring(s80 || '....', 1, 4) ELSE s80 END
               AS refined_summary,
           COALESCE(array_to_string(assets, '|'), '') AS impacted_assets,
           CAST(0.35 AS DOUBLE) AS refine_confidence,
           array_to_string(refine_reasons, '|') AS refine_reasons,
           'rules' AS backend_used,
           CAST(NULL AS VARCHAR) AS degrade_reason
    FROM reasons
    """,
    survey_ids=(
        "U4 pluggable backend seam (mapInPandas degrade ladder, rules default) "
        "— oracle-certifies pandas-path == column-path bit parity"
    ),
)
def u4_refine_seam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The U4 refiner routed through the PLUGGABLE backend seam
    (functions/inference.py) with the default rules backend: proves the
    mapInPandas inference plumbing — batching, memoization, degrade
    columns — produces bit-identical output to the pure column path.

    Reference: api/refiner.py:33-261 (degrade ladder + memoize);
    api/schemas/refine_schema.py:1-33 (output contract)."""
    docs = load_table(spark, sf_dir, "documents")
    return I.refine_with_backend(docs, "text", ["doc_id"])


@query(
    "u1_sentiment_seam",
    f"""
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
        FROM documents
    ), scored AS (
        SELECT doc_id,
               least(greatest(
                   CAST(len(list_filter(t, x -> list_contains({_words_sql(POSITIVE_WORDS)}, x)))
                        - len(list_filter(t, x -> list_contains({_words_sql(NEGATIVE_WORDS)}, x)))
                        AS DOUBLE)
                   / greatest(len(t), 1) * 3.0, -1.0), 1.0) AS score
        FROM toks
    )
    SELECT doc_id,
           CASE WHEN score > 0.1 THEN 'pos'
                WHEN score < -0.1 THEN 'neg'
                ELSE 'neu' END AS sentiment_label,
           ROUND(score, 6) + 0 AS sentiment_score,
           'rules' AS backend_used,
           CAST(NULL AS VARCHAR) AS degrade_reason
    FROM scored
    """,
    survey_ids=(
        "U1 pluggable backend seam (batch sentiment with degrade columns, "
        "c11 lexicon rules default)"
    ),
)
def u1_sentiment_seam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 sentiment through the pluggable seam, rules backend default.

    Reference: api/hf_sentiment.py:75-148 (degrade ladder + reason
    classes); api/sentiment/router.py:39-41 (backend switch). Raw score
    comes back from the seam; the 6-dp output round happens JVM-side so
    both engines share one rounding law."""
    docs = load_table(spark, sf_dir, "documents")
    out = I.sentiment_with_backend(docs, "text", ["doc_id"])
    return out.select(
        "doc_id",
        "sentiment_label",
        (F.round("sentiment_score", 6) + 0).alias("sentiment_score"),
        "backend_used",
        "degrade_reason",
    )


@query(
    "t8_mmr_keyphrases",
    None,  # Greedy MMR is iterative (each pick depends on prior picks) —
    # not SQL-expressible; verified against the pure-Python core in
    # tests/test_ops_golden.py.
    survey_ids="T8 (MMR top-k keyphrase selection, deterministic token fallback), U2 shape",
)
def t8_mmr_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mmr_keyphrases(docs, k=5)
