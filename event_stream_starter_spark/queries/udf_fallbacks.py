"""Model-backed UDF surface with deterministic fallbacks as defaults
(SURVEY.md §2.12 U4/U6, §2.8 T8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import refine as R
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
               substring(trim(regexp_replace(t, '\\s+', ' ', 'g')), 1, 80) AS refined_summary,
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
    "t8_mmr_keyphrases",
    None,  # Greedy MMR is iterative (each pick depends on prior picks) —
    # not SQL-expressible; verified against the pure-Python core in
    # tests/test_ops_golden.py.
    survey_ids="T8 (MMR top-k keyphrase selection, deterministic token fallback), U2 shape",
)
def t8_mmr_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mmr_keyphrases(docs, k=5)
