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


# DuckDB token expr mirroring Python str.split() whitespace semantics
# (same as queries/textdata._TOKS_DUCK).
_TOKS_DUCK = (
    "string_split(trim(regexp_replace(lower(text),"
    " '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), ' ')"
)

# Greedy MMR as a DuckDB RECURSIVE CTE: each recursion step carries the
# selected list (with per-token char sets) as STATE and appends the
# argmax of 0.65*rel - 0.35*max_sim_to_selected, tie-broken by
# first-seen order via lexicographic struct max over (score, -first_ord).
# Bit-exact vs the Python core: rel (freq/n), sim (char-set Jaccard) and
# the score are the same rational-arithmetic IEEE-double expressions in
# both engines, so even float ties resolve identically (validated: 0
# mismatching docs across sf0.001/0.01/0.1 against mmr_select).
_MMR_ORACLE = f"""
WITH RECURSIVE
tok0 AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
  FROM (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents)
),
tokf AS (SELECT * FROM tok0 WHERE length(tok) >= 2),
nn AS (SELECT doc_id, COUNT(*) AS n FROM tokf GROUP BY doc_id),
cand AS (
  SELECT doc_id, tok, MIN(ord) AS first_ord, COUNT(*) AS freq
  FROM tokf GROUP BY doc_id, tok
),
cand2 AS (
  SELECT c.doc_id, c.tok, c.first_ord,
         CAST(c.freq AS DOUBLE) / n.n AS rel,
         list_distinct(list_transform(range(1, length(c.tok)+1),
                                      i -> substring(c.tok, i, 1))) AS ch
  FROM cand c JOIN nn n USING (doc_id)
),
sel AS (
  SELECT doc_id, 0 AS step,
         CAST([] AS STRUCT(tok VARCHAR, ch VARCHAR[])[]) AS selected
  FROM nn
  UNION ALL
  SELECT doc_id, step + 1,
         list_append(selected, struct_pack(tok := picked.tok, ch := picked.ch))
  FROM (
    SELECT s.doc_id, s.step, s.selected,
           max(struct_pack(
                 score := CAST(0.65 AS DOUBLE) * c.rel
                          - (CAST(1 AS DOUBLE) - CAST(0.65 AS DOUBLE)) *
                            COALESCE(list_max(list_transform(s.selected,
                              x -> CAST(len(list_intersect(c.ch, x.ch)) AS DOUBLE)
                                   / len(list_distinct(list_concat(c.ch, x.ch))))),
                            CAST(0 AS DOUBLE)),
                 tie := -c.first_ord,
                 tok := c.tok,
                 ch := c.ch)) AS picked
    FROM sel s JOIN cand2 c ON s.doc_id = c.doc_id
    WHERE s.step < 5
      AND NOT list_contains(list_transform(s.selected, x -> x.tok), c.tok)
    GROUP BY s.doc_id, s.step, s.selected
  )
),
fin AS (
  SELECT doc_id, max_by(selected, step) AS sel_structs FROM sel GROUP BY doc_id
)
SELECT d.doc_id,
       array_to_string(COALESCE(list_transform(f.sel_structs, x -> x.tok),
                                CAST([] AS VARCHAR[])), '|') AS mmr_phrases
FROM documents d LEFT JOIN fin f USING (doc_id)
"""


@query(
    "t8_mmr_keyphrases",
    _MMR_ORACLE,
    survey_ids="T8 (MMR top-k keyphrase selection, deterministic token fallback), U2 shape",
)
def t8_mmr_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy MMR keyphrase top-k (reference api/keyphrases.py:164-188).

    Iterative-greedy is usually the textbook non-SQL-expressible case,
    but the selection loop is bounded (k=5) and its state is one small
    list — so the DuckDB oracle expresses it as a RECURSIVE CTE whose
    recursion step performs the argmax append (see _MMR_ORACLE). This
    upgrades the query from rows-only+golden to a full value-hash
    oracle; the pure-Python golden in tests/test_ops_golden.py stays as
    the third, engine-independent arm. The phrase list is serialized
    with '|' in both engines (the driver canonicalizer sorts cells, so
    array cells must be strings — the c13 precedent)."""
    docs = load_table(spark, sf_dir, "documents")
    return mmr_keyphrases(docs, k=5).select(
        "doc_id", F.array_join("mmr_phrases", "|").alias("mmr_phrases")
    )
