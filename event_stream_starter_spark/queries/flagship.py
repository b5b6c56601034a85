"""Flagship end-to-end slice (SURVEY.md §7.2): events → normalize/key →
heat windows + slope/trend → rules scoring → per-type signal summary.

Exercises source → filter → key → window-agg → join → rules → output in
one plan; every stage is a Catalyst built-in plus compiled rule exprs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.windows import heat_gates, trailing_heat_counts
from . import query
from .rules_q import _K_DUCK, _K_SPARK, _load_rules, _projection_sql


def _heat(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shared A3 heat-window helper — same boundary operators as
    # a3_w5_heat_slope by construction.
    return trailing_heat_counts(load_table(spark, sf_dir, "events"))


@query(
    "flagship_heat_rules",
    None,  # patched below (needs the compiled ruleset)
    survey_ids="§7.2 end-to-end slice: A3+W5 heat ⋈ R1-R2 rules summary per type",
)
def flagship_heat_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    rs = _load_rules()
    ev = load_table(spark, sf_dir, "events")
    sig = ev.selectExpr("event_type AS sig_event_type", *_projection_sql(_K_SPARK))
    scored = sig.selectExpr(
        "sig_event_type",
        f"CAST(({rs.score_sql()}) AS DECIMAL(12,1)) AS score",
        f"{rs.level_sql()} AS level",
    )
    rules_summary = scored.groupBy(F.col("sig_event_type").alias("event_type")).agg(
        F.sum("score").cast("double").alias("sum_score"),
        F.sum(F.when(F.col("level") == "opportunity", 1).otherwise(0)).alias(
            "n_opportunity"
        ),
        F.sum(F.when(F.col("level") == "caution", 1).otherwise(0)).alias("n_caution"),
    )
    heat = _heat(spark, sf_dir)
    slope = (F.col("cnt_10m") - F.col("prev_10m")) / F.lit(10.0)
    # Same W5 gates as a3_w5_heat_slope (shared heat_gates helper) — the
    # two surfaces certified for W5 must never fork on gating.
    g = heat_gates(F.col("cnt_10m"), F.col("cnt_30m"), slope)
    return (
        heat.join(rules_summary, "event_type")
        .select(
            "event_type",
            "cnt_10m",
            "cnt_30m",
            g["slope"].alias("slope"),
            g["trend"].alias("trend"),
            g["degrade"].alias("degrade"),
            "sum_score",
            "n_opportunity",
            "n_caution",
        )
    )


def _flagship_oracle() -> str:
    rs = _load_rules()
    proj = ",\n               ".join(_projection_sql(_K_DUCK))
    return f"""
    WITH sig AS (
        SELECT event_type AS sig_event_type, {proj}
        FROM events
    ), scored AS (
        SELECT sig_event_type,
               CAST(({rs.score_sql()}) AS DECIMAL(12,1)) AS score,
               {rs.level_sql()} AS level
        FROM sig
    ), rules_summary AS (
        SELECT sig_event_type AS event_type,
               CAST(SUM(score) AS DOUBLE) AS sum_score,
               CAST(SUM(CASE WHEN level = 'opportunity' THEN 1 ELSE 0 END) AS BIGINT) AS n_opportunity,
               CAST(SUM(CASE WHEN level = 'caution' THEN 1 ELSE 0 END) AS BIGINT) AS n_caution
        FROM scored GROUP BY sig_event_type
    ), now_t AS (SELECT MAX(ts) AS now_ts FROM events),
    heat AS (
        SELECT e.event_type,
               CAST(SUM(CASE WHEN e.ts >= n.now_ts - INTERVAL 10 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS cnt_10m,
               CAST(SUM(CASE WHEN e.ts >= n.now_ts - INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS cnt_30m,
               CAST(SUM(CASE WHEN e.ts >= n.now_ts - INTERVAL 20 MINUTE
                         AND e.ts < n.now_ts - INTERVAL 10 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS prev_10m
        FROM events e CROSS JOIN now_t n
        GROUP BY e.event_type
    )
    SELECT h.event_type, h.cnt_10m, h.cnt_30m,
           CASE WHEN h.cnt_10m < 1 OR h.cnt_30m < 3 THEN NULL
                ELSE ROUND((h.cnt_10m - h.prev_10m) / 10.0, 6) + 0 END AS slope,
           CASE WHEN h.cnt_10m < 1 OR h.cnt_30m < 3 THEN 'flat'
                WHEN (h.cnt_10m - h.prev_10m) / 10.0 >= 0.2 THEN 'up'
                WHEN (h.cnt_10m - h.prev_10m) / 10.0 <= -0.2 THEN 'down'
                ELSE 'flat' END AS trend,
           (h.cnt_10m >= 1 AND h.cnt_30m < 3) AS degrade,
           r.sum_score, r.n_opportunity, r.n_caution
    FROM heat h JOIN rules_summary r ON h.event_type = r.event_type
    """


from . import REGISTRY  # noqa: E402

REGISTRY["flagship_heat_rules"].oracle = _flagship_oracle()
