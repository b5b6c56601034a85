"""Operational query patterns (SURVEY.md §2.5 A4/A7-A10, §2.8 T4/T7,
§2.6 W8, §2.4 D5/D6, §2.10 R4/R8/R9, §2.9 table-level set ops).

These certify the reference's job/ops read paths — outbox ordering,
status counters, batch scans, cooldowns, card routing — as declarative
Spark plans over the driver's events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import key_concat
from ..io import load_table
from . import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# A4 / A7 / A8: mention counts, status counters, hourly ingest stats
# ---------------------------------------------------------------------------


@query(
    "a4_a7_a8_counters",
    """
    WITH mx AS (SELECT MAX(ts) AS now_ts FROM events)
    SELECT event_type AS status,
           COUNT(*) AS total_cnt,
           COUNT(*) FILTER (WHERE ts >= now_ts - INTERVAL 24 HOUR) AS cnt_24h,
           COUNT(*) FILTER (WHERE ts >= now_ts - INTERVAL 1 HOUR) AS cnt_1h
    FROM events, mx
    GROUP BY event_type
    """,
    survey_ids="A4 (24h mention count), A7 (status counts/backlog), A8 (hourly ingest stats)",
)
def a4_a7_a8_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    now_ts = ev.select(F.max("ts").alias("now_ts"))
    j = ev.crossJoin(F.broadcast(now_ts))
    in_24h = F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 24 HOUR")
    in_1h = F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 1 HOUR")
    return j.groupBy(F.col("event_type").alias("status")).agg(
        F.count(F.lit(1)).alias("total_cnt"),
        F.count_if(in_24h).alias("cnt_24h"),
        F.count_if(in_1h).alias("cnt_1h"),
    )


# ---------------------------------------------------------------------------
# A10 / T3 / T7: candidate batch scan with outbox ordering (NULLS FIRST)
# ---------------------------------------------------------------------------


@query(
    "a10_t7_batch_scan",
    """
    WITH mx AS (SELECT MAX(ts) AS now_ts FROM events),
    base AS (
        SELECT event_id,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               user_id, value,
               CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) % 4 = 0
                    THEN NULL
                    ELSE CAST(epoch_us(ts) AS BIGINT)
                         + CAST(json_extract(props, '$.k') AS INTEGER) * 1000000 END
                   AS next_try_us
        FROM events, mx
        WHERE event_type = 'click' AND ts >= now_ts - INTERVAL 6 HOUR
    )
    SELECT event_id, ts_us, user_id, value, next_try_us
    FROM base
    ORDER BY next_try_us ASC NULLS FIRST, ts_us ASC, event_id ASC
    LIMIT 100
    """,
    survey_ids="A10 (candidate batch scan), T3 (order desc limit), T7 (outbox order NULLS FIRST)",
)
def a10_t7_batch_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    now_ts = ev.select(F.max("ts").alias("now_ts"))
    k = F.get_json_object("props", "$.k").cast("int")
    base = (
        ev.crossJoin(F.broadcast(now_ts))
        .filter(
            (F.col("event_type") == "click")
            & (F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 6 HOUR"))
        )
        .select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "value",
            F.when(k % 4 == 0, F.lit(None).cast("long"))
            .otherwise(F.unix_micros("ts") + k.cast("long") * 1000000)
            .alias("next_try_us"),
        )
    )
    return base.orderBy(
        F.col("next_try_us").asc_nulls_first(),
        F.col("ts_us").asc(),
        F.col("event_id").asc(),
    ).limit(100)


# ---------------------------------------------------------------------------
# T4: top-3 evidence links per key
# ---------------------------------------------------------------------------


@query(
    "t4_top3_links",
    """
    WITH flat AS (
        SELECT user_id, 'e' || CAST(event_id AS VARCHAR) AS link, value, event_id
        FROM events WHERE event_type = 'view'
    )
    SELECT user_id,
           array_to_string(list(link ORDER BY value DESC, event_id ASC)[:3], '|') AS top_links
    FROM flat
    GROUP BY user_id
    """,
    survey_ids="T4 (top-3 evidence links by weight, deterministic tie-break)",
)
def t4_top3_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "view")
    # sort_array on struct(-value, event_id) == ORDER BY value DESC, id ASC;
    # slice 3 then project the link (reference topic_analyzer.py:277-309).
    item = F.struct(
        (-F.col("value")).alias("nv"),
        F.col("event_id").alias("eid"),
        F.concat(F.lit("e"), F.col("event_id").cast("string")).alias("link"),
    )
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.slice(F.sort_array(F.collect_list(item)), 1, 3), lambda s: s["link"]
            ),
            "|",
        ).alias("top_links")
    )


# ---------------------------------------------------------------------------
# W8: series split {h24,d7} × {w30,w60}
# ---------------------------------------------------------------------------


@query(
    "w8_series_split",
    """
    WITH mx AS (SELECT CAST(epoch_us(MAX(ts)) AS BIGINT) AS now_us FROM events),
    cfg(span, span_sec, win, win_sec) AS (
        VALUES ('h24', 86400, 'w30', 1800), ('h24', 86400, 'w60', 3600),
               ('d7', 604800, 'w30', 1800), ('d7', 604800, 'w60', 3600)
    ),
    b AS (
        SELECT user_id, span, win,
               CAST(floor(epoch_us(ts) / (win_sec * 1000000.0)) AS BIGINT) AS bucket,
               value
        FROM events, mx, cfg
        WHERE epoch_us(ts) >= now_us - span_sec * CAST(1000000 AS BIGINT)
    )
    SELECT user_id, span, win,
           COUNT(DISTINCT bucket) AS n_buckets,
           COUNT(*) AS n_events,
           MAX(bucket) AS last_bucket,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM b
    GROUP BY user_id, span, win
    """,
    survey_ids="W8 (series re-bucket {h24,d7}x{w30,w60} grid), ST2 window grid",
)
def w8_series_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rollup-reuse (hypertable style): ONE shuffle builds the finest grid
    # (user, 30-min bucket) with per-span conditional partials; every
    # {span}×{win} series derives from that small rollup — w60 buckets are
    # epoch-aligned pairs of w30 buckets (floor(b30/2)), so no second pass
    # over the events. A naive plan (events × 4 configs) shuffles 4x the
    # fact table; this shuffles it once.
    ev = _events(spark, sf_dir)
    now_us = ev.select(F.unix_micros(F.max("ts")).alias("now_us"))
    us = F.unix_micros("ts")
    b30 = F.floor(us / F.lit(1800 * 1000000)).cast("long")
    in_h24 = us >= F.col("now_us") - F.lit(86400) * F.lit(1000000).cast("long")
    in_d7 = us >= F.col("now_us") - F.lit(604800) * F.lit(1000000).cast("long")
    dec = F.col("value").cast("decimal(18,6)")
    grid = (
        ev.crossJoin(F.broadcast(now_us))
        .filter(in_d7)
        .groupBy("user_id", b30.alias("b30"))
        .agg(
            F.count(F.lit(1)).alias("cnt_d7"),
            F.count_if(in_h24).alias("cnt_h24"),
            F.sum(dec).alias("sum_d7"),
            F.sum(F.when(in_h24, dec)).alias("sum_h24"),
        )
    )

    # Melt span into a row dimension over the (tiny) rollup so each window
    # width is ONE aggregation, not one per span.
    melted = grid.select(
        "user_id",
        "b30",
        F.expr(
            "stack(2, 'h24', cnt_h24, sum_h24, 'd7', cnt_d7, sum_d7) AS (span, cnt, tot)"
        ),
    )

    def series(src: DataFrame, bucket_col: str, win: str) -> DataFrame:
        return (
            src.filter(F.col("cnt") > 0)
            .groupBy("user_id", "span")
            .agg(
                F.count(F.lit(1)).alias("n_buckets"),
                F.sum("cnt").alias("n_events"),
                F.max(bucket_col).alias("last_bucket"),
                F.sum("tot").alias("total_value"),
            )
            .select(
                "user_id",
                "span",
                F.lit(win).alias("win"),
                "n_buckets",
                "n_events",
                "last_bucket",
                F.col("total_value").cast("decimal(38,6)").cast("double").alias("total_value"),
            )
        )

    g60 = melted.groupBy(
        "user_id", "span", F.floor(F.col("b30") / 2).alias("b60")
    ).agg(F.sum("cnt").alias("cnt"), F.sum("tot").alias("tot"))
    return series(melted, "b30", "w30").unionAll(series(g60, "b60", "w60"))


# ---------------------------------------------------------------------------
# D5: state-version change detection (emit only on change)
# ---------------------------------------------------------------------------


@query(
    "d5_state_version_dedup",
    """
    WITH ver AS (
        SELECT event_id, user_id,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               event_type || '|' || CAST(value >= 10 AS VARCHAR) AS state_ver
        FROM events
    ), lagged AS (
        SELECT *, LAG(state_ver) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id) AS prev_ver
        FROM ver
    )
    SELECT event_id, user_id, ts_us, state_ver
    FROM lagged
    WHERE prev_ver IS NULL OR prev_ver <> state_ver
    """,
    survey_ids="D5 (state-version card dedup: emit only on state change)",
)
def d5_state_version_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    ver = ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        key_concat(F.col("event_type"), (F.col("value") >= 10).cast("string")).alias(
            "state_ver"
        ),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        ver.withColumn("prev_ver", F.lag("state_ver").over(w))
        .filter(F.col("prev_ver").isNull() | (F.col("prev_ver") != F.col("state_ver")))
        .drop("prev_ver")
    )


# ---------------------------------------------------------------------------
# D6: greedy cooldown emission (genuinely iterative → fold, rows-only)
# ---------------------------------------------------------------------------

COOLDOWN_SEC = 3600


@query(
    "d6_cooldown_emit",
    f"""
    WITH RECURSIVE e AS (
        SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
        FROM events WHERE event_type = 'purchase'
    ), rec AS (
        -- Greedy per-key fold as a recursion: the first emission is the
        -- key's earliest event; each next one the earliest event at or
        -- beyond last_emit + cooldown (COOLDOWN_SEC — one source of
        -- truth with the Spark fold below).
        SELECT user_id, MIN(ts_us) AS emit_ts_us FROM e GROUP BY user_id
        UNION ALL
        SELECT r.user_id,
               (SELECT MIN(ts_us) FROM e
                 WHERE e.user_id = r.user_id
                   AND e.ts_us >= r.emit_ts_us + {COOLDOWN_SEC * 1_000_000})
        FROM rec r
        WHERE EXISTS (SELECT 1 FROM e
                       WHERE e.user_id = r.user_id
                         AND e.ts_us >= r.emit_ts_us + {COOLDOWN_SEC * 1_000_000})
    )
    SELECT user_id, emit_ts_us FROM rec
    """,
    survey_ids=(
        "D6 (push cooldowns: greedy per-key emit with TTL window) — "
        "recursive-CTE oracle (the sequential fold IS SQL-expressible "
        "with recursion), plus the pure-Python golden"
    ),
)
def d6_cooldown_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-key ordered fold: emit ts if >= last_emit + cooldown. State is one
    # (long, array) struct per key; keys are users → bounded cardinality.
    # Streaming form = transformWithState with a last_emit value state.
    ts_sorted = F.array_sort(F.collect_list(F.unix_micros("ts")))
    emitted = F.aggregate(
        ts_sorted,
        F.struct(
            F.lit(None).cast("long").alias("last"),
            F.array().cast("array<long>").alias("out"),
        ),
        lambda acc, t: F.when(
            acc["last"].isNull() | (t >= acc["last"] + COOLDOWN_SEC * 1000000),
            F.struct(t.alias("last"), F.array_append(acc["out"], t).alias("out")),
        ).otherwise(acc),
        lambda acc: acc["out"],
    )
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(emitted.alias("emitted_ts_us"))
        .select("user_id", F.explode("emitted_ts_us").alias("emit_ts_us"))
    )


# ---------------------------------------------------------------------------
# S4: avatar-change monitor (lag-compare change detection)
# ---------------------------------------------------------------------------


@query(
    "s4_change_monitor",
    """
    WITH snaps AS (
        SELECT user_id, event_id,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               substring(sha256('avatar' || CAST(user_id AS VARCHAR) || '|' ||
                        CAST(CAST(json_extract(props, '$.k') AS INTEGER) % 3 AS VARCHAR)), 1, 16)
                   AS avatar_hash
        FROM events WHERE event_type = 'view'
    ), lagged AS (
        SELECT *, LAG(avatar_hash) OVER (PARTITION BY user_id
                                         ORDER BY ts_us, event_id) AS prev_hash
        FROM snaps
    )
    SELECT user_id, ts_us, prev_hash, avatar_hash
    FROM lagged
    WHERE prev_hash IS NOT NULL AND prev_hash <> avatar_hash
    """,
    survey_ids="S4 (avatar-change monitor: lag(hash) != hash change rows)",
)
def s4_change_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "view")
    avatar = F.substring(
        F.sha2(
            F.concat(
                F.lit("avatar"),
                F.col("user_id").cast("string"),
                F.lit("|"),
                (F.get_json_object("props", "$.k").cast("int") % 3).cast("string"),
            ),
            256,
        ),
        1,
        16,
    )
    snaps = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        avatar.alias("avatar_hash"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        snaps.withColumn("prev_hash", F.lag("avatar_hash").over(w))
        .filter(F.col("prev_hash").isNotNull() & (F.col("prev_hash") != F.col("avatar_hash")))
        .select("user_id", "ts_us", "prev_hash", "avatar_hash")
    )


# ---------------------------------------------------------------------------
# R4: market-risk tagging
# ---------------------------------------------------------------------------


@query(
    "r4_market_risk_tags",
    """
    WITH base AS (
        SELECT event_id, user_id, value,
               CAST(json_extract(props, '$.k') AS INTEGER) AS k
        FROM events WHERE event_type = 'error'
    )
    SELECT event_id, user_id,
           COALESCE(array_to_string(list_filter([
               CASE WHEN value > 80 THEN 'MR01' END,
               CASE WHEN k > 90 THEN 'MR02' END,
               CASE WHEN value < 5 AND k < 10 THEN 'MR03' END
           ], x -> x IS NOT NULL), '|'), '') AS mr_tags,
           len(list_filter([
               CASE WHEN value > 80 THEN 'MR01' END,
               CASE WHEN k > 90 THEN 'MR02' END,
               CASE WHEN value < 5 AND k < 10 THEN 'MR03' END
           ], x -> x IS NOT NULL)) > 0 AS market_risk
    FROM base
    """,
    survey_ids="R4 (market-risk rule ids MR01-MR06 → tags + flag)",
)
def r4_market_risk_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "error")
    k = F.get_json_object("props", "$.k").cast("int")
    tags = F.filter(
        F.array(
            F.when(F.col("value") > 80, F.lit("MR01")),
            F.when(k > 90, F.lit("MR02")),
            F.when((F.col("value") < 5) & (k < 10), F.lit("MR03")),
        ),
        lambda x: x.isNotNull(),
    )
    return ev.select(
        "event_id",
        "user_id",
        F.array_join(tags, "|").alias("mr_tags"),
        (F.size(tags) > 0).alias("market_risk"),
    )


# ---------------------------------------------------------------------------
# R8: secondary-proxy trigger thresholds
# ---------------------------------------------------------------------------


@query(
    "r8_secondary_trigger",
    """
    WITH mx AS (SELECT MAX(ts) AS now_ts FROM events),
    agg AS (
        SELECT user_id,
               CASE WHEN user_id % 2 = 0 THEN 'evm' ELSE 'sol' END AS chain_kind,
               COUNT(*) AS txns,
               SUM(CAST(value AS DECIMAL(18,6))) AS lp,
               SUM(CAST(value AS DECIMAL(18,6)))
                   FILTER (WHERE event_type = 'click') AS vol
        FROM events, mx
        WHERE ts >= now_ts - INTERVAL 48 HOUR
        GROUP BY user_id
    )
    SELECT user_id, chain_kind, txns,
           CAST(lp AS DOUBLE) AS lp,
           CAST(COALESCE(vol, CAST(0 AS DECIMAL(18,6))) AS DOUBLE) AS vol,
           txns >= 40
             AND lp >= CASE WHEN chain_kind = 'evm' THEN 1500 ELSE 800 END
             AND COALESCE(vol, CAST(0 AS DECIMAL(18,6))) >= 200 AS triggered
    FROM agg
    """,
    survey_ids="R8 (secondary proxy trigger: txns/lp/vol thresholds per chain kind)",
)
def r8_secondary_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    now_ts = ev.select(F.max("ts").alias("now_ts"))
    dec = F.col("value").cast("decimal(18,6)")
    agg = (
        ev.crossJoin(F.broadcast(now_ts))
        .filter(F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 48 HOUR"))
        .groupBy(
            "user_id",
            F.when(F.col("user_id") % 2 == 0, F.lit("evm")).otherwise(F.lit("sol")).alias(
                "chain_kind"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("txns"),
            F.sum(dec).alias("lp"),
            F.sum(F.when(F.col("event_type") == "click", dec)).alias("vol_raw"),
        )
    )
    vol = F.coalesce(F.col("vol_raw"), F.lit(0).cast("decimal(18,6)"))
    lp_min = F.when(F.col("chain_kind") == "evm", F.lit(1500)).otherwise(F.lit(800))
    return agg.select(
        "user_id",
        "chain_kind",
        "txns",
        F.col("lp").cast("double").alias("lp"),
        vol.cast("double").alias("vol"),
        ((F.col("txns") >= 40) & (F.col("lp") >= lp_min) & (vol >= 200)).alias(
            "triggered"
        ),
    )


# ---------------------------------------------------------------------------
# R9: card-type routing
# ---------------------------------------------------------------------------


@query(
    "r9_card_routing",
    """
    WITH base AS (
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INTEGER) % 3 > 0 AS onchain_ok,
               CASE WHEN value >= 80 THEN 'risk'
                    WHEN value >= 50 THEN 'caution'
                    WHEN value >= 20 THEN 'watch'
                    ELSE 'none' END AS level,
               event_type = 'error' AS market_risk_hit
        FROM events
    )
    SELECT event_id, level,
           CASE WHEN market_risk_hit THEN 'market_risk'
                WHEN onchain_ok AND level IN ('caution', 'risk') THEN 'primary'
                WHEN level = 'watch' THEN 'secondary'
                ELSE 'topic' END AS card_type
    FROM base
    """,
    survey_ids="R9 (card-type routing: primary/secondary/topic/market_risk), R11 fallback shape",
)
def r9_card_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    onchain_ok = F.get_json_object("props", "$.k").cast("int") % 3 > 0
    level = (
        F.when(F.col("value") >= 80, F.lit("risk"))
        .when(F.col("value") >= 50, F.lit("caution"))
        .when(F.col("value") >= 20, F.lit("watch"))
        .otherwise(F.lit("none"))
    )
    mr = F.col("event_type") == "error"
    return ev.select(
        "event_id",
        level.alias("level"),
        F.when(mr, F.lit("market_risk"))
        .when(onchain_ok & level.isin("caution", "risk"), F.lit("primary"))
        .when(level == "watch", F.lit("secondary"))
        .otherwise(F.lit("topic"))
        .alias("card_type"),
    )


# ---------------------------------------------------------------------------
# Table-level set operations (§2.9: engine exposes union/intersect/except)
# ---------------------------------------------------------------------------


@query(
    "e_table_setops",
    """
    SELECT user_id, 'click_and_error' AS cohort FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'
    )
    UNION ALL
    SELECT user_id, 'click_no_purchase' AS cohort FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
    survey_ids="§2.9 table-level set ops (INTERSECT / EXCEPT / UNION ALL)",
)
def e_table_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    errorers = ev.filter(F.col("event_type") == "error").select("user_id")
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    both = clickers.intersect(errorers).withColumn("cohort", F.lit("click_and_error"))
    no_buy = clickers.distinct().exceptAll(purchasers.distinct()).withColumn(
        "cohort", F.lit("click_no_purchase")
    )
    return both.unionAll(no_buy)
