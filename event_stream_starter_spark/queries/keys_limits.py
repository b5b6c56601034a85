"""C5 v2 event keys, C8 topic ids, A9 confidence, ST8 rate limits —
the remaining small §2 operators, each oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import event_key_v2, topic_id
from ..io import load_table
from . import query


@query(
    "c5_c8_event_key_v2",
    """
    WITH base AS (
        SELECT event_id, ts, event_type,
               CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) % 3 = 0
                    THEN '0x' || substring(sha256(event_type || CAST(user_id AS VARCHAR)), 1, 40)
                    ELSE NULL END AS token_ca,
               '$' || event_type AS symbol,
               CASE WHEN user_id % 2 = 0 THEN 'eth' ELSE 'sol' END AS chain_id,
               'none' AS topic_hash,
               'u' || CAST(user_id AS VARCHAR) AS text_norm
        FROM events
    )
    SELECT event_id,
           substring(sha256(
               'v2|' || event_type || '|' ||
               COALESCE(token_ca, symbol || '|' || chain_id) || '|' ||
               topic_hash || '|' ||
               CAST(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS VARCHAR) || '|' ||
               substring(sha256(text_norm), 1, 16)), 1, 40) AS event_key,
           ('t.' || substring(sha256(array_to_string(
                list_sort([lower(chain_id), lower(event_type)]), '|')), 1, 12))
               AS topic_id
    FROM base
    """,
    survey_ids="C5 (event key v2: identity fallback + text_sig), C8 (topic_id)",
)
def c5_c8_event_key_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    token_ca = F.when(
        k % 3 == 0,
        F.concat(
            F.lit("0x"),
            F.substring(
                F.sha2(F.concat(F.col("event_type"), F.col("user_id").cast("string")), 256),
                1,
                40,
            ),
        ),
    )
    chain = F.when(F.col("user_id") % 2 == 0, F.lit("eth")).otherwise(F.lit("sol"))
    return ev.select(
        "event_id",
        event_key_v2(
            F.col("event_type"),
            F.concat(F.lit("$"), F.col("event_type")),
            token_ca,
            chain,
            F.lit("none"),
            F.concat(F.lit("u"), F.col("user_id").cast("string")),
            F.col("ts"),
        ).alias("event_key"),
        topic_id(F.array(chain, F.col("event_type"))).alias("topic_id"),
    )


@query(
    "a9_topic_confidence",
    """
    WITH mx AS (SELECT MAX(ts) AS now_ts FROM events),
    m AS (
        SELECT event_type AS topic, COUNT(*) AS mention_count
        FROM events, mx
        WHERE ts >= now_ts - INTERVAL 24 HOUR
        GROUP BY event_type
    )
    SELECT topic, mention_count,
           ROUND(least(1.0,
                 least(1.0, mention_count / 100.0)
                 + CASE WHEN topic IN ('click', 'purchase') THEN 0.05 ELSE 0.0 END),
                 6) AS confidence
    FROM m
    """,
    survey_ids="A9 (confidence from mention count + whitelist boost)",
)
def a9_topic_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    now_ts = ev.select(F.max("ts").alias("now_ts"))
    m = (
        ev.crossJoin(F.broadcast(now_ts))
        .filter(F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 24 HOUR"))
        .groupBy(F.col("event_type").alias("topic"))
        .agg(F.count(F.lit(1)).alias("mention_count"))
    )
    boost = F.when(F.col("topic").isin("click", "purchase"), F.lit(0.05)).otherwise(
        F.lit(0.0)
    )
    # Reference parity: the whitelist boost is capped at 1.0 AFTER the
    # add (topic_analyzer.py:360 `min(1.0, confidence + boost)`) — a
    # maxed-out base must not emit 1.05.
    return m.select(
        "topic",
        "mention_count",
        F.round(
            F.least(
                F.lit(1.0),
                F.least(F.lit(1.0), F.col("mention_count") / 100.0) + boost,
            ),
            6,
        ).alias("confidence"),
    )


@query(
    "st8_rate_limit",
    """
    WITH t AS (
        SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
        FROM events WHERE event_type = 'signup'
    )
    SELECT event_id, user_id, ts_us,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_us
                          RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
               AS recent_cnt,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_us
                          RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING) < 5
               AS allowed
    FROM t
    """,
    survey_ids="ST8 (sliding-window per-key rate limit), S11 token-bucket shape",
)
def st8_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    t = ev.select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"))
    # Event-time sliding window as a RANGE frame: each send sees how many
    # sends the same key made in the previous hour (reference rate:tg
    # buckets, DATABASE.md:518-521). One shuffle on the key.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3600 * 1000000, -1)
    )
    cnt = F.count(F.lit(1)).over(w)
    return t.select(
        "event_id", "user_id", "ts_us", cnt.alias("recent_cnt"), (cnt < 5).alias("allowed")
    )
