"""Engine-native table schemas (explicit StructTypes; never inferred on hot paths).

Derived from the reference data model (see SURVEY.md §1.2 and FIXTURES.md §A;
reference citations: api/models.py:22-51, DATABASE.md:27-175, 320-338, 525-589,
api/events.py:589-619). These are the keyed tables the streaming pipeline
maintains; the driver's TPC-H-ish testdata plays the warehouse role.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Evidence array element (reference: api/events.py:589-619).
EVIDENCE_ELEM = T.StructType(
    [
        T.StructField("source", T.StringType()),  # 'x' | 'dex' | 'goplus'
        T.StructField("ts", T.StringType()),  # ISO8601 'Z'
        T.StructField("ref", T.MapType(T.StringType(), T.StringType())),
        T.StructField("summary", T.StringType()),
        T.StructField("weight", T.DoubleType()),
    ]
)

RAW_POSTS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("author", T.StringType()),
        T.StructField("text", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("urls", T.ArrayType(T.StringType())),
        T.StructField("token_ca", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("is_candidate", T.BooleanType()),
        T.StructField("sentiment_label", T.StringType()),
        T.StructField("sentiment_score", T.DoubleType()),
        T.StructField("keywords", T.ArrayType(T.StringType())),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_key", T.StringType(), False),  # 40-hex content hash
        T.StructField("type", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("evidence", T.ArrayType(EVIDENCE_ELEM)),
        T.StructField("impacted_assets", T.ArrayType(T.StringType())),
        T.StructField("start_ts", T.TimestampType(), False),
        T.StructField("last_ts", T.TimestampType(), False),
        T.StructField("heat_10m", T.IntegerType()),
        T.StructField("heat_30m", T.IntegerType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("token_ca", T.StringType()),
        T.StructField("topic_hash", T.StringType()),  # 12-hex
        T.StructField("time_bucket_start", T.TimestampType()),
        T.StructField("evidence_count", T.IntegerType()),
        T.StructField("candidate_score", T.DoubleType()),
        T.StructField("keywords_norm", T.ArrayType(T.StringType())),
        T.StructField("version", T.StringType()),
        T.StructField("last_sentiment", T.StringType()),
        T.StructField("last_sentiment_score", T.DoubleType()),
    ]
)

SIGNALS = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("event_key", T.StringType(), False),
        T.StructField("type", T.StringType()),  # topic|primary|secondary|market_risk
        T.StructField("market_type", T.StringType()),
        T.StructField("advice_tag", T.StringType()),
        T.StructField("confidence", T.IntegerType()),
        T.StructField("goplus_risk", T.StringType()),  # red|yellow|green|unknown|gray
        T.StructField("buy_tax", T.DoubleType()),
        T.StructField("sell_tax", T.DoubleType()),
        T.StructField("lp_lock_days", T.IntegerType()),
        T.StructField("honeypot", T.BooleanType()),
        T.StructField("dex_liquidity", T.DoubleType()),
        T.StructField("dex_volume_1h", T.DoubleType()),
        T.StructField("heat_slope", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("topic_id", T.StringType()),
        T.StructField("topic_entities", T.ArrayType(T.StringType())),
        T.StructField("topic_keywords", T.ArrayType(T.StringType())),
        T.StructField("topic_slope_10m", T.DoubleType()),
        T.StructField("topic_slope_30m", T.DoubleType()),
        T.StructField("topic_mention_count", T.IntegerType()),
        T.StructField("topic_confidence", T.DoubleType()),
        T.StructField("state", T.StringType(), False),  # candidate|verified|downgraded
        T.StructField("onchain_asof_ts", T.TimestampType()),
        T.StructField("onchain_confidence", T.DecimalType(4, 3)),
        T.StructField("source_level", T.StringType()),  # rumor|confirmed
        T.StructField("features_snapshot", T.StringType()),  # JSON document
        T.StructField("topic_sources", T.ArrayType(T.StringType())),
        T.StructField("topic_evidence_links", T.ArrayType(T.StringType())),
        T.StructField("topic_merge_mode", T.StringType()),
        T.StructField("calc_version", T.StringType()),
        T.StructField("degrade", T.BooleanType()),
    ]
)

ONCHAIN_FEATURES = T.StructType(
    [
        T.StructField("chain", T.StringType(), False),
        T.StructField("address", T.StringType(), False),
        T.StructField("as_of_ts", T.TimestampType(), False),
        T.StructField("window_minutes", T.IntegerType(), False),  # 30|60|180
        T.StructField("addr_active", T.IntegerType()),
        T.StructField("tx_count", T.IntegerType()),
        T.StructField("growth_ratio", T.DoubleType()),
        T.StructField("top10_share", T.DoubleType()),
        T.StructField("self_loop_ratio", T.DoubleType()),
        T.StructField("calc_version", T.IntegerType()),
    ]
)

PUSH_OUTBOX = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("channel_id", T.LongType()),
        T.StructField("thread_id", T.LongType()),
        T.StructField("event_key", T.StringType()),
        T.StructField("payload_json", T.StringType()),
        T.StructField("status", T.StringType(), False),  # pending|retry|done|dlq
        T.StructField("attempt", T.IntegerType()),
        T.StructField("next_try_at", T.TimestampType()),
        T.StructField("last_error", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

PUSH_OUTBOX_DLQ = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("ref_id", T.LongType()),
        T.StructField("snapshot", T.StringType()),
        T.StructField("failed_at", T.TimestampType()),
    ]
)

# Driver testdata schemas (TESTDATA.md / FIXTURES.md §B) — names only; the
# parquet files carry authoritative types.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
