"""Schema guards (SURVEY §5.4, reference tests/test_schema_guard.py):
pin the engine-facing shapes — input tables after load_table
normalization, and the output schema of contract-critical queries (the
driver hash-compares on column names; a silent rename breaks the gate).
"""

from __future__ import annotations

import pytest

from event_stream_starter_spark.io import load_table
from event_stream_starter_spark.queries import all_queries

TABLE_SCHEMAS = {
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}

QUERY_SCHEMAS = {
    "a1_event_upsert_merge": [
        "event_key", "start_ts_us", "last_ts_us", "evidence_count",
        "max_weight", "last_value",
    ],
    "a3_w5_heat_slope": [
        "event_type", "cnt_10m", "cnt_30m", "prev_10m", "slope", "trend",
        "degrade",
    ],
    "r1_rules_eval": [
        "event_id", "total_score", "level", "reasons", "missing_sources",
        "hit_count",
    ],
    "j6_asof_snapshot_enrich": [
        "event_id", "user_id", "ts_us", "event_type", "snap_ts_us", "snap_value",
    ],
    "flagship_heat_rules": None,  # asserted non-empty below, shape free
}


@pytest.mark.parametrize("table", sorted(TABLE_SCHEMAS))
def test_input_table_schema_pinned(spark, sf_dir, table):
    got = load_table(spark, sf_dir, table).dtypes
    assert got == TABLE_SCHEMAS[table], got


@pytest.mark.parametrize("name", sorted(k for k, v in QUERY_SCHEMAS.items() if v))
def test_query_output_columns_pinned(spark, sf_dir, name):
    df = all_queries()[name].fn(spark, sf_dir)
    assert df.columns == QUERY_SCHEMAS[name], df.columns


def test_flagship_has_stable_nonempty_schema(spark, sf_dir):
    df = all_queries()["flagship_heat_rules"].fn(spark, sf_dir)
    assert df.columns and len(df.columns) == len(set(df.columns))


def test_event_key_nulls_on_missing_type(spark):
    """Reference vector (tests/test_events_hardening.py:7-18:
    make_event_key raises on a missing type): the engine's analog is a
    NULL key — a type-less row must NOT silently hash into a
    (user, bucket)-only dedup group, which concat_ws's null-skipping
    would have done. Present-type rows still yield 40-hex keys."""
    import pyspark.sql.functions as F

    from event_stream_starter_spark.functions.hashing import key_concat, ts_bucket

    df = spark.createDataFrame(
        [(1, "click", 1000), (2, None, 1000)],
        "user_id long, event_type string, epoch long",
    ).select(
        "user_id",
        "event_type",
        F.substring(
            F.sha2(
                key_concat(
                    F.col("user_id").cast("string"),
                    F.col("event_type"),
                    (F.floor(F.col("epoch") / 600) * 600).cast("long").cast("string"),
                ),
                256,
            ),
            1,
            40,
        ).alias("event_key"),
    )
    got = {r["user_id"]: r["event_key"] for r in df.collect()}
    assert got[2] is None
    assert got[1] is not None and len(got[1]) == 40
