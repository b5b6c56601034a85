"""Golden tests for queries whose semantics are not SQL-expressible:
re-compute the expected result in pure Python and compare exactly."""

from __future__ import annotations

import os

import duckdb

from event_stream_starter_spark.queries import all_queries
from event_stream_starter_spark.queries.ops import COOLDOWN_SEC


def test_d6_cooldown_matches_python_greedy(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us "
        f"FROM read_parquet('{os.path.join(sf_dir, 'events.parquet')}') "
        "WHERE event_type = 'purchase' ORDER BY user_id, ts_us"
    ).fetchall()
    con.close()

    expected: set[tuple[int, int]] = set()
    last_emit: dict[int, int] = {}
    for user_id, ts_us in rows:
        last = last_emit.get(user_id)
        if last is None or ts_us >= last + COOLDOWN_SEC * 1_000_000:
            expected.add((user_id, ts_us))
            last_emit[user_id] = ts_us

    df = all_queries()["d6_cooldown_emit"].fn(spark, sf_dir)
    actual = {(r["user_id"], r["emit_ts_us"]) for r in df.collect()}
    assert actual == expected
