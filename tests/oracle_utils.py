"""Local replica of the driver's DuckDB-oracle comparison: row count,
sorted column names, and order-insensitive value comparison."""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb

from event_stream_starter_spark.schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(round(v, 9)))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("o", str(v))


def union_find_clusters(pairs) -> dict:
    """Pure-Python connected-components oracle over (a, b) edge pairs:
    returns node -> min-id cluster label (shared by the dedup-clustering
    golden tests; keep ONE implementation of the oracle semantics)."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    spark_rows = spark_df.collect()
    spark_cols = sorted(spark_df.columns)
    duck = con.execute(sql)
    duck_cols_full = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()
    duck_cols = sorted(duck_cols_full)
    if spark_cols != duck_cols:
        problems.append(f"schema mismatch: spark={spark_cols} duck={duck_cols}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count: spark={len(spark_rows)} duck={len(duck_rows)}")
    s_idx = [spark_df.columns.index(c) for c in spark_cols]
    d_idx = [duck_cols_full.index(c) for c in spark_cols]
    s_set = sorted(tuple(_norm(r[i]) for i in s_idx) for r in spark_rows)
    d_set = sorted(tuple(_norm(r[i]) for i in d_idx) for r in duck_rows)
    if s_set != d_set:
        ds, ss = set(d_set), set(s_set)  # built once, not per element
        diff_s = [r for r in s_set if r not in ds][:3]
        diff_d = [r for r in d_set if r not in ss][:3]
        problems.append(
            f"value mismatch: spark-only={diff_s} duck-only={diff_d} (cols={spark_cols})"
        )
    return problems
