"""Local replica of the driver's DuckDB-oracle comparison.

The driver compares ``spark_df.toPandas()`` against ``duckdb .df()``:
it sorts columns by name, sorts rows by all columns, then hashes the
values — so pandas DTYPES are part of the contract (DuckDB renders
HUGEINT/DECIMAL as float64; Spark gives int64 / object-Decimal: equal
values, different dtype, different hash) and list-valued cells crash
its sort outright.  ``compare`` below replicates that gate strictly;
``compare_values`` keeps the older fetchall()-based value diff as a
debugging aid (it tells you whether a dtype red is value-neutral)."""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

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


def compare_values(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Order-insensitive VALUE comparison via fetchall() (9-dp float round).

    Weaker than the driver's gate (ignores pandas dtypes) — use it to
    confirm a `compare` dtype red is value-neutral, never as the gate."""
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


_UNSORTABLE = (list, dict, set, np.ndarray)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: columns sorted by name, rows sorted
    by all columns.  Raises TypeError on list/array-valued cells exactly
    like the driver's pandas sort does."""
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            for v in df[c]:
                if isinstance(v, _UNSORTABLE):
                    raise TypeError(
                        f"unsortable cell type {type(v).__name__} in column {c!r} "
                        "(driver canonicalizer would crash: serialize arrays with "
                        "array_join/to_json in BOTH engines)"
                    )
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _cells_equal(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)) or (
        isinstance(b, float) and math.isnan(b)
    ):
        a_na = a is None or (isinstance(a, float) and math.isnan(a))
        b_na = b is None or (isinstance(b, float) and math.isnan(b))
        return a_na and b_na
    if type(a) is not type(b):
        return False
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Dtype-strict replica of the driver's pandas hash gate.

    Empty list == the driver would record rows/schema/hash green."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    dp = con.execute(sql).df()
    if sorted(sp.columns) != sorted(dp.columns):
        return [f"schema mismatch: spark={sorted(sp.columns)} duck={sorted(dp.columns)}"]
    if len(sp) != len(dp):
        return [f"row count: spark={len(sp)} duck={len(dp)}"]
    try:
        sc = canonicalize(sp)
    except TypeError as e:
        return [f"spark canonicalize: {e}"]
    try:
        dc = canonicalize(dp)
    except TypeError as e:
        return [f"oracle canonicalize: {e}"]
    for c in sc.columns:
        st, dt = str(sc[c].dtype), str(dc[c].dtype)
        if st != dt:
            problems.append(f"dtype mismatch col {c!r}: spark={st} duck={dt}")
    if problems:
        return problems
    for c in sc.columns:
        s_v, d_v = sc[c], dc[c]
        if str(s_v.dtype) == "object":
            bad = [
                i
                for i in range(min(len(s_v), len(d_v)))
                if not _cells_equal(s_v.iloc[i], d_v.iloc[i])
            ]
        elif str(s_v.dtype).startswith("float"):
            sv, dv = s_v.to_numpy(), d_v.to_numpy()
            neq = ~((sv == dv) | (np.isnan(sv) & np.isnan(dv)))
            bad = list(np.nonzero(neq)[0])
        else:
            sv, dv = s_v.to_numpy(), d_v.to_numpy()
            if np.issubdtype(sv.dtype, np.datetime64) or np.issubdtype(
                dv.dtype, np.datetime64
            ):
                neq = (sv != dv) & ~(np.isnat(sv) & np.isnat(dv))
                bad = list(np.nonzero(neq)[0])
            else:
                neq = sv != dv
                if hasattr(neq, "to_numpy"):
                    neq = neq.to_numpy()
                bad = list(np.nonzero(neq)[0])
        if bad:
            i = int(bad[0])
            problems.append(
                f"value mismatch col {c!r}: {len(bad)} differing rows, first at "
                f"canon row {i}: spark={s_v.iloc[i]!r} duck={d_v.iloc[i]!r}"
            )
    return problems
