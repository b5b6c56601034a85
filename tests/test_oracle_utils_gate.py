"""Unit tests for the dtype-strict oracle gate itself (tests/oracle_utils).

The gate is the single local predictor of the driver's pandas hash
check; these tests pin its failure modes so a refactor can't silently
weaken it back into the value-only comparison that missed 14 driver
reds in round 1.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_utils import canonicalize, compare


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_equal_frames_pass(spark, con):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "i long, s string, x double")
    assert compare(df, con, "SELECT CAST(i AS BIGINT) AS i, s, x FROM (VALUES (1, 'a', 1.5), (2, 'b', 2.5)) t(i, s, x)") == []


def test_row_order_is_irrelevant(spark, con):
    df = spark.createDataFrame([(2, "b"), (1, "a")], "i long, s string")
    assert compare(df, con, "SELECT CAST(i AS BIGINT) AS i, s FROM (VALUES (1, 'a'), (2, 'b')) t(i, s)") == []


def test_dtype_mismatch_int_vs_float_reds(spark, con):
    # DuckDB HUGEINT/DECIMAL render float64; Spark long is int64 — the
    # round-1 failure class. Equal values must still red.
    df = spark.createDataFrame([(1,), (2,)], "v long")
    probs = compare(df, con, "SELECT CAST(v AS DOUBLE) AS v FROM (VALUES (1), (2)) t(v)")
    assert probs and "dtype mismatch" in probs[0]


def test_decimal_object_column_reds(spark, con):
    df = spark.createDataFrame([(1,)], "v long").selectExpr(
        "CAST(v AS DECIMAL(10,2)) AS v"
    )
    probs = compare(df, con, "SELECT CAST(1 AS DOUBLE) AS v")
    assert probs and "dtype mismatch" in probs[0]


def test_list_cells_red_loudly(spark, con):
    df = spark.createDataFrame([(1, ["a", "b"])], "i long, arr array<string>")
    probs = compare(df, con, "SELECT CAST(1 AS BIGINT) AS i, ['a', 'b'] AS arr")
    assert probs and "canonicalize" in probs[0]


def test_value_mismatch_reds_with_location(spark, con):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "i long, s string")
    probs = compare(df, con, "SELECT CAST(i AS BIGINT) AS i, s FROM (VALUES (1, 'a'), (2, 'X')) t(i, s)")
    assert probs and "value mismatch" in probs[0] and "'s'" in probs[0]


def test_row_count_mismatch_reds(spark, con):
    df = spark.createDataFrame([(1,)], "i long")
    probs = compare(df, con, "SELECT CAST(i AS BIGINT) AS i FROM (VALUES (1), (2)) t(i)")
    assert probs and "row count" in probs[0]


def test_nan_equals_nan_and_none(spark, con):
    df = spark.createDataFrame([(1, float("nan")), (2, None)], "i long, x double")
    assert (
        compare(
            df,
            con,
            "SELECT CAST(i AS BIGINT) AS i, x FROM (VALUES (1, CAST('nan' AS DOUBLE)), (2, CAST(NULL AS DOUBLE))) t(i, x)",
        )
        == []
    )


def test_float_last_ulp_difference_reds(spark, con):
    # The driver hashes raw float64 — the gate must be bit-strict, not
    # round-to-9dp tolerant like the old value comparison.
    df = spark.createDataFrame([(0.1 + 0.2,)], "x double")
    probs = compare(df, con, "SELECT CAST(0.3 AS DOUBLE) AS x")
    assert probs and "value mismatch" in probs[0]


def test_canonicalize_sorts_columns_and_rows():
    import pandas as pd

    df = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    out = canonicalize(df)
    assert list(out.columns) == ["a", "b"]
    assert out["a"].tolist() == ["x", "y"] and out["b"].tolist() == [1, 2]
