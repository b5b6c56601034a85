"""The local correctness gate: every oracle-checkable query must match
its DuckDB oracle exactly (row count + schema + order-insensitive values)
— a replica of the driver's t2 check, run at sf0.001 for speed."""

from __future__ import annotations

import pytest

from event_stream_starter_spark.queries import all_queries
from tests.oracle_utils import compare, duck_connection

SPECS = all_queries()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, duck, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    problems = compare(df, duck, spec.oracle)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
