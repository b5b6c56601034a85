"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query on /root/testdata/sf0.001 (smoke check).
- ``queries()``: every implemented SURVEY.md §2 operator as a named
  (spark, sf_dir) -> DataFrame callable.
- ``oracle_sql()``: matching DuckDB SQL per query (omitted only for
  engine-specific/approximate operators, which get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from event_stream_starter_spark.queries import all_queries
from event_stream_starter_spark.session import tune_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    specs = all_queries()
    return specs["flagship_heat_rules"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in all_queries().items():
        fn = spec.fn

        def wrapped(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            tune_session(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
