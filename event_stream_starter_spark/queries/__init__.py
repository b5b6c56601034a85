"""Query catalog: every SURVEY.md §2 operator exposed as a named query.

Each entry pairs a Spark DataFrame builder (spark, sf_dir) -> DataFrame
with an equivalent DuckDB oracle SQL string (None for genuinely
non-SQL-expressible / approximate operators, which get a rows-only check).

Output conventions (correctness-gate hygiene):
- no TimestampType outputs: timestamps are emitted as epoch microseconds
  (BIGINT) so session-timezone differences can never flip a hash;
- double outputs of per-row arithmetic are rounded (6 dp) in both engines;
- aggregates over doubles are cast to DECIMAL before summing so the
  result is exact and order-independent (a 100TB sum must not depend on
  partition order);
- every computed column is aliased identically in both engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ids: str = ""  # SURVEY §2 operator ids this query certifies


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, survey_ids: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, survey_ids=survey_ids)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules once.
    from . import (  # noqa: F401
        cards,
        classifier,
        corpusstats,
        eventstream,
        flagship,
        keys_limits,
        knlm,
        mmedia,
        ops,
        pipeline_e2e,
        relational,
        retrieval,
        rules_q,
        scalars,
        textdata,
        tokenizer,
        udf_fallbacks,
        vectors,
    )
    from . import datacard2  # noqa: F401  (imports LAST: reads REGISTRY oracles)

    return dict(REGISTRY)
