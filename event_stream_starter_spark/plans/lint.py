"""Query-shape lint (SURVEY.md §4: SQL template lint analog).

The reference refuses warehouse SQL lacking a LIMIT and a
``block_timestamp BETWEEN @from AND @to`` predicate (bq_provider.py:
581-602). Here the same contract is checked against the ANALYZED plan,
not the SQL text — so it works for DataFrame-built queries too and can't
be fooled by formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class LintViolation(ValueError):
    pass


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def lint_query_shape(
    df: DataFrame,
    require_time_predicate_on: str | None = "ts",
    require_limit: bool = True,
) -> DataFrame:
    """Enforce bounded-scan shape: a filter involving the event-time
    column must survive into the optimized plan, and a GlobalLimit must
    bound the result. Raises :class:`LintViolation` otherwise."""
    plan = _plan_string(df)
    problems: list[str] = []
    if require_time_predicate_on is not None:
        has_time_filter = False
        for line in plan.splitlines():
            stripped = line.strip("+- :")
            if stripped.startswith("Filter ") and require_time_predicate_on in stripped:
                has_time_filter = True
                break
        # Predicates pushed all the way into the scan also count.
        if not has_time_filter and f"PushedFilters" in plan and require_time_predicate_on in plan:
            has_time_filter = any(
                require_time_predicate_on in seg
                for seg in plan.split("PushedFilters:")[1:]
            )
        if not has_time_filter:
            problems.append(
                f"no time predicate on '{require_time_predicate_on}' in optimized plan"
            )
    if require_limit and "GlobalLimit" not in plan:
        problems.append("no LIMIT bounds the result")
    if problems:
        raise LintViolation("; ".join(problems))
    return df
