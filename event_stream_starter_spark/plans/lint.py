"""Query-shape lint (SURVEY.md §4: SQL template lint analog).

The reference refuses warehouse SQL lacking a LIMIT and a
``block_timestamp BETWEEN @from AND @to`` predicate (bq_provider.py:
581-602). Here the same contract is checked against the ANALYZED plan,
not the SQL text — so it works for DataFrame-built queries too and can't
be fooled by formatting.
"""

from __future__ import annotations

import re

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
    """Enforce bounded-scan shape: a RANGE filter on the event-time
    column must survive into the optimized plan, and a GlobalLimit must
    bound the result. Raises :class:`LintViolation` otherwise.

    The time-column match is exact — ``<col>#<exprId>`` attribute
    syntax, not a substring: a filter on ``counts`` or ``status`` must
    not satisfy a required ``ts`` predicate (a governor an unbounded
    scan can sneak past is worse than none). The attribute must appear
    inside a Filter condition together with a range comparison
    (> >= < <= BETWEEN), mirroring the reference's
    ``block_timestamp BETWEEN @from AND @to`` lint (bq_provider.py:
    581-602) — an IsNotNull alone is not a bound.
    """
    plan = _plan_string(df)
    problems: list[str] = []
    if require_time_predicate_on is not None:
        attr = re.compile(rf"\b{re.escape(require_time_predicate_on)}#\d+")
        range_op = re.compile(r"(>=|<=|>|<)")
        has_time_filter = False
        for line in plan.splitlines():
            stripped = line.strip("+- :")
            if not stripped.startswith("Filter "):
                continue
            # Only the condition segments that reference the time column
            # count, and at least one of them must be a range comparison.
            for seg in re.split(r"(?i)\s+AND\s+|\s+OR\s+", stripped[len("Filter "):]):
                if attr.search(seg) and range_op.search(seg):
                    has_time_filter = True
                    break
            if has_time_filter:
                break
        if not has_time_filter:
            problems.append(
                f"no time-range predicate on '{require_time_predicate_on}' "
                "in optimized plan"
            )
    if require_limit and "GlobalLimit" not in plan:
        problems.append("no LIMIT bounds the result")
    if problems:
        raise LintViolation("; ".join(problems))
    return df
