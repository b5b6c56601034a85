"""Scan cost guard (SURVEY.md §4: BigQuery dry-run analog).

The reference dry-runs every warehouse query and refuses to execute when
``total_bytes_processed`` exceeds ``BQ_MAX_SCANNED_GB`` (bq_provider.py:
459-514). The Spark equivalent is a pre-flight over Catalyst statistics:
``optimizedPlan.stats.sizeInBytes`` reflects file-source sizes after
partition pruning and column pruning, i.e. the same "what would this
cost" estimate — no job runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_MAX_BYTES = 10 * 1024**3  # 10 GB — BQ_MAX_SCANNED_GB default


class ScanCostExceeded(RuntimeError):
    def __init__(self, estimated: int, budget: int):
        self.estimated = estimated
        self.budget = budget
        super().__init__(
            f"estimated input {estimated} bytes exceeds scan budget {budget} bytes"
        )


def estimated_input_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate of the optimized plan's inputs: sum of
    leaf-relation statistics (file sizes after pruning)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        total += int(leaves.apply(i).stats().sizeInBytes())
    return total


def scan_cost_guard(df: DataFrame, max_bytes: int = DEFAULT_MAX_BYTES) -> DataFrame:
    """Raise :class:`ScanCostExceeded` when the plan's estimated input
    exceeds the budget; otherwise pass the frame through (chainable).

    Degrade-path usage mirrors the reference: callers catch the error and
    serve the stale snapshot instead (ST7)."""
    est = estimated_input_bytes(df)
    if est > max_bytes:
        raise ScanCostExceeded(est, max_bytes)
    return df
