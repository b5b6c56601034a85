"""Plan inspection, cost guard, and query-shape lint (SURVEY.md §4).

The reference guards warehouse scans operationally (BigQuery dry-run
bytes vs BQ_MAX_SCANNED_GB, SQL template lint requiring LIMIT + a time
predicate — api/providers/onchain/bq_provider.py:459-602). Catalyst has
no such governor built in; this package supplies it as pre-flight checks
over the optimized plan.
"""

from .guard import ScanCostExceeded, estimated_input_bytes, scan_cost_guard
from .lint import LintViolation, lint_query_shape
from .inspect import plan_features

__all__ = [
    "ScanCostExceeded",
    "estimated_input_bytes",
    "scan_cost_guard",
    "LintViolation",
    "lint_query_shape",
    "plan_features",
]
