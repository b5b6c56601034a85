"""Whole-catalog plan audit: every registered query must optimize to a
plan with no cartesian product — the one shape that's always wrong at
100TB. (Per-query plan details — pushdown, broadcast, pruning — are
asserted in tests/test_plans.py; this is the catalog-wide backstop so a
new query can't silently regress.)"""

from __future__ import annotations

from event_stream_starter_spark.plans import plan_features
from event_stream_starter_spark.queries import all_queries


def test_no_query_plans_a_cartesian_product(spark, sf_dir):
    offenders = []
    for name, spec in sorted(all_queries().items()):
        f = plan_features(spec.fn(spark, sf_dir))
        if f.has_cartesian:
            offenders.append(name)
    assert not offenders, f"cartesian product in: {offenders}"
