"""Performance SLAs (SURVEY §5.5, reference tests/test_topic_performance.py):
the reference pins stage latencies (topic detection <100ms, 1000-mention
aggregate <1s on its store). The engine equivalents below are smoke
bounds at sf0.001 — intentionally loose (10-20x headroom over measured
warm times) so a CI run under neighbor-process contention doesn't flake,
while a pathological regression (a cartesian, a driver-side loop, a lost
broadcast) still fails hard."""

from __future__ import annotations

import time

import pytest

from event_stream_starter_spark.queries import all_queries

# (query, seconds) — measured warm ~0.2-1.0s each at sf0.001; bound 15s.
SLAS = [
    ("a2_topic_aggregate", 15.0),   # reference: 50 topics/1000 mentions < 1s
    ("c4_event_key_dedup", 15.0),   # reference: entity dedup < 10ms/3000
    ("a3_w5_heat_slope", 15.0),     # reference: topic detection < 100ms
    ("r1_rules_eval", 15.0),        # reference: rules scoring 100ms budget
    ("flagship_heat_rules", 20.0),  # reference: P95 end-to-end < 2 min
]


@pytest.mark.parametrize("name,bound", SLAS)
def test_stage_latency_sla(spark, sf_dir, name, bound):
    fn = all_queries()[name].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    assert time.perf_counter() - t0 < bound
