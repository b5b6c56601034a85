"""Dump `.explain("formatted")` for named queries to
plans/r11/<query>_<tag>.txt (the optimization round's evidence files).

Usage: python scripts/dump_plans_r11.py <tag> q1 q2 ...
Driver-side only (no job execution) — safe to run while other work runs.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from event_stream_starter_spark.queries import all_queries  # noqa: E402
from event_stream_starter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11")

tag = sys.argv[1]
names = sys.argv[2:]
assert names, "pass a tag then query names"

spark = get_spark("ess-plans-r11")
spark.sparkContext.setLogLevel("ERROR")
specs = all_queries()
os.makedirs(OUT, exist_ok=True)

from event_stream_starter_spark.io import ingest_managed  # noqa: E402

ingest_managed(spark, SF_DIR)

for name in names:
    df = specs[name].fn(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(OUT, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(plan)
    n_exch = plan.count("Exchange")
    joins = [
        w
        for w in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        )
        if w in plan
    ]
    pyeval = [
        w
        for w in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow")
        if w in plan
    ]
    print(f"{name}: {len(plan.splitlines())} lines, Exchange x{n_exch}, joins={joins}, py={pyeval} -> {path}")
