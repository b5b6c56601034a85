"""Bench the full HEADLINE set at the sf1 tier (10x sf0.1; see
scripts/gen_sf1.py) and write BENCH_sf1_r11.json — the larger-SF
evidence tier VERDICT r10 asked for ("at sf0.1 the suite is
fixed-overhead-bound; 8 cores beat 32").

bench.py itself is untouched (the driver contract stays best-of-4 at
$SPARK_GRAFT_SF_DIR); this is a SEPARATE artifact: same query list,
same noop-sink methodology, same session factory, best-of-N with
N=$SF1_PASSES (default 1 — a full sf1 pass is ~15-30 min because the
declared corpus-quadratic oracle arms scale ~100x).

Usage: [SF1_DIR=/root/sf1] [SF1_PASSES=1] python scripts/bench_sf1.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (HEADLINE list + contract constants)
from event_stream_starter_spark.io import ingest_managed  # noqa: E402
from event_stream_starter_spark.queries import all_queries  # noqa: E402
from event_stream_starter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF1_DIR", "/root/sf1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PASSES = int(os.environ.get("SF1_PASSES", "1"))

spark = get_spark("ess-bench-sf1", cpus=CPUS, shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")
specs = all_queries()

ingest_managed(spark, SF_DIR)
warm = "/root/testdata/sf0.001"
for name in bench.HEADLINE:
    specs[name].fn(spark, warm).write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()
spark.range(CPUS * 10).repartition(CPUS).mapInPandas(
    lambda it: it, "id long"
).write.format("noop").mode("overwrite").save()

best = {name: float("inf") for name in bench.HEADLINE}
for _ in range(PASSES):
    for name in bench.HEADLINE:
        spark.sparkContext.setJobDescription(f"sf1:{name}")
        t0 = time.perf_counter()
        specs[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        best[name] = min(best[name], time.perf_counter() - t0)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {best[name]:.2f}s", flush=True)

timings = {k: round(v, 3) for k, v in best.items()}
line = json.dumps(
    {
        "metric": "headline_suite_total_sf1",
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 1.0,
        "n_queries": len(timings),
        "passes": PASSES,
        "cpus": CPUS,
        "env": {"loadavg_1m": round(os.getloadavg()[0], 2)},
    }
)
print(line)
out = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_sf1_r11.json",
)
with open(out, "w") as f:
    f.write(line + "\n")
