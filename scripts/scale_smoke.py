"""Scale smoke: synthesize a 10x events table (1M rows vs sf0.1's 100k)
in a scratch dir and run the core pipeline queries against it.

Purpose: evidence that the plan shapes (partial agg before shuffle,
window partitioning, key-hash dedup, percentiles) hold when the data
outgrows the driver-provided SFs — catch anything that accidentally
depends on a small row count (broadcast of a big side, collect of a
fact table, per-group memory blowups). Not part of CI (runtime ~1 min);
run manually: `python scripts/scale_smoke.py [n_events]`.

The synthetic table matches the driver schema (FIXTURES.md §B) so every
events-table query runs unmodified.

Measured (local[32], 2026-08-13, 1M events = 10x sf0.1): c4 dedup
4.3s, a1 upsert 2.4s, a2 topics 1.5s, a3/w5 heat 2.2s, w2 growth 2.4s,
w7 latest 1.4s, st9 percentiles 1.8s, j6 asof 3.1s, d2 fingerprint
1.7s, flagship 3.2s — ~2-4x the sf0.1 times for 10x the rows
(shuffle-parallel sub-linear scaling; ~500k rows/s per query).
"""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from event_stream_starter_spark.queries import all_queries  # noqa: E402
from event_stream_starter_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

QUERIES = [
    "c4_event_key_dedup",
    "a1_event_upsert_merge",
    "a2_topic_aggregate",
    "a3_w5_heat_slope",
    "w2_growth_ratio",
    "w7_latest_per_key",
    "st9_latency_percentiles",
    "j6_asof_snapshot_enrich",
    "d2_fingerprint_dedup",
    "flagship_heat_rules",
]


def main() -> None:
    spark = get_spark("scale-smoke", cpus=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="ess_scale_")

    # Deterministic synthetic events: same columns/types as the driver
    # table, heavier tail on user_id so groupBy sees skew.
    types = F.array(*[F.lit(t) for t in ["view", "click", "purchase", "share"]])
    ev = (
        spark.range(N)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                (F.lit(1700000000) + (F.col("id") % 604800)) * 1_000_000
            ).alias("ts"),
            (F.xxhash64("id") % 20000 + 20000).alias("user_id"),
            types[(F.col("id") % 4).cast("int")].alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit(1)), 10000) / 100.0).alias("value"),
            F.concat(F.lit('{"k":'), (F.col("id") % 97).cast("string"), F.lit("}")).alias(
                "props"
            ),
        )
        .repartition(32)
    )
    ev.write.mode("overwrite").parquet(f"{out}/events.parquet")
    # flagship also reads documents; reuse sf0.1's (content-independent).
    import shutil

    shutil.copy("/root/testdata/sf0.1/documents.parquet", f"{out}/documents.parquet")

    specs = all_queries()
    total = 0.0
    for name in QUERIES:
        t0 = time.perf_counter()
        specs[name].fn(spark, out).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        total += dt
        print(f"{name}: {dt:.2f}s @ {N} events")
    print(f"TOTAL {total:.1f}s for {len(QUERIES)} queries at {N} rows "
          f"({N / max(total, 1e-9):,.0f} rows/s aggregate)")


if __name__ == "__main__":
    main()
