#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full computation, no driver
collect) — the number measures the engine, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: one per operator family (SURVEY.md §2), heavy enough to
# exercise shuffles/joins/windows at sf0.1.
HEADLINE = [
    "q1_pricing_summary",
    "q5_region_revenue",
    "q3_top_orders",
    "a5_distinct_stats",
    "j3_card_merge",
    "c4_event_key_dedup",
    "a1_event_upsert_merge",
    "d4_evidence_merge",
    "a2_topic_aggregate",
    "a3_w5_heat_slope",
    "w2_growth_ratio",
    "w4_regr_slope",
    "w7_latest_per_key",
    "e2_jaccard_user_pairs",
    "r1_rules_eval",
    "r6_onchain_verdict",
    "x_text_stats",
    "dd_exact_dedup",
    "dd_minhash_lsh",
    "dd_ngram_jaccard",
    "ann_cosine_topk",
    "c13_keyphrases",
    "w8_series_split",
    "a10_t7_batch_scan",
    "d6_cooldown_emit",
    "u4_u6_rules_refiner",
    "t8_mmr_keyphrases",
    "mm_media_features",
    "flagship_heat_rules",
]


def main() -> None:
    from event_stream_starter_spark.queries import all_queries
    from event_stream_starter_spark.session import get_spark

    spark = get_spark("ess-bench", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}
    # Warm the JVM + parquet footers + Python UDF workers once.
    specs["a3_w5_heat_slope"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    specs["mm_media_features"].fn(spark, SF_DIR).limit(10).write.format("noop").mode(
        "overwrite"
    ).save()

    total = 0.0
    for name in HEADLINE:
        fn = specs[name].fn
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
