"""Scale-posture operators: salted aggregation equivalence, partitioned
sink pruning (the plan must show partition filters and touch fewer
files), bucketed keyed layout."""

from __future__ import annotations

import pyspark.sql.functions as F

from event_stream_starter_spark.io import load_table
from event_stream_starter_spark.operators.skew import salted_agg
from event_stream_starter_spark.sinks import (
    key_bucket,
    write_events_partitioned,
    write_keyed_bucketed,
)


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        r["event_type"]: (r["cnt"], r["total"], r["vmin"], r["vmax"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    salted = {
        r["event_type"]: (r["cnt"], r["total"], r["vmin"], r["vmax"])
        for r in salted_agg(
            ev,
            ["event_type"],
            {
                "cnt": ("count", "value"),
                "total": ("sum", "value"),
                "vmin": ("min", "value"),
                "vmax": ("max", "value"),
            },
            n_salts=8,
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert abs(plain[k][1] - salted[k][1]) < 1e-6 * max(1.0, abs(plain[k][1]))
        assert plain[k][2] == salted[k][2]
        assert plain[k][3] == salted[k][3]


def test_partitioned_sink_prunes(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_part")
    write_events_partitioned(ev, path)

    back = spark.read.parquet(path)
    assert back.count() == ev.count()

    one_day = back.filter(F.col("dt") == "2024-01-02")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # Partition pruning: the dt predicate must land in PartitionFilters,
    # not in a post-scan Filter over all data.
    assert "PartitionFilters" in plan and "dt" in plan.split("PartitionFilters")[1][:200]
    n_total_files = back.select(F.input_file_name()).distinct().count()
    n_read_files = one_day.select(F.input_file_name()).distinct().count()
    assert 0 < n_read_files < n_total_files


def test_bucketed_keyed_layout_lookup_touches_one_bucket(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        F.concat(F.lit("k"), (F.col("user_id") % 50).cast("string")).alias("event_key"),
        "value",
    )
    path = str(tmp_path / "keyed")
    write_keyed_bucketed(ev, path, "event_key", n_buckets=16)
    back = spark.read.parquet(path)
    assert back.count() == ev.count()

    target_bucket = back.filter(F.col("event_key") == "k7").select("bucket").first()[0]
    # The reader recomputes the bucket from the key → one partition read.
    lookup = back.filter(
        (F.col("bucket") == key_bucket(F.lit("k7"), 16)) & (F.col("event_key") == "k7")
    )
    assert lookup.count() == ev.filter(F.col("event_key") == "k7").count()
    assert target_bucket == lookup.select("bucket").first()[0]
    n_files = lookup.select(F.input_file_name()).distinct().count()
    total_files = back.select(F.input_file_name()).distinct().count()
    assert n_files <= max(1, total_files // 8)


def test_results_invariant_to_partition_count(spark, sf_dir):
    """Determinism at scale: re-running key aggregate/join/percentile
    queries with shuffle parallelism 2 vs 27 must produce IDENTICAL
    results (decimal-native money sums, explicit tiebreaks and
    interpolated percentiles are all partition-order-independent by
    design — this is the proof)."""
    from event_stream_starter_spark.queries import all_queries

    names = [
        "q1_pricing_summary",
        "a1_event_upsert_merge",
        "st9_latency_percentiles",
        "w7_latest_per_key",
        "d4_evidence_merge",
        # Expand-lattice partial aggregation and the strip query's
        # array_sort(collect_list) reassembly must also be
        # partition-order-independent.
        "a12_rollup_lattice",
        "x_boilerplate_strip",
        # LM scores sum rounded log terms as DECIMAL — the whole point
        # is that a 100TB sum must not depend on partition order; this
        # is that claim's proof for the trigram-model family.
        "x_ccnet_lm_buckets",
        "x_dsir_select",
    ]
    specs = all_queries()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("2", "27"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                rows = sorted(map(str, specs[n].fn(spark, sf_dir).collect()))
                results.setdefault(n, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    for n, (a, b) in results.items():
        assert a == b, f"{n} differs across partition counts"


def test_merge_versioned_guard(spark):
    """Stale recompute (lower calc_version) must never clobber a newer
    row; equal version overwrites (idempotent re-delivery); new keys
    insert; untouched keys survive."""
    from event_stream_starter_spark.sinks import merge_versioned

    schema = "k string, payload string, calc_version long"
    cur = spark.createDataFrame(
        [("a", "v2-data", 2), ("b", "v5-data", 5), ("c", "v1-data", 1)], schema
    )
    inc = spark.createDataFrame(
        [("a", "v1-late", 1),   # stale → rejected
         ("b", "v5-replay", 5), # equal → overwritten (idempotent redelivery)
         ("d", "v3-new", 3)],   # new key → inserted
        schema,
    )
    got = {r["k"]: (r["payload"], r["calc_version"])
           for r in merge_versioned(cur, inc, "k").collect()}
    assert got == {
        "a": ("v2-data", 2),
        "b": ("v5-replay", 5),
        "c": ("v1-data", 1),
        "d": ("v3-new", 3),
    }


def test_merge_versioned_null_version_edges(spark):
    """Presence, not version, drives the row decision: a new key with a
    NULL version still inserts; a NULL-version recompute never clobbers
    versioned state; a NULL-version current row is always replaceable."""
    from event_stream_starter_spark.sinks import merge_versioned

    schema = "k string, payload string, calc_version long"
    cur = spark.createDataFrame(
        [("a", "v2-data", 2), ("n", "unversioned", None)], schema
    )
    inc = spark.createDataFrame(
        [("a", "nover-late", None),  # NULL version vs versioned → rejected
         ("n", "v1-fill", 1),        # versioned vs NULL current → replaces
         ("e", "new-nover", None)],  # new key, NULL version → still inserts
        schema,
    )
    got = {r["k"]: (r["payload"], r["calc_version"])
           for r in merge_versioned(cur, inc, "k").collect()}
    assert got == {
        "a": ("v2-data", 2),
        "n": ("v1-fill", 1),
        "e": ("new-nover", None),
    }
