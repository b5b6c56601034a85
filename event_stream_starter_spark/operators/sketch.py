"""Mergeable frequency sketches as pure-Catalyst tables.

A count-min sketch (Cormode & Muthukrishnan 2005) here is a DataFrame
of (j, b, cnt) rows, j < depth, b < width: fixed d x w size regardless
of input volume, built with one partial-agg shuffle, and mergeable by
construction — union two tables and groupBy-sum, counts add. That
additivity is what the streaming sink (streaming/sketch_sink.py)
exploits: per-batch partials accumulate into the exact sketch the
one-shot build would produce. Hash seeds are fixed (seeded xxhash64),
so sketches built anywhere agree bucket-for-bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CMS_D = 5  # depth: independent hash rows
CMS_W = 4096  # width: buckets per row


def cms_bucket(col: Column, j: int, w: int = CMS_W) -> Column:
    """Row-j bucket of a value: seeded xxhash64 mod width."""
    return F.pmod(F.xxhash64(col, F.lit(j)), F.lit(w)).cast("int")


def cms_table(
    items: DataFrame, col: str = "tok", d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Fold item OCCURRENCES into the (j, b, cnt) sketch table.

    Map-side explode to d rows per occurrence, then one groupBy with
    partial aggregation — the shuffle carries at most d*w rows per
    partition, so the table build is scan-dominated at any scale.
    """
    jb = [
        F.struct(F.lit(j).alias("j"), cms_bucket(F.col(col), j, w).alias("b"))
        for j in range(d)
    ]
    return (
        items.select(F.explode(F.array(*jb)).alias("jb"))
        .select("jb.j", "jb.b")
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    table: DataFrame,
    probes: DataFrame,
    col: str = "tok",
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point estimates for each probe row's `col`: min over the d row
    buckets. Join is sketch-sized x probes-sized on (j, b); probe rows
    whose bucket was never touched estimate 0 (empty-bucket min)."""
    jb = [
        F.struct(F.lit(j).alias("j"), cms_bucket(F.col(col), j, w).alias("b"))
        for j in range(d)
    ]
    exploded = probes.select(
        *probes.columns, F.explode(F.array(*jb)).alias("jb")
    ).select(*probes.columns, "jb.j", "jb.b")
    return (
        exploded.join(table, ["j", "b"], "left")
        .groupBy(*probes.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


# --- HDR histogram (mergeable percentile sketch, exact integer law) ----------
#
# Tene's HdrHistogram / DDSketch posture with EXACT arithmetic: a value
# in integer micro-units lands in octave k = floor(log2(v)) (computed as
# length(bin(v)) - 1 — pure string/integer ops both engines share) and
# one of HDR_SUB linear sub-buckets inside the octave. Bucket counts
# merge by plain addition (the mergeable-partials property CMS has),
# and the bucket bracketing the rank-r order statistic has relative
# width <= 1/HDR_SUB. Everything is integer-exact, so the whole sketch
# is value-hash-oracle-able — unlike approx_percentile's opaque sketch.

HDR_SUB = 16


def hdr_bucket_spark(v_sql: str, sub: int = HDR_SUB) -> str:
    """Spark SQL text: HDR bucket id of the bigint expr `v_sql`:
    k*sub + (v - 2^k)*sub div 2^k over v clamped to >= 1.

    The clamp is part of the binning LAW (mirrored in the DuckDB twin
    _hdr_bucket_sql): sub-unit and non-positive values fold into bucket
    0 rather than producing a negative bucket id — bin(0) would yield
    k=0, pw=1, bucket -sub, and the read path's shiftleft(bucket div
    sub) then goes negative (DuckDB raises; Spark wraps the shift
    mod 64 silently). Planted golden: test_hdr_sub_unit_values_clamp."""
    v = f"greatest({v_sql}, 1L)"
    k = f"(length(bin({v})) - 1)"
    pw = f"shiftleft(1L, {k})"
    return f"({k} * {sub} + (({v} - {pw}) * {sub}) div {pw})"


def hdr_percentiles(
    merged: DataFrame,
    group_cols: list[str],
    qs: list[float],
    sub: int = HDR_SUB,
) -> DataFrame:
    """Read p-quantile brackets off a merged (group_cols..., bucket_id,
    cnt) histogram: per (group, q) emit n, rank ceil(q*n), the first
    bucket whose cumulative count reaches the rank, and the bucket's
    exact integer bounds in input-units x sub. Windows run over
    |groups| x |buckets| rows (bounded by the sketch size), never the
    corpus — shared verbatim by st9_hdr_percentile_rollup and
    StreamingHdrHistogram so stream==batch parity is structural."""
    spark = merged.sparkSession
    wcum = Window.partitionBy(*group_cols).orderBy("bucket_id")
    cum = merged.select(
        *group_cols,
        "bucket_id",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(*group_cols)).alias("n"),
    )
    qdf = spark.createDataFrame([(q,) for q in qs], "q double")
    pw = F.expr(f"shiftleft(1L, cast(bucket_id div {sub} as int))")
    s = F.col("bucket_id") % sub
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy(*group_cols, "q", "n")
        .agg(F.min("bucket_id").alias("bucket_id"))
    )
    return hit.select(
        *group_cols,
        "q",
        F.col("n").cast("bigint").alias("n"),
        F.ceil(F.col("q") * F.col("n")).cast("bigint").alias("rank_r"),
        F.col("bucket_id").cast("bigint").alias("bucket_id"),
        (pw * sub + s * pw).cast("bigint").alias("est_lo_us16"),
        (pw * sub + (s + 1) * pw).cast("bigint").alias("est_hi_us16"),
    )
