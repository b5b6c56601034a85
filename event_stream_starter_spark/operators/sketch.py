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

from pyspark.sql import Column, DataFrame
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
