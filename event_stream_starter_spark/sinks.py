"""Partitioned sinks (SURVEY.md §4: "date-partitioned storage from
day 1"; the reference's PG indexes become partition/bucket layout).

Facts land date-partitioned so time predicates become partition pruning
(no data read outside the window); keyed state tables land bucketed-by-
key-hash so key lookups and key-equi joins co-locate without a shuffle
on the read side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_partitioned(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Date-partitioned fact layout: dt=YYYY-MM-DD directories. Filters
    on dt (or on ts rewritten to dt) prune at the file listing."""
    (
        df.withColumn("dt", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(path)
    )


def read_events_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def key_bucket(key: F.Column, n_buckets: int = 256) -> F.Column:
    """Stable key→bucket assignment for keyed-table layouts: writing one
    file per bucket keeps a key's whole history in one file lineage, so
    point lookups touch one bucket and key-joins between tables bucketed
    the same way are shuffle-free after a bucket-local sort."""
    return F.pmod(F.xxhash64(key), F.lit(n_buckets))


def write_keyed_bucketed(
    df: DataFrame, path: str, key_col: str, n_buckets: int = 64
) -> None:
    (
        df.withColumn("bucket", key_bucket(F.col(key_col), n_buckets))
        .repartition(n_buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
