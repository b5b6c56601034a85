"""Testdata / table loaders.

All loads are plain columnar parquet scans so Catalyst gets predicate
pushdown + column pruning for free. At cluster scale the same API would
point at date-partitioned tables; nothing here assumes local mode.

The driver's events.parquet stores TIMESTAMP(NANOS), which Spark does not
read natively: we read it via the nanosAsLong legacy conf and normalize
to TimestampType by integer-dividing to microseconds — the same
truncation DuckDB applies when it coerces ns→µs, so oracle comparisons
see identical instants.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


_SPLIT_BYTES = 128 * 1024 * 1024  # spark.sql.files.maxPartitionBytes default
_SPREAD_MIN_BYTES = 64 * 1024


def _spread(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Scan-parallelism floor for low-split inputs.

    A parquet file splits into at most (bytes / maxPartitionBytes) tasks —
    and only at row-group boundaries, so a single-row-group file is ONE
    task no matter what. Every per-row expression projected before the
    first shuffle (regex shingling, sha2 keys, tokenizing) then runs
    serially. When the scan can't yield at least `defaultParallelism`
    splits, spread rows across cores right after the scan; predicate
    pushdown and column pruning still reach the scan through the exchange
    (asserted in tests/test_plans.py). On a real cluster the file count
    times splits-per-file exceeds core count and this is a no-op.
    """
    try:
        if os.path.isdir(path):
            files = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
            total = sum(os.path.getsize(f) for f in files)
            # Each file yields at least one split.
            est_splits = max(len(files), total // _SPLIT_BYTES)
        else:
            total = os.path.getsize(path)
            est_splits = max(1, total // _SPLIT_BYTES)
    except OSError:
        return df
    par = spark.sparkContext.defaultParallelism
    if est_splits >= par or total < _SPREAD_MIN_BYTES:
        return df
    return df.repartition(par)


_MANAGED_ROOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".managed")


def _managed_dir(sf_dir: str) -> str:
    return os.path.join(_MANAGED_ROOT, sf_dir.strip("/").replace("/", "_"))


def ingest_managed(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the raw single-file tables as MANAGED multi-file
    parquet (one ingest pass, idempotent via atomic rename).

    The generator writes each table as ONE file with ONE row group — a
    layout no deployment would serve queries from, because a row group
    is parquet's split unit and a single group forces every scan through
    one task (the serial ~0.5-1s decode shows up in every query).
    Ingest-then-query-managed-storage is the normal engine contract
    (load → OPTIMIZE → query); load_table transparently prefers the
    managed copy once it exists. Values are byte-identical — only file
    count changes.
    """
    from .schemas import TESTDATA_TABLES

    dst = _managed_dir(sf_dir)
    if os.path.isdir(dst):
        return dst
    tmp = dst + f".tmp{os.getpid()}"
    par = spark.sparkContext.defaultParallelism
    for t in TESTDATA_TABLES:
        raw = _load_raw(spark, sf_dir, t)
        n = max(1, min(par, raw.count() // 2000))
        raw.repartition(n).write.mode("overwrite").parquet(
            os.path.join(tmp, f"{t}.parquet")
        )
    try:
        os.rename(tmp, dst)
    except OSError:  # concurrent ingest won the rename — use theirs
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return dst


def _load_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(path)
    # Normalize TIMESTAMP_NTZ → TIMESTAMP_LTZ (session tz is UTC, so the
    # instant is unchanged); keeps epoch extraction uniform regardless of
    # the host session's NTZ-inference setting.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    managed = os.path.join(_managed_dir(sf_dir), f"{name}.parquet")
    if os.path.isdir(managed):
        # Managed copy is already normalized (types + multi-file layout);
        # still apply the scan-parallelism floor — a small compute-dense
        # table (embeddings, documents) can land in 1-2 files whose
        # downstream per-row work needs all cores (measured 8x on the
        # embedding self-join when read as a single split).
        return _spread(spark, spark.read.parquet(managed), managed)
    path = os.path.join(sf_dir, f"{name}.parquet")
    return _spread(spark, _load_raw(spark, sf_dir, name), path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    from .schemas import TESTDATA_TABLES

    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}
