"""Streaming accumulating count-min sketch over a document stream.

The batch CMS (operators/sketch.py) is mergeable by construction —
counts add bucket-for-bucket under fixed hash seeds — so the streaming
form needs no special machinery beyond the at-least-once pointer
protocol every incremental sink here shares: each micro-batch folds
ONLY its own tokens into a d x w partial table and appends it
batch-tagged; the live sketch is the groupBy-sum of the appended
partials, and it equals the one-shot table over everything ingested
EXACTLY (not approximately — the sketch's approximation is in probing,
never in merging). This is the 100 TB operational shape: daily corpus
deltas each contribute a 20k-row partial, historical text is never
re-tokenized, and a month of partials folds in one tiny aggregate.

Replay safety: partials are batch-tagged, so a crash between the
append and the pointer commit replays into a byte-identical append
that the read-side (batch_id, j, b) dedup collapses; a fully committed
batch short-circuits on the pointer (same contract as
StreamingNearDup, streaming/incremental_dedup.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import CMS_D, CMS_W, cms_estimate, cms_table
from ..operators.textan import tokens
from .incremental_dedup import _PointerSink


class StreamingCms(_PointerSink):
    """foreachBatch sink: batch-tagged CMS partials, summed on read."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        text_col: str = "text",
        d: int = CMS_D,
        w: int = CMS_W,
    ):
        self.spark = spark
        self.path = path
        self.text_col = text_col
        self.d = d
        self.w = w
        os.makedirs(os.path.join(path, "partials"), exist_ok=True)

    def _tokens(self, df: DataFrame) -> DataFrame:
        return (
            df.filter(F.length(F.trim(self.text_col)) > 0)
            .select(F.explode(tokens(F.col(self.text_col))).alias("tok"))
            .filter(F.col("tok") != "")
        )

    def sketch(self) -> DataFrame | None:
        """The live (j, b, cnt) table: sum of all committed partials."""
        p = self._read_dir("partials", ["batch_id", "j", "b"])
        if p is None:
            return None
        return (
            p.groupBy("j", "b").agg(F.sum("cnt").alias("cnt"))
        )

    def estimate(self, probes: DataFrame, col: str = "tok") -> DataFrame:
        """Point-estimate each probe row's `col` against the live sketch."""
        table = self.sketch()
        if table is None:
            return probes.withColumn("cms_est", F.lit(0).cast("bigint"))
        return cms_estimate(table, probes, col, self.d, self.w)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id():
            return  # replayed, fully committed batch
        partial = cms_table(self._tokens(batch), "tok", self.d, self.w)
        partial.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(os.path.join(self.path, "partials"))
        self._commit(batch_id)


class StreamingHdrHistogram(_PointerSink):
    """foreachBatch sink: batch-tagged HDR-histogram partials, summed on
    read — the mergeable-percentile twin of StreamingCms and the
    streaming form of st9_hdr_percentile_rollup.

    Like the CMS, the HDR histogram merges EXACTLY (bucket counts add;
    the sketch's approximation is the fixed 1/16-relative-width bucket
    grid, never the merge), so each micro-batch folds only its own rows
    into a (group, bucket_id, cnt) partial — O(batch) map + one tiny
    aggregate, history never re-binned. ``percentiles()`` reads
    p-quantile brackets off the summed partials via the SAME
    operators/sketch.hdr_percentiles the batch query uses, so
    stream-built == one-shot equality is structural (pinned in
    tests/test_streaming.py). There is no frozen model: the bucket grid
    is a constant of the law, which is what makes the sketch
    coordination-free at 1000 executors."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_col: str = "event_type",
        value_col: str = "value",
    ):
        self.spark = spark
        self.path = path
        self.group_col = group_col
        self.value_col = value_col
        os.makedirs(os.path.join(path, "partials"), exist_ok=True)

    def _bucketed(self, df: DataFrame) -> DataFrame:
        from ..operators.sketch import hdr_bucket_spark

        vus = f"cast(floor({self.value_col} * 1000000.0) as bigint)"
        return (
            df.select(
                F.col(self.group_col).alias("grp"),
                F.expr(hdr_bucket_spark(vus)).alias("bucket_id"),
            )
            .groupBy("grp", "bucket_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def histogram(self) -> DataFrame | None:
        """The live (grp, bucket_id, cnt) table: sum of committed
        partials; crash re-appends collapse on the batch-tag dedup."""
        p = self._read_dir("partials", ["batch_id", "grp", "bucket_id"])
        if p is None:
            return None
        return p.groupBy("grp", "bucket_id").agg(F.sum("cnt").alias("cnt"))

    def percentiles(self, qs: list[float]) -> DataFrame | None:
        """p-quantile brackets off the live histogram — the exact code
        path st9_hdr_percentile_rollup reads its merged counts with."""
        from ..operators.sketch import hdr_percentiles

        h = self.histogram()
        if h is None:
            return None
        return hdr_percentiles(h, ["grp"], qs)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id():
            return  # replayed, fully committed batch
        partial = self._bucketed(batch)
        partial.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(os.path.join(self.path, "partials"))
        self._commit(batch_id)
