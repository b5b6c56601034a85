"""Incremental corpus datacard: the x_corpus_datacard release table
maintained as ingest proceeds, without ever recomputing history.

The batch query (queries/textdata.x_corpus_datacard) is one pass over
the whole corpus; at 100TB a release pipeline cannot re-run that pass
per ingest increment. Every datacard column is a mergeable aggregate
(count / sum / DECIMAL-sum / min / max), and the one cross-batch
dependency — exact-duplicate mass, where a NEW copy retroactively makes
an OLD doc a duplicate — factors through a (fingerprint, lang, source)
count table: a family's total copy count is the sum of its per-batch
partials, so the flip from unique to duplicated is a read-side filter,
never a rewrite of history.

Per micro-batch this sink appends two batch-tagged PARTIAL frames
(per-(lang,source) stats and per-(fp,lang,source) counts, each O(batch))
and advances the CURRENT pointer last — the same at-least-once protocol
as StreamingNearDup (incremental_dedup._PointerSink): a replayed
committed batch short-circuits on the pointer, and a crash re-append is
collapsed on read by (batch_id, keys) because the partials are
deterministic aggregates of the batch. ``datacard()`` merges the
partials into exactly the batch query's output schema; stream-end ==
one-shot equality and replay no-op are pinned in tests/test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textan
from .incremental_dedup import _PointerSink


class StreamingDatacard(_PointerSink):
    """foreachBatch sink: incremental per-(lang, source) corpus
    datasheet with exact cross-batch duplicate accounting."""

    def __init__(self, spark: SparkSession, path: str, text_col: str = "text"):
        self.spark = spark
        self.path = path
        self.text_col = text_col
        os.makedirs(os.path.join(path, "stats"), exist_ok=True)
        os.makedirs(os.path.join(path, "fp"), exist_ok=True)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id():
            return  # replayed, fully committed batch
        t = F.col(self.text_col)
        base = batch.select(
            "lang",
            "source",
            textan.token_count(t).cast("long").alias("ntok"),
            F.round(textan.quality_score(t, textan.tokens(t)), 6).alias(
                "quality"
            ),
            textan.doc_fingerprint(t).alias("fp"),
        )
        stats = (
            base.groupBy("lang", "source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("ntok").cast("bigint").alias("total_tokens"),
                # DECIMAL partial: exact, so partial-of-partials merges
                # to the same value as the one-shot DECIMAL sum.
                F.sum(F.col("quality").cast("decimal(18,6)")).alias(
                    "sum_quality"
                ),
                F.min("ntok").cast("bigint").alias("min_tokens"),
                F.max("ntok").cast("bigint").alias("max_tokens"),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        fp = (
            base.groupBy("fp", "lang", "source")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        stats.write.mode("append").parquet(os.path.join(self.path, "stats"))
        fp.write.mode("append").parquet(os.path.join(self.path, "fp"))
        self._commit(batch_id)

    def datacard(self) -> DataFrame | None:
        """Merge the accumulated partials into the x_corpus_datacard
        output schema (lang, source, n_docs, total_tokens, mean_quality,
        exact_dup_docs, min_tokens, max_tokens)."""
        stats = self._read_dir("stats", ["batch_id", "lang", "source"])
        if stats is None:
            return None
        fp = self._read_dir("fp", ["batch_id", "fp", "lang", "source"])
        merged = stats.groupBy("lang", "source").agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("total_tokens").cast("bigint").alias("total_tokens"),
            F.sum("sum_quality").alias("sum_quality"),
            F.min("min_tokens").cast("bigint").alias("min_tokens"),
            F.max("max_tokens").cast("bigint").alias("max_tokens"),
        )
        # Family totals across ALL batches decide duplicated-ness; the
        # per-(lang,source) share of each duplicated family is its local
        # member count. The family table is ~one row per distinct doc.
        fam = fp.groupBy("fp").agg(F.sum("n").alias("n_copies"))
        grp = fp.groupBy("fp", "lang", "source").agg(
            F.sum("n").alias("n_grp")
        )
        dup = (
            grp.join(fam, "fp")
            .filter(F.col("n_copies") > 1)
            .groupBy("lang", "source")
            .agg(F.sum("n_grp").cast("bigint").alias("exact_dup_docs"))
        )
        return (
            merged.join(dup, ["lang", "source"], "left")
            .select(
                "lang",
                "source",
                "n_docs",
                "total_tokens",
                F.round(
                    F.col("sum_quality").cast("double") / F.col("n_docs"), 6
                ).alias("mean_quality"),
                F.coalesce(F.col("exact_dup_docs"), F.lit(0)).alias(
                    "exact_dup_docs"
                ),
                "min_tokens",
                "max_tokens",
            )
        )
