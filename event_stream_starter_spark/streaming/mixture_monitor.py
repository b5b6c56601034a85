"""Streaming mixture monitor: per-language token mass vs the
temperature-mixture target, maintained as ingest proceeds — the drift
signal a curation operator watches while a corpus lands, so a crawl
that suddenly over-delivers one language is visible BATCH-BY-BATCH,
not at the post-hoc datacard.

The batch law is queries/textdata's temperature family (Conneau 2020
alpha=0.3): language i's target share of the corpus is
q_i ∝ p_i^alpha with p_i the doc-count share. Every monitor column is
a mergeable aggregate (doc counts, token sums), so per batch the sink
appends ONE batch-tagged per-lang partial frame (O(|langs in batch|))
under the shared at-least-once pointer protocol
(incremental_dedup._PointerSink): a replayed committed batch
short-circuits on the pointer, a crash re-append collapses on read by
(batch_id, lang) because the partial is a deterministic aggregate of
the batch. ``report()`` merges the partials and evaluates the mixture
law on the MERGED totals — identical, by the mergeability of the
inputs, to the one-shot batch computation over everything ingested
(pinned by tests/test_streaming.py::
test_streaming_mixture_monitor_matches_batch).

At 100 TB: the per-batch cost is one scan of the BATCH plus an
O(|langs|) append; history is never re-scanned; the report is a
|langs|-row frame computation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textan
from .incremental_dedup import _PointerSink

_ALPHA = 0.3  # the XLM-R operating point (matches textdata._TEMP_ALPHA)


class StreamingMixtureMonitor(_PointerSink):
    """foreachBatch sink: incremental per-language doc/token mass with
    temperature-target drift in the merged report."""

    def __init__(self, spark: SparkSession, path: str, text_col: str = "text"):
        self.spark = spark
        self.path = path
        self.text_col = text_col
        os.makedirs(os.path.join(path, "langstats"), exist_ok=True)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id():
            return  # replayed, fully committed batch
        stats = (
            batch.select(
                "lang",
                textan.token_count(F.col(self.text_col))
                .cast("long")
                .alias("ntok"),
            )
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("ntok").cast("bigint").alias("n_tokens"),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        stats.write.mode("append").parquet(
            os.path.join(self.path, "langstats")
        )
        self._commit(batch_id)

    def report(self) -> DataFrame | None:
        """Per-lang mixture report over everything ingested: doc/token
        counts, observed token share, temperature target q (alpha=0.3
        over doc-count shares — the x_temperature_resample law), drift
        = observed - target, and the over_target flag. Pure function
        of the merged mergeable counts, so stream-end == one-shot."""
        stats = self._read_dir("langstats", ["batch_id", "lang"])
        if stats is None:
            return None
        lc = stats.groupBy("lang").agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        tot = lc.agg(
            F.sum("n_docs").cast("bigint").alias("n"),
            F.sum("n_tokens").cast("bigint").alias("t"),
        )
        # |langs|-row frame; same 9dp DECIMAL discipline as
        # textdata._lang_temperature_q so the report's q is the batch
        # family's q bit-for-bit.
        wts = lc.crossJoin(F.broadcast(tot)).select(
            "lang",
            "n_docs",
            "n_tokens",
            "t",
            F.round(
                F.pow(F.col("n_docs").cast("double") / F.col("n"), _ALPHA), 9
            )
            .cast("decimal(18,9)")
            .alias("w"),
        )
        sw = wts.agg(F.sum("w").cast("decimal(28,9)").alias("s"))
        return wts.crossJoin(F.broadcast(sw)).select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens").cast("double") / F.col("t"), 6).alias(
                "obs_share"
            ),
            F.round(
                F.col("w").cast("double") / F.col("s").cast("double"), 9
            ).alias("target_q"),
            F.round(
                F.round(
                    F.col("n_tokens").cast("double") / F.col("t"), 6
                )
                - F.round(
                    F.col("w").cast("double") / F.col("s").cast("double"), 9
                ),
                6,
            ).alias("drift"),
            (
                F.round(F.col("n_tokens").cast("double") / F.col("t"), 6)
                > F.round(
                    F.col("w").cast("double") / F.col("s").cast("double"), 9
                )
            ).alias("over_target"),
        )
