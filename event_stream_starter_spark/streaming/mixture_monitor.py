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


def _fk_grade(t: F.Column) -> F.Column:
    """Per-doc Flesch-Kincaid grade, the x_readability law verbatim
    (letterful words, [.!?]+ sentence runs min 1, vowel-group syllables
    min 1/word; NULL for wordless docs) as one self-contained column."""
    words = F.filter(textan.tokens(t), lambda w: w.rlike("[a-z]"))
    nw = F.size(words).cast("double")
    ns = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), F.lit(0))), F.lit(1)
    ).cast("double")
    sy = F.aggregate(
        words,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc
        + F.greatest(
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
            F.lit(1),
        ).cast("bigint"),
    ).cast("double")
    fk = (
        F.round(
            F.lit(0.39) * (nw / ns) + F.lit(11.8) * (sy / nw) - F.lit(15.59),
            6,
        )
        + 0
    )
    return F.when(F.size(words) == 0, F.lit(None).cast("double")).otherwise(fk)


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
        t = F.col(self.text_col)
        toks = textan.tokens(t)
        # Datacard-v2 columns as MERGEABLE partials (sums, never means —
        # means don't merge): quality mass, and the readability rollup's
        # (fk-grade mass, fk-doc count) over letterful docs. report()
        # divides on the merged totals, so stream-end == one-shot.
        fk = _fk_grade(t)
        stats = (
            batch.select(
                "lang",
                textan.token_count(t).cast("long").alias("ntok"),
                F.round(textan.quality_score(t, toks), 6)
                .cast("decimal(18,6)")
                .alias("q"),
                fk.cast("decimal(18,6)").alias("fk"),
            )
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("ntok").cast("bigint").alias("n_tokens"),
                F.sum("q").cast("decimal(28,6)").alias("sum_quality"),
                F.sum("fk").cast("decimal(28,6)").alias("sum_fk"),
                F.count("fk").cast("bigint").alias("n_fk"),
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
            F.sum("sum_quality").cast("decimal(28,6)").alias("sum_quality"),
            F.sum("sum_fk").cast("decimal(28,6)").alias("sum_fk"),
            F.sum("n_fk").cast("bigint").alias("n_fk"),
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
            "sum_quality",
            "sum_fk",
            "n_fk",
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
            # datacard-v2 columns from the merged mergeable partials
            F.round(
                F.col("sum_quality").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("mean_quality"),
            F.round(
                F.col("sum_fk").cast("double")
                / F.greatest(F.col("n_fk"), F.lit(1)).cast("double"),
                6,
            ).alias("mean_fk_grade"),
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
