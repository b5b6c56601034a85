"""Streaming contamination firewall: a document STREAM is probed per
micro-batch against a FROZEN eval-benchmark 13-gram set, emitting
per-doc contamination verdicts continuously — the ingest-time twin of
the batch x_decontaminate (queries/textdata.py), for pipelines that
must refuse contaminated documents BEFORE they land in the training
corpus rather than audit them afterwards (GPT-3 appendix C hygiene,
applied at the door).

Design: the eval gram set is a MODEL artifact — built once from the
benchmark corpus at sink construction, persisted to an `evalgrams/`
parquet sidecar (the frozen-quantizer contract of
streaming/ann_index.StreamingIvfIndex: restarts load the sidecar, a
conflicting rebuild is impossible because construction only writes it
when absent). Each micro-batch is map-side exploded and probed against
the broadcast gram set — the same no-corpus-shuffle shape as the batch
op, so per-batch cost is one scan of the BATCH, and history is never
re-probed. Verdicts append batch-tagged under the shared at-least-once
pointer protocol (_PointerSink): a crash between append and commit
replays into byte-identical rows deduplicated on read, and a fully
committed batch short-circuits on the pointer.

Stream-end parity: because the gram set is frozen and verdicts are
per-doc pure functions of (doc text, gram set), the union of per-batch
verdicts equals the one-shot batch computation over everything
ingested EXACTLY — pinned by
tests/test_streaming.py::test_streaming_decontaminator_matches_batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import token_shingles
from .incremental_dedup import _PointerSink


class StreamingDecontaminator(_PointerSink):
    """foreachBatch sink: per-batch 13-gram contamination verdicts
    against a frozen eval gram sidecar."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        eval_docs: DataFrame | None = None,
        n: int = 13,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.spark = spark
        self.path = path
        self.n = n
        self.id_col = id_col
        self.text_col = text_col
        os.makedirs(os.path.join(path, "verdicts"), exist_ok=True)
        gdir = os.path.join(path, "evalgrams")
        have = os.path.isdir(gdir) and any(
            f.endswith(".parquet") for f in os.listdir(gdir)
        )
        if not have:
            if eval_docs is None:
                raise ValueError(
                    f"no frozen eval grams at {gdir} and no eval_docs given"
                )
            (
                eval_docs.select(
                    F.explode(
                        token_shingles(F.col(text_col), n)
                    ).alias("gram")
                )
                .distinct()
                .write.mode("overwrite")
                .parquet(gdir)
            )

    def eval_grams(self) -> DataFrame:
        """The frozen reference set (distinct grams)."""
        return self.spark.read.parquet(os.path.join(self.path, "evalgrams"))

    def verdicts(self) -> DataFrame | None:
        """All committed per-doc verdicts (replay-deduplicated).
        Verdicts are immutable — the gram set is frozen, so a doc's row
        never changes after its batch commits."""
        return self._read_dir("verdicts", [self.id_col, "batch_id"])

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id():
            return  # replayed, fully committed batch
        sh = batch.select(
            self.id_col,
            token_shingles(F.col(self.text_col), self.n).alias("g"),
        )
        tr = sh.select(
            self.id_col,
            F.size("g").cast("long").alias("n_grams"),
            F.explode("g").alias("gram"),
        )
        hits = (
            tr.join(F.broadcast(self.eval_grams()), "gram")
            .groupBy(self.id_col)
            .agg(F.countDistinct("gram").alias("n_hit_grams"))
        )
        out = (
            sh.select(self.id_col, F.size("g").cast("long").alias("n_grams"))
            .join(hits, self.id_col, "left")
            .select(
                self.id_col,
                "n_grams",
                F.coalesce("n_hit_grams", F.lit(0))
                .cast("bigint")
                .alias("n_hit_grams"),
            )
            .withColumn(
                "hit_ratio",
                F.round(
                    F.col("n_hit_grams").cast("double")
                    / F.greatest(F.col("n_grams"), F.lit(1)),
                    6,
                ),
            )
            .withColumn("contaminated", F.col("n_hit_grams") > 0)
            .withColumn("batch_id", F.lit(batch_id))
        )
        out.write.mode("append").parquet(os.path.join(self.path, "verdicts"))
        self._commit(batch_id)
