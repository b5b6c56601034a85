"""Streaming cross-document LINE-level dedup: the x_line_dedup law
(RefinedWeb/CCNet — a line occurring in >= k distinct documents is
boilerplate) maintained as ingest proceeds.

The cross-batch dependency is the interesting part: a NEW document
repeating a line RETROACTIVELY makes every EARLIER occurrence
boilerplate. Like StreamingDatacard's duplicate accounting, that flip
factors through a mergeable count table — a line's distinct-doc count
is the sum of its per-batch partials (each doc arrives whole in exactly
one committed batch, and doc ids are unique), so the verdict is a
READ-side join of the occurrence log against merged counts, never a
rewrite of history.

Per micro-batch the sink appends two batch-tagged frames, both
O(batch): the line-occurrence log (doc_id, line_idx, line_hash) and the
per-line distinct-doc partial (line_hash, n_docs). Both land under the
shared at-least-once pointer protocol (incremental_dedup._PointerSink):
a replayed committed batch short-circuits on the pointer, and a crash
re-append collapses on read by (batch_id, keys) because both frames are
deterministic functions of the batch. ``verdicts()`` equals the
one-shot x_line_dedup over everything ingested — pinned by
tests/test_streaming.py::test_streaming_line_dedup_matches_batch.

At 100 TB: per-batch cost is one scan of the batch plus a line-hash
partial aggregation; history is never re-scanned; the merged count
table is ~one row per distinct line (hash-keyed, skew-free).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .incremental_dedup import _PointerSink


class StreamingLineDedup(_PointerSink):
    """foreachBatch sink: incremental line-occurrence log + mergeable
    per-line distinct-doc counts, boilerplate verdicts on read."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        k: int = 2,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.spark = spark
        self.path = path
        self.k = k
        self.id_col = id_col
        self.text_col = text_col
        os.makedirs(os.path.join(path, "lines"), exist_ok=True)
        os.makedirs(os.path.join(path, "counts"), exist_ok=True)

    def _doc_lines(self, batch: DataFrame) -> DataFrame:
        # The batch twin of queries/textdata._doc_lines (same wrap law).
        from ..queries.textdata import _LINE_W
        from ..operators import textan

        toks = F.filter(
            textan.tokens(F.col(self.text_col)), lambda w: F.length(w) > 0
        )
        base = batch.select(
            F.col(self.id_col).alias("doc_id"), toks.alias("toks")
        ).filter(F.size("toks") > 0)
        return base.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, ((size(toks) + {_LINE_W - 1})"
                    f" div {_LINE_W}) - 1),"
                    f" i -> named_struct("
                    f"'line_idx', cast(i as bigint),"
                    f" 'line', concat_ws(' ', slice(toks,"
                    f" cast(i*{_LINE_W}+1 as int), {_LINE_W}))))"
                )
            ).alias("x"),
        ).select(
            "doc_id",
            F.col("x.line_idx").alias("line_idx"),
            F.substring(F.sha2(F.col("x.line"), 256), 1, 16).alias(
                "line_hash"
            ),
        )

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id():
            return  # replayed, fully committed batch
        lines = self._doc_lines(batch).withColumn("batch_id", F.lit(batch_id))
        counts = (
            lines.groupBy("line_hash")
            .agg(F.countDistinct("doc_id").alias("n_docs"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        lines.write.mode("append").parquet(os.path.join(self.path, "lines"))
        counts.write.mode("append").parquet(os.path.join(self.path, "counts"))
        self._commit(batch_id)

    def line_counts(self) -> DataFrame | None:
        """Merged per-line distinct-doc counts over everything ingested."""
        parts = self._read_dir("counts", ["batch_id", "line_hash"])
        if parts is None:
            return None
        return parts.groupBy("line_hash").agg(
            F.sum("n_docs").cast("bigint").alias("n_docs")
        )

    def verdicts(self) -> DataFrame | None:
        """Per line occurrence: (doc_id, line_idx, line_hash,
        n_docs_with_line, is_boilerplate) — x_line_dedup's exact output
        over everything ingested, retroactive flips included (the
        occurrence log is immutable; the verdict joins live counts)."""
        lines = self._read_dir(
            "lines", ["batch_id", "doc_id", "line_idx"]
        )
        if lines is None:
            return None
        return lines.join(self.line_counts(), "line_hash").select(
            "doc_id",
            "line_idx",
            "line_hash",
            F.col("n_docs").alias("n_docs_with_line"),
            (F.col("n_docs") >= self.k).alias("is_boilerplate"),
        )
