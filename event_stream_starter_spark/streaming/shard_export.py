"""Streaming shard cursor: the e2e_tokenize_export layout maintained as
an APPEND-ONLY export while ingest proceeds (VERDICT r6 task 5).

The one-shot chain (queries/tokenizer._export_assignments) numbers a
doc's row WITHIN its (source, bucket) lane by global doc_id order and
then lays lanes into densely-numbered global batches via a prefix-sum
frame — both are re-basing operations: one new document shifts every
later row. An always-on curation pipeline cannot rewrite shipped
shards, so the streaming form keeps the SAME lane law (frozen-BPE piece
count → bucket → fixed-capacity batches of _PACK_BUDGET pieces) but
makes the numbering append-only:

- per-(source, bucket) lane positions are assigned as ``high-water mark
  + arrival rank``, where the high-water mark is the SUM of mergeable
  per-batch count partials (the StreamingLineDedup pattern: each doc
  arrives whole in exactly one committed batch, so lane cardinality is
  a sum of partials, never a rescan of history);
- the global dense batch numbering (a compaction-time VIEW in the
  one-shot chain) is replaced by the stable shard key
  ``source/bucket/shard_seq`` — already-shipped shards are never
  renamed by later arrivals.

When documents arrive in doc_id order, the per-lane assignment
(bucket, batch_id, slot) is IDENTICAL to the one-shot chain on the
union of ingested batches — pinned by
tests/test_streaming.py::test_streaming_shard_export_matches_batch,
which also pins the no-re-base invariant (rows visible after batch k
are byte-identical after batch k+1) and replayed-batch no-ops.

At-least-once: the shared _PointerSink protocol (CURRENT pointer
written last; both append frames are deterministic functions of the
batch + committed state, so crash re-appends collapse on read by
their natural keys).

At 100 TB: per micro-batch cost is one map-only frozen encode of the
batch plus a (source, bucket)-keyed rank over BATCH rows only; the
cursor state is |sources| x |buckets| counters; history is never read,
let alone re-shuffled. Reference parity: the reference ships outbox-
style incremental delivery (worker/jobs/outbox.py) — this is that
posture applied to training-shard export.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .incremental_dedup import _PointerSink


class StreamingShardExport(_PointerSink):
    """foreachBatch sink: append-only frozen-BPE shard export with a
    per-(source, bucket) high-water-mark cursor."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, "assignments"), exist_ok=True)
        os.makedirs(os.path.join(path, "counts"), exist_ok=True)

    # -- cursor state ------------------------------------------------------
    def lane_counts(self) -> DataFrame | None:
        """Merged per-(source, bucket) doc counts — the high-water marks."""
        parts = self._read_dir("counts", ["batch_id", "source", "bucket"])
        if parts is None:
            return None
        return parts.groupBy("source", "bucket").agg(
            F.sum("n_new").alias("n_docs")
        )

    # -- sink --------------------------------------------------------------
    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id():
            return  # replayed committed batch: at-least-once no-op
        from ..queries.tokenizer import (
            _BATCHES_PER_SHARD,
            _PACK_BUDGET,
            _frozen_pieces,
        )

        b = _frozen_pieces(batch).select(
            "doc_id",
            "source",
            F.size("pieces").cast("bigint").alias("n_pieces"),
            F.when(F.size("pieces") <= 64, 64)
            .when(F.size("pieces") <= 128, 128)
            .when(F.size("pieces") <= 256, 256)
            .otherwise(512)
            .cast("bigint")
            .alias("bucket"),
        )
        hwm = self.lane_counts()
        if hwm is not None:
            b = b.join(F.broadcast(hwm), ["source", "bucket"], "left")
        else:
            b = b.withColumn("n_docs", F.lit(None).cast("bigint"))
        rn_in_batch = F.row_number().over(
            Window.partitionBy("source", "bucket").orderBy("doc_id")
        )
        rows = b.select(
            "doc_id",
            "source",
            "n_pieces",
            "bucket",
            (F.coalesce(F.col("n_docs"), F.lit(0)) + rn_in_batch).alias("rn"),
        ).select(
            "doc_id",
            "source",
            "n_pieces",
            "bucket",
            F.expr(f"(rn - 1) div ({_PACK_BUDGET} div bucket)")
            .cast("bigint")
            .alias("batch_id"),
            F.expr(f"(rn - 1) % ({_PACK_BUDGET} div bucket)")
            .cast("bigint")
            .alias("slot"),
            F.concat_ws(
                "/",
                F.col("source"),
                F.col("bucket").cast("string"),
                F.expr(
                    f"cast(((rn - 1) div ({_PACK_BUDGET} div bucket))"
                    f" div {_BATCHES_PER_SHARD} as string)"
                ),
            ).alias("shard_key"),
            F.lit(batch_id).cast("bigint").alias("ingest_batch"),
        )
        rows.write.mode("append").parquet(
            os.path.join(self.path, "assignments")
        )
        partials = (
            rows.groupBy("source", "bucket")
            .agg(F.count(F.lit(1)).alias("n_new"))
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        )
        partials.write.mode("append").parquet(os.path.join(self.path, "counts"))
        self._commit(batch_id)

    # -- read side ----------------------------------------------------------
    def assignments(self) -> DataFrame | None:
        """Every ingested doc's (source, bucket, batch_id, slot,
        shard_key) — append-only, crash re-appends collapse on doc_id."""
        return self._read_dir("assignments", ["doc_id"])

    def shard_manifest(self) -> DataFrame | None:
        """Per-shard inventory (the x_export_manifest posture on the
        append-only layout): doc/piece counts per shard_key."""
        a = self.assignments()
        if a is None:
            return None
        return a.groupBy("shard_key").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pieces").alias("n_pieces"),
            F.countDistinct("batch_id").alias("n_batches"),
        )
