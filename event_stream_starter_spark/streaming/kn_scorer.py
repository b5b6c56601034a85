"""Streaming LM quality scoring: the x_kn_trigram_lm law applied at
ingest with a FROZEN model.

An always-on curation pipeline scores arriving documents against a
reference LM — the model must NOT drift with the stream (CCNet trains
on a fixed Wikipedia corpus; re-fitting per batch would make early and
late verdicts incomparable and replay-unsafe). So the sink follows the
StreamingDecontaminator frozen-sidecar contract: the six KN model
tables (queries/knlm._kn_model_tables — ONE implementation shared with
the batch queries) are fitted from the reference corpus ONCE at
construction and persisted as parquet sidecars; a restart reloads the
sidecars instead of re-fitting, so verdicts are stable across crashes
even if the reference table later changes.

Per micro-batch: map-only scoring (model sidecars broadcast onto the
batch's exploded gram stream via _kn_score_with_model) plus the batch's
per-doc rollup — O(batch), no history, no stream state. Score rows are
appended batch-tagged under the shared at-least-once pointer protocol;
crash re-appends collapse on doc_id because the frozen model makes the
rows a deterministic function of the batch.

Parity: with the reference corpus = the full documents table, stream-end
scores() equals the one-shot x_kn_trigram_lm row-for-row (the batch
query fits its model on the same ``doc_id % 7 == 0`` sample) — pinned
by tests/test_streaming.py::test_streaming_kn_scorer_matches_batch.

At 100 TB: the model is per-lang trigram TYPES (bounded, broadcast);
each trigger costs one scan of the batch; nothing is ever re-scored.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .incremental_dedup import _PointerSink

_MODEL_NAMES = ("tri", "ctx2", "cont", "ctxc", "uni", "tot")


class StreamingKnScorer(_PointerSink):
    """foreachBatch sink: frozen-KN-model per-document quality scores."""

    def __init__(
        self, spark: SparkSession, path: str, ref_docs: DataFrame | None
    ):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, "scores"), exist_ok=True)
        model_dir = os.path.join(path, "model")
        if not os.path.isdir(model_dir):
            if ref_docs is None:
                raise ValueError(
                    "first construction needs ref_docs to freeze the model"
                )
            from ..queries.knlm import _kn_model_tables

            tables = _kn_model_tables(
                ref_docs.select("doc_id", "lang", "text")
            )
            for name in _MODEL_NAMES:
                tables[name].write.mode("overwrite").parquet(
                    os.path.join(model_dir, name)
                )
        self._model = {
            name: self.spark.read.parquet(os.path.join(model_dir, name))
            for name in _MODEL_NAMES
        }

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id():
            return  # replayed committed batch: at-least-once no-op
        from ..queries.knlm import _kn_score_with_model

        scored = _kn_score_with_model(
            batch.select("doc_id", "lang", "text"), self._model
        )
        rows = scored.select(
            "doc_id",
            "lang",
            "n_grams",
            (F.round(F.col("s") / F.col("n_grams"), 6) + 0).alias("kn_nll"),
            F.lit(batch_id).cast("bigint").alias("ingest_batch"),
        )
        rows.write.mode("append").parquet(os.path.join(self.path, "scores"))
        self._commit(batch_id)

    def scores(self) -> DataFrame | None:
        """Every scored doc's (lang, n_grams, kn_nll) — crash re-appends
        collapse on doc_id (deterministic under the frozen model)."""
        return self._read_dir("scores", ["doc_id"])
