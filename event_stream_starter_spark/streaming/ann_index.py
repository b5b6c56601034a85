"""Persisted incremental ANN index: IVF inverted lists maintained as
the corpus streams in, queried without ever re-embedding or
re-assigning history.

This closes the similarity-search side of the daily-increment triangle
the repo already has for near-dup (StreamingNearDup: persisted MinHash
signature index) and semantic dedup (StreamingSemDeDup: persisted kept
index): production similarity search is "index once, append increments,
probe many times", not "re-cluster the corpus per query batch".

Per micro-batch the sink appends the batch's (cid, cvec, cluster)
assignment rows — MAP-ONLY against the broadcast centroid literal,
O(batch) work, no shuffle of history — under the shared at-least-once
pointer protocol (_PointerSink: a replayed committed batch
short-circuits, a crash re-append collapses on the read-side id dedup,
both proven in tests). The coarse quantizer follows the frozen
contract (_FrozenQuantizerMixin): fitted once, persisted, never refit,
conflicting constructor centroids are an error — the lists were built
under the persisted assignment.

``query(queries, k, n_probe)`` probes the accumulated lists with
operators/similarity.ivf_probe — the exact code path ivf_topk uses on a
fresh corpus, so stream-built == one-shot equality is structural, and
pinned in tests/test_streaming.py.

At cluster scale the append directory becomes a table bucketed by
`cluster` (the probe join key), so probes read only the n_probe/
n_clusters fraction of the index from storage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import ivf_assign, ivf_probe
from .incremental_dedup import _FrozenQuantizerMixin, _PointerSink


class StreamingIvfIndex(_PointerSink, _FrozenQuantizerMixin):
    """foreachBatch sink: append-only IVF inverted lists with a frozen
    coarse quantizer."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_clusters: int = 16,
        centroids: list[list[float]] | None = None,
    ):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col
        self.n_clusters = n_clusters
        self.centroids = centroids
        os.makedirs(os.path.join(path, "lists"), exist_ok=True)

    def read_lists(self) -> DataFrame | None:
        """(cid, cvec, cluster) index rows; crash re-appends collapse on
        the id dedup."""
        return self._read_dir("lists", ["cid"])

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id():
            return  # replayed, fully committed batch
        # Empty batch: advance the pointer, write nothing — fitting the
        # quantizer on zero rows would freeze an empty centroid table
        # (same guard as StreamingSemDeDup).
        if batch.limit(1).count() == 0:
            self._commit(batch_id)
            return
        centroids = self._load_or_fit_centroids(batch)
        assigned = ivf_assign(batch, self.id_col, self.vec_col, centroids)
        assigned.write.mode("append").parquet(os.path.join(self.path, "lists"))
        self._commit(batch_id)

    def query(
        self, queries: DataFrame, k: int = 5, n_probe: int = 4
    ) -> DataFrame | None:
        """ANN top-k of `queries` against the accumulated index — the
        same probe code path as a one-shot ivf_topk."""
        lists = self.read_lists()
        if lists is None:
            return None
        if self.centroids is None:
            import json

            with open(self._centroids_file()) as fh:
                self.centroids = json.load(fh)
        return ivf_probe(
            lists,
            queries,
            self.id_col,
            self.id_col,
            self.vec_col,
            centroids=self.centroids,
            k=k,
            n_probe=n_probe,
        )
