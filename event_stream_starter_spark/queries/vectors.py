"""Similarity-search queries over the embeddings table (array<float>):
brute-force cosine top-k (exact baseline), LSH-bucketed ANN (scale path),
embedding-cosine near-dup pairs. SURVEY.md U3/D8 + the 100TB
training-pipeline similarity ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    kmeans_centroids,
    lsh_topk,
    semdedup,
)
from . import query

_N_QUERIES = 10
_TOP_K = 5


@query(
    "ann_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
               WHERE vec_id < {_N_QUERIES}),
    scored AS (
        SELECT q.qid, e.vec_id AS cid,
               list_cosine_similarity(list_transform(q.qvec, x -> CAST(x AS DOUBLE)), list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS cos_raw
        FROM embeddings e CROSS JOIN q
        WHERE q.qid <> e.vec_id
    ), ranked AS (
        SELECT qid, cid, cos_raw,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cos_raw DESC, cid ASC) AS rank
        FROM scored
    )
    SELECT qid AS vec_id_q, cid AS vec_id_c, ROUND(cos_raw, 6) AS cos_sim, rank
    FROM ranked WHERE rank <= {_TOP_K}
    """,
    survey_ids="similarity search: exact brute-force cosine top-k (U3 baseline)",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = brute_force_topk(q, emb, "vec_id", "vec_id", "embedding", k=_TOP_K)
    return out.select(
        "vec_id_q",
        "vec_id_c",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


@query(
    "dd_embed_near_dup",
    """
    WITH e AS (SELECT vec_id, embedding, label FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)), list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)), list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= 0.3
    """,
    survey_ids="dedup: embedding-cosine near-dup with label blocking (D8 embedding path)",
)
def dd_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.3, block_col=F.col("label")
    ).select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))


def _fixed_planes(
    n_planes: int = 8, dim: int = 64, seed: int = 42
) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded LCG; no numpy dep
    at query-definition time, stable across runs/machines)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (2**31)
            row.append((state / 2**31) * 2.0 - 1.0)
        planes.append(row)
    return planes


def _plane_tables(n_tables: int = 4, n_planes: int = 6, dim: int = 64):
    return [_fixed_planes(n_planes, dim, seed=42 + 97 * i) for i in range(n_tables)]


@query(
    "ann_lsh_topk",
    None,  # approximate by construction; recall vs the exact top-k is
    # asserted in tests/test_neardup_golden.py.
    survey_ids="similarity search: LSH-bucketed ANN (scale path)",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = lsh_topk(
        q, emb, "vec_id", "vec_id", _plane_tables(4, 6, 64), "embedding", k=_TOP_K
    )
    return out.select(
        "vec_id_q",
        "vec_id_c",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


_IVF_CENTROIDS: dict[str, list[list[float]]] = {}


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """The coarse quantizer is a MODEL artifact: fit once per corpus
    (deterministic k-means), reused across query batches — the IVF
    contract at scale (centroids live in a sidecar table; assignment is
    a pure column expression of them). Cached per sf_dir."""
    if sf_dir not in _IVF_CENTROIDS:
        emb = load_table(spark, sf_dir, "embeddings")
        _IVF_CENTROIDS[sf_dir] = kmeans_centroids(
            emb, "embedding", n_clusters=16, iters=2, id_col="vec_id"
        )
    return _IVF_CENTROIDS[sf_dir]


@query(
    "ann_ivf_topk",
    None,  # approximate by construction (IVF probes a cluster subset);
    # recall vs exact top-k asserted in tests/test_neardup_golden.py.
    survey_ids="similarity search: IVF coarse-quantized ANN (scale path)",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic k-means coarse quantizer (2 Lloyd
    iterations, model-sized driver collect), inverted lists keyed by
    cluster id, n_probe=4 of 16 lists probed per query. At 100TB the
    corpus assignment is map-only against a broadcast centroid literal
    and the probe join shuffles only cluster-matched candidates."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = ivf_topk(
        q, emb, "vec_id", "vec_id", "embedding",
        k=_TOP_K, n_clusters=16, n_probe=4, kmeans_iters=2,
        centroids=_ivf_centroids(spark, sf_dir),
    )
    return out.select(
        "vec_id_q",
        "vec_id_c",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


@query(
    "dd_semdedup",
    None,  # k-means is iterative (not SQL-expressible); exact-equality
    # golden vs a pure-numpy recompute + kept-set invariant in
    # tests/test_neardup_golden.py.
    survey_ids=(
        "dedup: SemDeDup semantic deduplication (k-means blocking, "
        "in-cluster pairwise cosine, keep lowest-centroid-cos among "
        "duplicates; Abbas et al. 2023)"
    ),
)
def dd_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table, reusing the IVF coarse
    quantizer as the cluster model (one k-means fit per corpus serves
    both ANN and semantic dedup — the shared-model shape a production
    pipeline wants)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = semdedup(
        emb,
        "vec_id",
        "embedding",
        n_clusters=16,
        threshold=0.95,
        centroids=_ivf_centroids(spark, sf_dir),
    )
    return out.select(
        F.col("id").alias("vec_id"),
        F.col("cluster").cast("long").alias("cluster"),
        F.round("centroid_cos", 6).alias("centroid_cos"),
        "is_kept",
    )
