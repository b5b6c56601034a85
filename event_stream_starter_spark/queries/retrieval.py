"""Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
semantic (embedding-cosine) arms — the standard production shape for
assembling topical training subsets and decontamination candidate
pools (Cormack, Clarke & Buettcher 2009 is the RRF recipe; every
hybrid search stack fuses exactly these two arms).

The reference retrieves evidence lexically and ranks semantically in
separate passes (reference api/events.py evidence assembly + U3
embedding similarity, SURVEY §2.12); fusing them engine-side is the
composition a curation user would otherwise hand-roll. Both arms
already exist as certified queries — x_bm25_topk (queries/textdata.py)
and ann_cosine_topk (queries/vectors.py); this module shares their
implementations (bm25_scored, operators.similarity.cosine), so the
fusion adds no new scoring law, only the rank algebra.

Scale shape: each arm ends in orderBy().limit(N) =
TakeOrderedAndProject (per-partition top-N + driver k-way merge — no
full sort), so the fusion join runs on two N-row frames regardless of
corpus size; RRF itself is rank arithmetic, immune to the two arms'
incomparable score scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.similarity import cosine
from . import query
from .textdata import _BM25_SCORED_CTES, bm25_scored

_ARM_TOPN = 50  # candidates taken from each arm
_RRF_K = 60  # the canonical RRF damping constant
_QVEC_ID = 0  # fixed query: the embedding of vec_id 0 (doc_id-aligned)
_FUSED_TOPK = 10


@query(
    "x_hybrid_rrf",
    f"""
    WITH {_BM25_SCORED_CTES}, lexr AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r_lex
        FROM scored
    ), lex AS (
        SELECT * FROM lexr WHERE r_lex <= {_ARM_TOPN}
    ), q AS (
        SELECT embedding AS qvec FROM embeddings WHERE vec_id = {_QVEC_ID}
    ), cos AS (
        SELECT e.vec_id AS doc_id,
               list_cosine_similarity(
                   list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                   list_transform(q.qvec, x -> CAST(x AS DOUBLE))) AS cs
        FROM embeddings e, q
        WHERE e.vec_id <> {_QVEC_ID}
    ), semr AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cs DESC, doc_id) AS r_sem
        FROM cos
    ), sem AS (
        SELECT * FROM semr WHERE r_sem <= {_ARM_TOPN}
    ), fused AS (
        SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
               lex.r_lex, sem.r_sem,
               COALESCE(1.0 / ({_RRF_K} + lex.r_lex), 0)
                   + COALESCE(1.0 / ({_RRF_K} + sem.r_sem), 0) AS rrf
        FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    ), ranked AS (
        SELECT doc_id,
               CAST(r_lex AS BIGINT) AS r_lex,
               CAST(r_sem AS BIGINT) AS r_sem,
               ROUND(rrf, 6) AS rrf_score,
               ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rank
        FROM fused
    )
    SELECT doc_id, r_lex, r_sem, rrf_score, rank
    FROM ranked WHERE rank <= {_FUSED_TOPK}
    """,
    survey_ids=(
        "beyond-ref: hybrid retrieval — reciprocal-rank fusion of the "
        "BM25 lexical arm and the embedding-cosine semantic arm "
        "(RRF k=60, top-50 per arm, fused top-10)"
    ),
)
def x_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused top-10 for the fixed query (BM25 terms + vec_id-0 vector):
    rrf(d) = Σ_arm 1/(60 + rank_arm(d)), missing-from-arm contributes 0.

    Rank fusion sidesteps the two arms' incomparable score scales —
    the reason RRF is the default hybrid combiner. Determinism: ranks
    are integers, 1/(60+r) is exact double arithmetic identical across
    engines, ties (a doc holding rank r in one arm only vs another doc
    holding the same r in the other arm only) break by doc_id in both.

    Plan: each arm is TakeOrderedAndProject(50) (pinned for BM25 by
    test_plan_audit), so the full-outer fusion join sees ≤50 rows per
    side at any corpus size; the rank windows run over ≤50/≤100 rows by
    construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    lex_top = (
        bm25_scored(docs)
        .orderBy(F.col("s").desc(), F.col("doc_id").asc())
        .limit(_ARM_TOPN)
    )
    lex = lex_top.withColumn(
        "r_lex",
        F.row_number().over(Window.orderBy(F.col("s").desc(), F.col("doc_id").asc())),
    ).select("doc_id", "r_lex")

    qvec = emb.filter(F.col("vec_id") == _QVEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    sem_scored = (
        emb.filter(F.col("vec_id") != _QVEC_ID)
        .crossJoin(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("embedding"), F.col("qvec")).alias("cs"),
        )
    )
    sem_top = sem_scored.orderBy(
        F.col("cs").desc(), F.col("doc_id").asc()
    ).limit(_ARM_TOPN)
    sem = sem_top.withColumn(
        "r_sem",
        F.row_number().over(Window.orderBy(F.col("cs").desc(), F.col("doc_id").asc())),
    ).select("doc_id", "r_sem")

    rrf = F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("r_lex")), F.lit(0.0)) + F.coalesce(
        1.0 / (F.lit(_RRF_K) + F.col("r_sem")), F.lit(0.0)
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        F.col("r_lex").cast("bigint").alias("r_lex"),
        F.col("r_sem").cast("bigint").alias("r_sem"),
        rrf.alias("rrf"),
    )
    top = fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(_FUSED_TOPK)
    return (
        top.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
            ),
        )
        .select(
            "doc_id",
            "r_lex",
            "r_sem",
            F.round("rrf", 6).alias("rrf_score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
