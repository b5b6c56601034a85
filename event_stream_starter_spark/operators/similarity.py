"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant
(random hyperplane signs) is the 100TB scale path — candidates only meet
inside a bucket, so the join is |Q|x|bucket| not |Q|x|N|.

Dot products use the higher-order `aggregate`/`zip_with` built-ins —
JVM-side, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    # Cast to double BEFORE multiplying: float32 products lose ~1e-7 of
    # precision, enough to flip a rounded 6-dp comparison.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, rank per query. Output: (query_id, corpus_id, cos_sim, rank).

    At scale the corpus side is the big table (map-side scored, one
    shuffle of |Q|*k candidates via the window); queries are broadcast.
    """
    q = queries.select(
        F.col(query_id).alias("qid"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(corpus_id).alias("cid"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("cid"))
        .withColumn("cos_sim", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("cid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id + "_q"),
            F.col("cid").alias(corpus_id + "_c"),
            "cos_sim",
            "rank",
        )
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of dot(vec, plane_i),
    packed into a string key. Deterministic given the plane list.
    """
    bits = [
        F.when(dot(vec, F.array(*[F.lit(float(x)) for x in p])) >= 0, "1").otherwise("0")
        for p in planes
    ]
    return F.concat(*bits)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    planes: list[list[float]] | list[list[list[float]]],
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: candidates meet only inside a matching
    hyperplane bucket, then exact-cosine rank.

    ``planes`` is one plane table or a LIST of tables (multi-probe OR):
    recall = 1-(1-p^b)^L for per-plane agreement p — more/smaller tables
    trade candidate volume for recall. Recall is only meaningful when the
    corpus HAS neighbor structure; on isotropic noise every sublinear
    method degenerates to chance (validated on a planted-cluster corpus
    in tests/test_neardup_golden.py).
    """
    tables: list[list[list[float]]] = (
        planes if isinstance(planes[0][0], list) else [planes]  # type: ignore[index]
    )
    bucket_keys = F.array(
        *[
            F.concat(F.lit(f"{i}:"), hyperplane_bucket(F.col(vec_col), tbl))
            for i, tbl in enumerate(tables)
        ]
    )
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.explode(bucket_keys).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("cid"),
        F.col(vec_col).alias("cvec"),
        F.explode(bucket_keys).alias("bucket"),
    )
    cand = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("qid") != F.col("cid"))
        .dropDuplicates(["qid", "cid"])  # pair may share several tables
    )
    scored = cand.withColumn("cos_sim", cosine(F.col("qvec"), F.col("cvec")))
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id + "_q"),
            F.col("cid").alias(corpus_id + "_c"),
            "cos_sim",
            "rank",
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_col: Column | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= t).

    `block_col` bounds the self-join (e.g. an LSH bucket or a label); when
    None the join is unblocked — fine for oracle-scale tests, NOT the
    100TB path (use hyperplane buckets there).
    """
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("vec")]
    if block_col is not None:
        cols.append(block_col.alias("blk"))
    base = df.select(*cols)
    a, b = base.alias("a"), base.alias("b")
    on = (
        (F.col("a.blk") == F.col("b.blk"))
        if block_col is not None
        else F.lit(True)
    )
    return (
        a.join(b, on & (F.col("a.id") < F.col("b.id")))
        .withColumn("cos_sim", cosine(F.col("a.vec"), F.col("b.vec")))
        .filter(F.col("cos_sim") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "cos_sim",
        )
    )
