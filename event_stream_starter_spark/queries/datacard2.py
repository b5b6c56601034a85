"""Datacard v2: the per-language release datasheet, one row per lang.

x_corpus_datacard (textdata.py) is the per-(lang, source) inventory;
this module joins the round-7/8 corpus-statistics families into ONE
datasheet a release ships next to it: token-distribution shape
(x_zipf_entropy), repetitiveness (x_bigram_entropy), difficulty
(x_readability rollup), quality (the datacard quality law), and the
tokenizer bake-off economics (x_tokenizer_fertility_compare's BPE and
unigram fertilities). Every input family is independently full-oracled;
the oracle here composes those REGISTERED oracle strings as subqueries,
so the datasheet's provenance is literally the certified queries.

This module must import AFTER corpusstats/tokenizer/textdata in
queries.all_queries (it reads their REGISTRY oracles at import time).

Scale shape: each input family keeps its own certified plan (one corpus
pass each — a release datasheet runs once per corpus build, and the
families are separate passes at any scale); the joins here are
|langs|-sized broadcasts. No new corpus-sized work is introduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import textan
from . import REGISTRY, query
from .corpusstats import x_bigram_entropy, x_readability, x_zipf_entropy
from .textdata import _quality_duck
from .tokenizer import x_tokenizer_fertility_compare

_Z = REGISTRY["x_zipf_entropy"].oracle
_B = REGISTRY["x_bigram_entropy"].oracle
_R = REGISTRY["x_readability"].oracle
_T = REGISTRY["x_tokenizer_fertility_compare"].oracle


@query(
    "x_corpus_datacard_v2",
    f"""
    WITH dq AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(CAST(SUM(CAST(ROUND({_quality_duck()}, 6)
                                   AS DECIMAL(18,6))) AS DOUBLE)
                     / COUNT(*), 6) + 0 AS mean_quality
        FROM documents GROUP BY lang
    ), dr AS (
        SELECT d.lang,
               ROUND(CAST(SUM(CAST(r.fk_grade AS DECIMAL(18,6))) AS DOUBLE)
                     / COUNT(r.fk_grade), 6) + 0 AS mean_fk_grade
        FROM ({_R}) r JOIN documents d ON d.doc_id = r.doc_id
        WHERE r.fk_grade IS NOT NULL
        GROUP BY d.lang
    )
    SELECT z.lang,
           dq.n_docs,
           z.n_tokens AS total_tokens,
           z.n_types,
           z.type_token_ratio,
           z.entropy_bits,
           z.zipf_slope,
           z.top100_mass,
           b.cond_entropy_bits,
           b.bigram_ttr,
           dq.mean_quality,
           dr.mean_fk_grade,
           t.sum_words,
           t.bpe_fertility,
           t.unigram_fertility
    FROM ({_Z}) z
    JOIN ({_B}) b USING (lang)
    JOIN ({_T}) t USING (lang)
    JOIN dq USING (lang)
    JOIN dr USING (lang)
    """,
    survey_ids=(
        "training-pipeline: datacard v2 — per-language release "
        "datasheet joining the certified zipf/entropy, bigram-entropy, "
        "readability, quality and BPE-vs-unigram fertility families "
        "into one row per language (Gebru et al. 2021 datasheet shape); "
        "oracle composes the registered component oracles verbatim"
    ),
)
def x_corpus_datacard_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One datasheet row per language: corpus mass (docs/tokens/types),
    distribution shape (TTR, unigram entropy, Zipf slope, top-100
    mass), repetitiveness (bigram conditional entropy + TTR), mean
    quality, mean Flesch-Kincaid grade (letterless docs excluded from
    the mean in both engines), and both frozen tokenizers' fertility.

    Every column is produced by the SAME certified query fns the
    families register individually — this query only joins their
    |langs|-sized outputs (broadcast) and adds the two small rollups
    (quality, readability-by-lang)."""
    docs = load_table(spark, sf_dir, "documents")
    z = x_zipf_entropy(spark, sf_dir)
    b = x_bigram_entropy(spark, sf_dir).select(
        "lang", "cond_entropy_bits", "bigram_ttr"
    )
    t = x_tokenizer_fertility_compare(spark, sf_dir).select(
        "lang", "sum_words", "bpe_fertility", "unigram_fertility"
    )
    tq = F.col("text")
    dq = docs.select(
        "lang",
        F.round(textan.quality_score(tq, textan.tokens(tq)), 6).alias("q"),
    ).groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.round(
                F.sum(F.col("q").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            )
            + 0
        ).alias("mean_quality"),
    )
    r = (
        x_readability(spark, sf_dir)
        .select("doc_id", "fk_grade")
        .filter(F.col("fk_grade").isNotNull())
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            (
                F.round(
                    F.sum(F.col("fk_grade").cast("decimal(18,6)")).cast(
                        "double"
                    )
                    / F.count("fk_grade"),
                    6,
                )
                + 0
            ).alias("mean_fk_grade")
        )
    )
    return (
        z.join(F.broadcast(b), "lang")
        .join(F.broadcast(t), "lang")
        .join(F.broadcast(dq), "lang")
        .join(F.broadcast(r), "lang")
        .select(
            "lang",
            "n_docs",
            F.col("n_tokens").alias("total_tokens"),
            "n_types",
            "type_token_ratio",
            "entropy_bits",
            "zipf_slope",
            "top100_mass",
            "cond_entropy_bits",
            "bigram_ttr",
            "mean_quality",
            "mean_fk_grade",
            "sum_words",
            "bpe_fertility",
            "unigram_fertility",
        )
    )
