"""BPE tokenizer training + encoding over the documents table.

The corpus-curation engine's tokenizer stage: train subword merges on
the corpus it just curated (operators/bpe.py holds the distributed
decomposition), then encode documents to measure real token budgets —
the reference's token accounting (worker/tasks.py token budgeting,
SURVEY §2.3 C9 score inputs) assumes a tokenizer exists; at 100TB the
engine must be able to produce one from the data itself.

Certification story (the a5 pattern, three tiers):
- `x_bpe_first_merge`: the pair-counting core has a FULL DuckDB
  oracle — round-1 adjacent-pair counts are plain SQL in both engines
  (hash-checked).
- `x_bpe_encode_cert`: the two encoder tiers (pure-Column fold vs
  Arrow-batched UDF) are proven value-identical IN-PLAN over every
  document; the oracle pins n_agree == n_docs, so a single diverging
  document fails the hash.
- `x_bpe_train` / `x_bpe_encode`: the iterative argmax loop is
  genuinely non-SQL-expressible — rows-only for the driver, with
  exact merge-sequence parity vs a pure-Python Sennrich reference
  trainer in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import bpe, textan
from . import query
from .textdata import _TOKS_DUCK

_N_MERGES = 24

# One 24-round train per (process, sf_dir); every consumer below reuses
# it. Greedy-prefix property: a k<=24 merge list is merges[:k], so the
# cert query's 16-merge encoder needs no second training run. The data
# under an sf_dir is immutable test data — the memo can't go stale.
_MERGE_CACHE: dict[str, list[dict]] = {}


def _trained_merges(spark: SparkSession, sf_dir: str) -> list[dict]:
    got = _MERGE_CACHE.get(sf_dir)
    if got is None:
        docs = load_table(spark, sf_dir, "documents")
        got = bpe.train_bpe(docs.select("text"), _N_MERGES, min_pair_count=2)
        _MERGE_CACHE[sf_dir] = got
    return got


@query(
    "x_bpe_first_merge",
    f"""
    WITH words AS (
        SELECT word, COUNT(*) AS cnt
        FROM (SELECT unnest({_TOKS_DUCK}) AS word FROM documents)
        WHERE length(word) > 0
        GROUP BY word
    ),
    syms AS (
        SELECT cnt, list_concat(l[1:len(l) - 1], [l[-1] || '</w>']) AS s
        FROM (SELECT cnt, regexp_extract_all(word, '.') AS l FROM words)
    ),
    pairs AS (
        SELECT cnt,
               unnest(list_transform(range(1, len(s)),
                                     i -> struct_pack(lhs := s[i], rhs := s[i + 1]))) AS p
        FROM syms
        WHERE len(s) >= 2
    )
    SELECT p.lhs AS lhs, p.rhs AS rhs, CAST(SUM(cnt) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY 1, 2
    ORDER BY pair_count DESC, lhs, rhs
    LIMIT 20
    """,
    survey_ids="beyond-ref: BPE trainer pair-counting core (oracle-certified round 1)",
)
def x_bpe_first_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 round-1 BPE pair candidates with corpus frequencies.

    The hash-checked arm of the trainer: round 1's pair histogram is
    the exact aggregation every later round repeats on a shrinking
    symbol vocabulary, and it IS ANSI-SQL-expressible — so the
    trainer's counting core gets a full DuckDB oracle even though the
    iterative loop can't. Scale shape: one shuffle to the word table
    (partial agg), map-side pair explode over distinct words only,
    partial-agg pair count, TakeOrdered(20) — the corpus is scanned
    once, the ordering never materializes a full sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    vocab = bpe.build_word_vocab(docs.select("text"))
    return (
        bpe.pair_counts(vocab)
        .select(
            F.col("left").alias("lhs"),
            F.col("right").alias("rhs"),
            "pair_count",
        )
        .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
        .limit(20)
    )


@query(
    "x_bpe_train",
    None,  # iterative argmax loop: not SQL-expressible; golden-tested
    survey_ids="beyond-ref: distributed BPE tokenizer training (Sennrich 2016)",
)
def x_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: 24 merges, (pair_count DESC, lhs, rhs)
    tie-break, early-stop below pair_count 2.

    Rows-only for the driver (the loop is iterative); the real check
    is tests/test_bpe.py: exact merge-SEQUENCE equality against a
    pure-Python Sennrich reference trainer on the same corpus — every
    rank, pair, and count must match, so the distributed pair count,
    tie-break, and merge application are all load-bearing. Below
    bpe.SMALL_VOCAB_LIMIT the trainer runs its size-gated driver loop
    (2 jobs total, identical merges — path equality pinned by
    test_driver_and_distributed_paths_agree); the distributed
    per-merge loop engages only above the documented driver budget.
    """
    merges = _trained_merges(spark, sf_dir)
    schema = "rank INT, lhs STRING, rhs STRING, merged STRING, pair_count BIGINT"
    rows = [
        (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
        for m in merges
    ]
    return spark.createDataFrame(rows, schema)


@query(
    "x_bpe_encode_cert",
    """
    SELECT COUNT(*) AS n_docs, COUNT(*) AS n_agree FROM documents
    """,
    survey_ids="beyond-ref: BPE encoder two-tier agreement (in-plan certification)",
)
def x_bpe_encode_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certifies the two encoder tiers agree on EVERY document: the
    pure-Column fold encoder (codegen, bounded merge lists) vs the
    Arrow-batched UDF encoder (production vocab sizes) with the same
    16 trained merges. The oracle states n_agree == n_docs as fact —
    one diverging document flips the hash, so the agreement is
    load-bearing, not advisory (the a5_approx_distinct pattern).
    """
    merges = [(m["left"], m["right"]) for m in _trained_merges(spark, sf_dir)[:16]]
    docs = load_table(spark, sf_dir, "documents")
    via_expr = bpe.encode_text_expr(F.col("text"), merges)
    via_udf = bpe.bpe_encode_udf(merges)(F.col("text"))
    return docs.select(
        via_expr.alias("e"), via_udf.alias("u")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("e").eqNullSafe(F.col("u")), 1).otherwise(0)).alias(
            "n_agree"
        ),
    )


@query(
    "x_bpe_encode",
    None,  # depends on the trained merge list: not SQL-expressible
    survey_ids="beyond-ref: BPE corpus encoding / token-budget accounting",
)
def x_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token budget under the corpus-trained tokenizer:
    whitespace words, BPE pieces (24 merges, UDF tier), fertility.

    Map-only over documents — the merge table rides into the plan
    with the UDF closure (the broadcast-a-model pattern; at 32k
    merges swap the kernel via the bpe_encode_udf seam, the plumbing
    is identical). Golden-tested against encode_text_py per doc.
    """
    merges = [(m["left"], m["right"]) for m in _trained_merges(spark, sf_dir)]
    docs = load_table(spark, sf_dir, "documents")
    pieces = bpe.bpe_encode_udf(merges)(F.col("text"))
    return docs.select(
        "doc_id",
        "source",
        F.size(
            F.filter(textan.tokens(F.col("text")), lambda w: F.length(w) > 0)
        ).alias("n_words"),
        F.size(pieces).alias("n_pieces"),
        F.slice(pieces, 1, 8).alias("pieces_head"),
    ).withColumn(
        "fertility",
        F.round(F.col("n_pieces") / F.greatest(F.col("n_words"), F.lit(1)), 6),
    )
