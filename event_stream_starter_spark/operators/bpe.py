"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The reference pipeline counts tokens with a pre-trained tokenizer
(reference worker/tasks.py token budgeting); a 100TB training-data
engine also needs to TRAIN the tokenizer on the corpus it curates.
The classic scale decomposition makes this tractable:

1. ONE corpus-wide pass collapses 100TB of text to the distinct-word
   frequency table (``groupBy(word).count`` — partial aggregation
   map-side, one shuffle keyed by word). Vocabulary grows ~log with
   corpus size (Heaps' law), so the word table is ~10-100M rows —
   every merge round operates on IT, never on the corpus again.
2. Each merge round over the word table:
   a. explode adjacent symbol pairs weighted by word frequency —
      map-side; the pair count benefits from partial aggregation so
      the shuffle carries one row per distinct pair per partition;
   b. the argmax pair is ``orderBy(count desc, pair asc).limit(1)``
      = TakeOrderedAndProject over per-partition top-1s — a 1-row
      collect, the same driver-loop contract as label propagation
      (operators/graph.py);
   c. the merge applies to each word's symbol array MAP-SIDE (a
      fold, no shuffle) — left-to-right non-overlapping, matching
      the reference algorithm's scan exactly.
3. ``localCheckpoint`` every ``checkpoint_every`` rounds truncates
   the fold-on-fold lineage (the graph.py pattern).

Encoding is two-tier, like C2 URL normalization
(functions/normalize.py): a pure-Column fold path for bounded merge
lists (oracle-certifiable, whole-stage codegen) and an Arrow-batched
pandas-UDF path for production vocab sizes (32k merges would blow up
codegen; the UDF applies the same scan in rank order so the two paths
are value-identical — certified in-plan by x_bpe_encode_cert).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_symbols(word: Column) -> Column:
    """Initial BPE symbol sequence of a word: its characters, with the
    end-of-word marker appended to the LAST character (Sennrich's
    representation — so merges can't cross word boundaries and
    word-final units stay distinct from word-internal ones)."""
    chars = _chars(word)
    return F.concat(
        F.slice(chars, F.lit(1), F.size(chars) - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(END_OF_WORD))),
    )


def _chars(word: Column) -> Column:
    # substring() counts CODEPOINTS (matches DuckDB regexp_extract_all
    # (word, '.') and Python iteration), so unicode words split
    # identically in all three engines.
    idx = F.sequence(F.lit(1), F.length(word))
    return F.transform(idx, lambda i: F.substring(word, i, F.lit(1)))


def merge_pair(syms: Column, left: str, right: str) -> Column:
    """Apply ONE merge (left, right) -> left+right to a symbol array,
    left-to-right non-overlapping — exactly the reference scan
    (i += 2 after a merge). The fold's greedy "merge when the
    accumulator tail is `left`" is equivalent: a just-merged tail
    equals left+right, which can never equal `left` (symbols are
    non-empty, so len(left+right) > len(left)), so a merged element
    is never re-merged as the left operand within the same round."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def build_word_vocab(docs_text: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-wide pass: whitespace words -> (word, cnt, syms).

    Map-side explode + one shuffle keyed by word (partial aggregation
    halves the shuffle volume); everything after runs on the distinct-
    word table only."""
    from . import textan

    words = (
        docs_text.select(F.explode(textan.tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return words.withColumn("syms", word_symbols(F.col("word")))


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the current symbol vocabulary,
    weighted by word frequency, counted WITH multiplicity ('aaa'
    contributes (a,a) twice — the reference get_stats contract).
    Single-symbol words are filtered before the explode so the
    sequence() bound can't invert."""
    multi = vocab.filter(F.size("syms") >= 2)
    pairs = multi.select(
        "cnt",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("left"),
                    F.element_at(F.col("syms"), i + 1).alias("right"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right")).agg(
        F.sum("cnt").alias("pair_count")
    )


def train_bpe(
    docs_text: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[dict]:
    """Learn up to ``num_merges`` BPE merges from a text column.

    Returns the merge table as a list of dicts (rank 1-based, left,
    right, merged, pair_count) in learned order. Ties break
    deterministically on (pair_count DESC, left ASC, right ASC) —
    pinned in both the Spark argmax and the pure-Python golden
    (tests/test_bpe.py), so the merge sequence is reproducible across
    engines and partitionings. Stops early when no pair reaches
    ``min_pair_count`` (merging singletons is pure overfit).

    Driver-loop cost: one vocab-table aggregation + a 1-row collect
    per round — num_merges jobs over the (small) word table, never
    the corpus. localCheckpoint every ``checkpoint_every`` rounds
    bounds the fold-expression lineage depth.
    """
    vocab = build_word_vocab(docs_text, text_col).localCheckpoint(eager=True)
    merges: list[dict] = []
    for rank in range(1, num_merges + 1):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append(
            {
                "rank": rank,
                "left": left,
                "right": right,
                "merged": left + right,
                "pair_count": int(cnt),
            }
        )
        vocab = vocab.withColumn("syms", merge_pair(F.col("syms"), left, right))
        if rank % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def encode_word_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Column-expression encoder: initial symbols, then each merge in
    rank order. Codegen-friendly only for bounded merge lists (each
    merge is one fold over the array) — the certification arm. For
    production vocab sizes use :func:`bpe_encode_udf`."""
    syms = word_symbols(word)
    for left, right in merges:
        syms = merge_pair(syms, left, right)
    return syms


def encode_text_expr(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Encode whitespace-tokenized text to BPE pieces, expression path.
    Map-only: no shuffle, no Python — the merge list is baked into the
    plan as literals (the broadcast-of-a-model pattern, model = merge
    table)."""
    from . import textan

    words = F.filter(textan.tokens(text), lambda w: F.length(w) > 0)
    return F.flatten(F.transform(words, lambda w: encode_word_expr(w, merges)))


def _encode_word_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word)
    syms[-1] = syms[-1] + END_OF_WORD
    for left, right in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_text_py(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python row encoder — the UDF kernel AND the golden-test
    reference. Same scan as merge_pair/encode_word_expr by
    construction; x_bpe_encode_cert proves the agreement in-plan."""
    pieces: list[str] = []
    for w in text.lower().split():
        if w:
            pieces.extend(_encode_word_py(w, merges))
    return pieces


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """Arrow-batched pandas UDF encoder for production merge lists.
    Per-row Python inside an Arrow batch (the normalize_url_full
    tier-2 pattern, functions/normalize.py) — at 32k merges a real
    deployment would swap the kernel for a compiled tokenizer via the
    same seam; the signature and batch shape are what matter here."""
    import pandas as pd  # noqa: F401  (pandas_udf requires pandas present)
    from pyspark.sql.functions import pandas_udf

    frozen = [tuple(m) for m in merges]

    @pandas_udf("array<string>")
    def _encode(texts):  # type: ignore[no-untyped-def]
        return texts.map(
            lambda t: encode_text_py(t, frozen) if isinstance(t, str) else None
        )

    return _encode
