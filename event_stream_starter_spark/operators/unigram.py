"""Unigram LM tokenizer (Kudo 2018, "Subword Regularization") — the
second published tokenizer family next to operators/bpe.py, re-expressed
Spark-first so a tokenizer bake-off (BPE vs unigram fertility/coverage)
runs inside the engine.

Reference scope: the reference pipeline tokenizes with external models
(reference api/hf_sentiment.py's tokenizer is a fixed upstream
artifact); this module implements the PUBLISHED unigram training and
encoding laws so the engine can both train and serve its own model, the
same posture as operators/bpe.py.

Spark-first decomposition (mirrors bpe.py tier for tier):

- ONE corpus pass builds the distinct-word histogram (map-side explode,
  single shuffle keyed by word); everything after — seeding, EM,
  encoding — runs on the vocabulary-bounded word table or on broadcast
  model literals. At 100 TB the corpus is touched once per trained
  model and once per encode pass, exactly like BPE.
- Training is the hard-EM (Viterbi-EM) variant of Kudo's algorithm
  over a FIXED seed vocabulary: E-step segments every distinct word
  with the current model (Viterbi), M-step re-estimates piece log-probs
  from add-one-smoothed segment counts. Fixed vocab + hard assignments
  keep every quantity integer-or-decimal-exact, which is what buys
  cross-engine reproducibility (the same determinism-over-variance
  trade the repo's LR trainer makes; full soft-EM with vocabulary
  pruning changes only this module's M-step).
- All model scores are DECIMAL(18,9) log-probs (round-to-9dp at the
  single driver-side log() call): Viterbi path scores are then EXACT
  decimal sums, so the driver trainer, the distributed E-step, the
  codegen column encoder, the Arrow UDF tier and the DuckDB oracle all
  pick bit-identical segmentations — no float tie can flip a path.
- Tie-break: highest path score, then LONGEST last piece (max over
  (score, len) structs — lexicographic struct ordering, verified
  identical in Spark and DuckDB).
- Unknown characters (absent from the frozen vocab — possible when a
  frozen model meets a bigger corpus) encode as single-char pieces at
  UNK_LOGP, in every tier and in the oracle.

Tiers (the bpe.py pattern):
- viterbi_encode_expr: pure-Column/codegen encoder for bounded vocabs
  (the frozen-artifact tier; zero Python in the hot path).
- unigram_encode_udf: Arrow-batched pandas_udf for production vocab
  sizes (the 32k-piece tier), value-identical by the shared decimal law.
- _viterbi_py: the pure-Python twin goldens and the driver E-step use.
"""

from __future__ import annotations

import re
from decimal import Decimal
from math import log

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bpe import SMALL_VOCAB_LIMIT, build_word_vocab

UNK_LOGP = Decimal("-20.000000000")
_ACC = "DECIMAL(28,9)"  # path-score accumulator (word-length * |logp| headroom)
# Java-regex \s (the _UG_WORDS_SPARK / textan.tokens split law) is the
# ASCII class below — NOT Python str.split()'s Unicode whitespace. Every
# Python tier splits with this so \xa0/NEL documents can't diverge from
# the codegen arm.
_ASCII_WS = re.compile("[ \t\n\x0b\f\r]+")


def _q9(x: float) -> Decimal:
    """The module's single float touchpoint: ln() rounded HALF-EVEN to
    9dp. Everything downstream is exact decimal arithmetic."""
    return Decimal(x).quantize(Decimal("0.000000001"))


# --- pure-Python twin ---------------------------------------------------------


def _viterbi_py(
    word: str, scores: dict[str, Decimal], max_len: int
) -> list[str]:
    """Exact-decimal Viterbi segmentation of one word: best path score,
    ties to the longer last piece; unknown single chars at UNK_LOGP."""
    n = len(word)
    best: list[tuple[Decimal, int]] = [(Decimal(0), 0)]
    for i in range(1, n + 1):
        cands: list[tuple[Decimal, int]] = []
        for piece_len in range(1, min(max_len, i) + 1):
            piece = word[i - piece_len : i]
            s = scores.get(piece)
            if s is None and piece_len == 1:
                s = UNK_LOGP
            if s is not None:
                cands.append((best[i - piece_len][0] + s, piece_len))
        best.append(max(cands))  # (score, len) tuple order == struct order
    pieces: list[str] = []
    pos = n
    while pos > 0:
        piece_len = best[pos][1]
        pieces.insert(0, word[pos - piece_len : pos])
        pos -= piece_len
    return pieces


def encode_text_py(
    text: str, scores: dict[str, Decimal], max_len: int = 4
) -> list[str]:
    """Whitespace-word split (textan.tokens law: lower, collapse
    whitespace) then per-word Viterbi — the golden-test reference.
    Splits on the Java-regex ASCII \\s class the Spark arm uses, not
    Python's Unicode whitespace (\\xa0/NEL stay inside words)."""
    out: list[str] = []
    for w in _ASCII_WS.split(text.lower()):
        if w:
            out.extend(_viterbi_py(w, scores, max_len))
    return out


# --- column-expression (codegen) tier ----------------------------------------


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _score_map_spark(scores: list[tuple[str, Decimal]]) -> str:
    entries = ", ".join(
        f"{_sql_quote(p)}, CAST('{s}' AS DECIMAL(18,9))" for p, s in scores
    )
    return f"map({entries})"


def _best_table_sql(word: str, scores_map: str, max_len: int) -> str:
    """Spark SQL: the Viterbi DP table for `word` (an expr string) as
    array<struct<s,l>>, 1-indexed by prefix length + 1 (element 1 is
    the empty prefix). Candidates per position are the <= max_len
    statically-unrolled lookback structs; max is lexicographic struct
    max = (best score, then longest piece)."""
    cands = []
    for piece_len in range(1, max_len + 1):
        piece = f"substring({word}, i - {piece_len} + 1, {piece_len})"
        prev = f"element_at(acc, i - {piece_len} + 1).s"
        hit = f"element_at({scores_map}, {piece})"
        if piece_len == 1:
            score = f"({prev} + coalesce({hit}, CAST('{UNK_LOGP}' AS DECIMAL(18,9))))"
            cands.append(
                f"named_struct('s', CAST({score} AS {_ACC}), 'l', {piece_len})"
            )
        else:
            score = f"({prev} + {hit})"
            cands.append(
                f"CASE WHEN i >= {piece_len} AND {hit} IS NOT NULL THEN "
                f"named_struct('s', CAST({score} AS {_ACC}), 'l', {piece_len}) END"
            )
    cand_arr = f"filter(array({', '.join(cands)}), x -> x IS NOT NULL)"
    init = f"array(named_struct('s', CAST(0 AS {_ACC}), 'l', 0))"
    return (
        f"aggregate(sequence(1, length({word})), {init},"
        f" (acc, i) -> concat(acc, array(array_max({cand_arr}))))"
    )


def _walk_back_sql(word: str, bt: str) -> str:
    """Spark SQL: reconstruct the piece list from the DP table `bt` by
    walking backpointers from the end (n steps bound the walk; steps
    after pos hits 0 are no-ops)."""
    step_len = f"element_at({bt}, st.pos + 1).l"
    piece = f"substring({word}, st.pos - {step_len} + 1, {step_len})"
    return (
        f"aggregate(sequence(1, length({word})),"
        f" named_struct('pos', length({word}),"
        f" 'ps', cast(array() as array<string>)),"
        f" (st, x) -> CASE WHEN st.pos > 0 THEN named_struct("
        f"'pos', st.pos - {step_len},"
        f" 'ps', concat(array({piece}), st.ps)) ELSE st END,"
        f" st -> st.ps)"
    )


def viterbi_words_sql(
    words_sql: str, scores: list[tuple[str, Decimal]], max_len: int = 4
) -> str:
    """Spark SQL expr string: encode the array<string> produced by
    `words_sql` into the flattened piece list — entirely inside
    whole-stage codegen, model as a map literal baked into the plan.
    The per-word lambda is generated as SQL text (variable `w`). SQL
    lambdas have no let-binding, so the DP table is carried to the
    backpointer walk by an inner transform producing (word, table)
    structs — the O(len * max_len) fold runs ONCE per word, the walk
    reads `x.bt`. Bounded-vocab tier; production vocab sizes swap to
    unigram_encode_udf behind the same law."""
    m = _score_map_spark(scores)
    bt = _best_table_sql("w", m, max_len)
    # NB: the struct variable must not collide with the walk fold's own
    # lambda variables (st, x) — `wb` is reserved for this splice.
    per_word = _walk_back_sql("wb.w", "wb.bt")
    return (
        f"flatten(transform(transform({words_sql},"
        f" w -> named_struct('w', w, 'bt', {bt})), wb -> {per_word}))"
    )


def viterbi_encode_words_expr(
    words_sql: str, scores: list[tuple[str, Decimal]], max_len: int = 4
) -> Column:
    return F.expr(viterbi_words_sql(words_sql, scores, max_len))


def unigram_encode_udf(scores: list[tuple[str, Decimal]], max_len: int = 4):
    """Arrow-batched encoder tier: text -> array<string> pieces under
    the same decimal Viterbi law (production vocab sizes; the codegen
    tier's map literal stops being viable at 32k pieces)."""
    import pandas as pd  # noqa: F401  (pandas_udf requires pandas present)
    from pyspark.sql.functions import pandas_udf

    table = dict(scores)

    @pandas_udf("array<string>")
    def enc(texts):  # type: ignore[no-untyped-def]
        return texts.map(
            lambda t: encode_text_py(t, table, max_len)
            if isinstance(t, str)
            else None
        )

    return enc


# --- training (hard EM over a fixed seed vocabulary) -------------------------


def _seed_pieces(
    word_counts: list[tuple[str, int]], vocab_size: int, max_len: int
) -> list[str]:
    """Deterministic seed vocabulary: every single character (coverage
    guarantee), plus the top multi-char substrings (length <= max_len)
    by corpus-weighted occurrence count, ties broken lexicographically."""
    singles: set[str] = set()
    counts: dict[str, int] = {}
    for word, cnt in word_counts:
        for ch in word:
            singles.add(ch)
        for piece_len in range(2, max_len + 1):
            for i in range(len(word) - piece_len + 1):
                p = word[i : i + piece_len]
                counts[p] = counts.get(p, 0) + cnt
    room = max(vocab_size - len(singles), 0)
    multi = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:room]
    return sorted(singles) + [p for p, _ in multi]


def _mstep(counts: dict[str, int], pieces: list[str]) -> dict[str, Decimal]:
    """Add-one-smoothed log-prob re-estimate: logp = ln((c+1)/(total+V)),
    computed ONCE in driver Python and quantized to 9dp — the single
    float touchpoint every execution tier then shares exactly."""
    total = sum(counts.get(p, 0) for p in pieces) + len(pieces)
    return {p: _q9(log((counts.get(p, 0) + 1) / total)) for p in pieces}


def train_unigram(
    docs_text: DataFrame,
    vocab_size: int = 48,
    max_len: int = 4,
    em_iters: int = 2,
    text_col: str = "text",
    small_vocab_limit: int | None = SMALL_VOCAB_LIMIT,
) -> list[tuple[str, Decimal]]:
    """Learn a unigram piece table from a text column. Returns
    [(piece, logp)] sorted by piece.

    Two execution tiers, identical results (the bpe.train_bpe pattern —
    path equality pinned in tests/test_unigram.py):

    - vocab rows <= small_vocab_limit: collect the (word, cnt)
      histogram once and run seeding + EM in driver Python (~2 Spark
      jobs total). Vocabulary grows ~log with corpus size (Heaps' law),
      so this is the common path; see bpe.SMALL_VOCAB_LIMIT's budget.
    - above the gate: the distributed loop — the E-step Viterbi runs as
      the codegen column encoder over the word table (model = broadcast
      map literal), the M-step is one explode + groupBy over pieces
      (model-sized result collected per round). The corpus itself is
      never re-read after the first histogram pass.
    """
    vocab = build_word_vocab(docs_text, text_col).localCheckpoint(eager=True)
    if small_vocab_limit and vocab.count() <= small_vocab_limit:
        rows = vocab.select("word", "cnt").collect()
        wc = [(r["word"], r["cnt"]) for r in rows]
        return _train_driver(wc, vocab_size, max_len, em_iters)

    # distributed tier: seed substring counts via one explode+groupBy
    # NB: Spark sequence(1, 0) is the DESCENDING [1, 0], not empty — the
    # when() guard keeps words shorter than piece_len from contributing
    # phantom (double-counted) substrings.
    empty = F.array().cast("array<string>")
    subs = vocab.select(
        "cnt",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(2), F.lit(max_len)),
                    lambda piece_len: F.when(
                        F.length("word") >= piece_len,
                        F.transform(
                            F.sequence(
                                F.lit(1), F.length("word") - piece_len + 1
                            ),
                            lambda i: F.substring(
                                F.col("word"), i, piece_len
                            ),
                        ),
                    ).otherwise(empty),
                )
            )
        ).alias("p"),
    ).filter(F.length("p") >= 2)
    sub_counts = subs.groupBy("p").agg(F.sum("cnt").alias("c"))
    singles = sorted(
        r["ch"]
        for r in vocab.select(
            F.explode(F.split(F.col("word"), "")).alias("ch")
        )
        .filter(F.length("ch") > 0)
        .distinct()
        .collect()
    )
    room = max(vocab_size - len(singles), 0)
    top_multi = [
        r["p"]
        for r in sub_counts.orderBy(F.desc("c"), F.asc("p")).limit(room).collect()
    ]
    pieces = singles + top_multi
    seed_rows = {
        r["p"]: r["c"]
        for r in sub_counts.filter(F.col("p").isin(pieces)).collect()
    }
    single_counts = (
        vocab.select(
            "cnt", F.explode(F.split(F.col("word"), "")).alias("ch")
        )
        .filter(F.length("ch") > 0)
        .groupBy("ch")
        .agg(F.sum("cnt").alias("c"))
        .collect()
    )
    for r in single_counts:
        seed_rows[r["ch"]] = r["c"]
    scores = _mstep({p: int(seed_rows.get(p, 0)) for p in pieces}, pieces)
    ordered = sorted(scores.items())
    for _ in range(em_iters):
        enc = viterbi_encode_words_expr("array(word)", ordered, max_len)
        seg = vocab.select("cnt", F.explode(enc).alias("p"))
        counts = {
            r["p"]: int(r["c"])
            for r in seg.groupBy("p").agg(F.sum("cnt").alias("c")).collect()
        }
        scores = _mstep(counts, pieces)
        ordered = sorted(scores.items())
    return ordered


def _train_driver(
    word_counts: list[tuple[str, int]],
    vocab_size: int,
    max_len: int,
    em_iters: int,
) -> list[tuple[str, Decimal]]:
    """Driver-Python tier: identical seeding + EM over the collected
    histogram (the _train_bpe_driver pattern)."""
    pieces = _seed_pieces(word_counts, vocab_size, max_len)
    counts: dict[str, int] = {}
    for word, cnt in word_counts:
        for ch in word:
            counts[ch] = counts.get(ch, 0) + cnt
        for piece_len in range(2, max_len + 1):
            for i in range(len(word) - piece_len + 1):
                p = word[i : i + piece_len]
                counts[p] = counts.get(p, 0) + cnt
    scores = _mstep({p: counts.get(p, 0) for p in pieces}, pieces)
    for _ in range(em_iters):
        seg_counts: dict[str, int] = {}
        for word, cnt in word_counts:
            for p in _viterbi_py(word, scores, max_len):
                seg_counts[p] = seg_counts.get(p, 0) + cnt
        scores = _mstep(seg_counts, pieces)
    return sorted(scores.items())


# --- published trainer: soft-EM + likelihood-loss vocabulary pruning ---------
#
# Kudo 2018 §3.2/4.2 (the SentencePiece algorithm): seed a LARGE
# candidate vocabulary, alternate (a) EM over piece probabilities with
# the E-step marginalizing over ALL segmentations (forward-backward on
# the word lattice) and (b) pruning — drop the pieces whose removal
# costs the corpus likelihood least — until the target size is reached.
# The hard-EM `train_unigram` above stays as the deterministic scale
# twin; this is what real tokenizer bake-offs compare against.
#
# Determinism contract (the module's posture, extended):
# - The per-word forward-backward runs in float (logsumexp is not
#   decimal-expressible), but each word's expected piece counts are
#   QUANTIZED to 9dp decimals BEFORE the cross-word sum — so the
#   cross-word aggregation is exact, order-independent decimal
#   arithmetic and the driver tier, the distributed tier and the
#   pure-Python twin sum the same numbers to the same totals. The float
#   boundary is per-word-bounded and runs the same CPython code in
#   every tier (the _q9 single-touchpoint pattern, widened per word).
# - Pruning is the SentencePiece Viterbi-frequency form: freq[x] =
#   corpus-weighted count of x in the current Viterbi segmentation
#   (exact ints, reusing the decimal Viterbi), and
#   loss[x] = freq[x] * (logp(x) - alt(x)) where alt(x) is the best
#   Viterbi score of the STRING x under the model WITHOUT x — all
#   exact decimal products/differences, so the kept set is
#   deterministic (rank ties break lexicographically).
# - Single-character pieces are never pruned (coverage guarantee).


def _logadd(a: float, b: float) -> float:
    """log(exp(a) + exp(b)) without overflow; -inf is the identity."""
    from math import exp, log1p

    if a == float("-inf"):
        return b
    if b == float("-inf"):
        return a
    hi, lo = (a, b) if a >= b else (b, a)
    return hi + log1p(exp(lo - hi))


def expected_counts_py(
    word: str, scores: dict[str, Decimal], max_len: int
) -> dict[str, float]:
    """Soft E-step for one word: expected count of each IN-VOCAB piece
    over all segmentations (forward-backward on the segmentation
    lattice). Out-of-vocab single chars participate at UNK_LOGP so the
    lattice always completes, but collect no mass (they are not model
    parameters)."""
    from math import exp

    n = len(word)
    neg = float("-inf")
    lp = {p: float(s) for p, s in scores.items()}

    def piece_lp(piece: str) -> float | None:
        v = lp.get(piece)
        if v is None and len(piece) == 1:
            return float(UNK_LOGP)
        return v

    alpha = [neg] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        acc = neg
        for piece_len in range(1, min(max_len, i) + 1):
            s = piece_lp(word[i - piece_len : i])
            if s is not None:
                acc = _logadd(acc, alpha[i - piece_len] + s)
        alpha[i] = acc
    beta = [neg] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = neg
        for piece_len in range(1, min(max_len, n - i) + 1):
            s = piece_lp(word[i : i + piece_len])
            if s is not None:
                acc = _logadd(acc, beta[i + piece_len] + s)
        beta[i] = acc
    z = alpha[n]
    out: dict[str, float] = {}
    for i in range(n):
        for piece_len in range(1, min(max_len, n - i) + 1):
            piece = word[i : i + piece_len]
            if piece in lp:
                out[piece] = out.get(piece, 0.0) + exp(
                    alpha[i] + lp[piece] + beta[i + piece_len] - z
                )
    return out


def _soft_counts_word(
    word: str, cnt: int, scores: dict[str, Decimal], max_len: int
) -> list[tuple[str, Decimal]]:
    """One word's quantized soft-count contributions: q9(cnt * E[piece])
    — the per-word float boundary; everything downstream sums exactly."""
    return [
        (p, _q9(cnt * e))
        for p, e in sorted(expected_counts_py(word, scores, max_len).items())
    ]


def _viterbi_score_py(
    word: str, scores: dict[str, Decimal], max_len: int
) -> Decimal:
    """Best exact-decimal path score (same DP as _viterbi_py, score only)."""
    n = len(word)
    best: list[Decimal] = [Decimal(0)]
    for i in range(1, n + 1):
        cands: list[Decimal] = []
        for piece_len in range(1, min(max_len, i) + 1):
            s = scores.get(word[i - piece_len : i])
            if s is None and piece_len == 1:
                s = UNK_LOGP
            if s is not None:
                cands.append(best[i - piece_len] + s)
        best.append(max(cands))
    return best[n]


def _mstep_soft(
    counts: dict[str, Decimal], pieces: list[str]
) -> dict[str, Decimal]:
    """Add-one-smoothed M-step over DECIMAL soft counts (the _mstep law
    with fractional counts): logp = q9(ln((c+1)/(total+V))). The single
    float touchpoint per piece; inputs are exact decimals so every tier
    computes the identical quotient."""
    total = sum((counts.get(p, Decimal(0)) for p in pieces), Decimal(0)) + len(
        pieces
    )
    ftot = float(total)
    return {
        p: _q9(log(float(counts.get(p, Decimal(0)) + 1) / ftot))
        for p in pieces
    }


def _prune_losses(
    scores: dict[str, Decimal],
    freq: dict[str, int],
    multi: list[str],
    max_len: int,
) -> dict[str, Decimal]:
    """Exact-decimal likelihood loss of removing each multi-char piece:
    freq[x] * (logp(x) - best-alternative-segmentation score of x
    without x). Unused pieces (freq 0) get loss 0 — pruned first."""
    out: dict[str, Decimal] = {}
    for p in multi:
        f = freq.get(p, 0)
        if f == 0:
            out[p] = Decimal(0)
            continue
        rest = {k: v for k, v in scores.items() if k != p}
        out[p] = f * (scores[p] - _viterbi_score_py(p, rest, max_len))
    return out


def train_unigram_pruned(
    docs_text: DataFrame,
    vocab_size: int = 48,
    max_len: int = 4,
    seed_factor: int = 4,
    shrink_keep: Decimal = Decimal("0.75"),
    em_iters_per_round: int = 2,
    text_col: str = "text",
    small_vocab_limit: int | None = SMALL_VOCAB_LIMIT,
) -> list[tuple[str, Decimal]]:
    """The PUBLISHED unigram trainer (Kudo 2018 §3.2/4.2): seed
    seed_factor * vocab_size candidates, then alternate soft-EM rounds
    with likelihood-loss pruning (keep the best shrink_keep fraction of
    multi-char pieces, floored at the target) until vocab_size remains.
    Returns [(piece, logp DECIMAL(18,9))] sorted by piece.

    Two execution tiers, identical results (the train_unigram gate):
    the collected-histogram driver tier, and the distributed tier where
    the soft E-step is an Arrow-batched pandas UDF over the word table
    (per-word quantized decimals, one explode + groupBy per iteration)
    and the Viterbi frequencies reuse the codegen encoder. The corpus
    is read once (the word histogram); every later pass is over the
    Heaps-law-bounded word table; pruning arithmetic is model-sized
    driver work.
    """
    vocab = build_word_vocab(docs_text, text_col).localCheckpoint(eager=True)
    if small_vocab_limit and vocab.count() <= small_vocab_limit:
        rows = vocab.select("word", "cnt").collect()
        wc = [(r["word"], r["cnt"]) for r in rows]

        def soft_counts(sc: dict[str, Decimal]) -> dict[str, Decimal]:
            agg: dict[str, Decimal] = {}
            for word, cnt in wc:
                for p, q in _soft_counts_word(word, cnt, sc, max_len):
                    agg[p] = agg.get(p, Decimal(0)) + q
            return agg

        def viterbi_freq(sc: dict[str, Decimal]) -> dict[str, int]:
            agg: dict[str, int] = {}
            for word, cnt in wc:
                for p in _viterbi_py(word, sc, max_len):
                    agg[p] = agg.get(p, 0) + cnt
            return agg

        seed = _seed_pieces(wc, seed_factor * vocab_size, max_len)
        seed_counts: dict[str, int] = {}
        for word, cnt in wc:
            for ch in word:
                seed_counts[ch] = seed_counts.get(ch, 0) + cnt
            for piece_len in range(2, max_len + 1):
                for i in range(len(word) - piece_len + 1):
                    p = word[i : i + piece_len]
                    seed_counts[p] = seed_counts.get(p, 0) + cnt
    else:
        seed, seed_counts = _seed_distributed(
            vocab, seed_factor * vocab_size, max_len
        )
        soft_counts = _soft_counts_distributed(vocab, max_len)
        viterbi_freq = _viterbi_freq_distributed(vocab, max_len)

    scores = _mstep({p: seed_counts.get(p, 0) for p in seed}, seed)
    pieces = list(seed)
    singles = [p for p in pieces if len(p) == 1]
    target_multi = max(vocab_size - len(singles), 0)
    while True:
        for _ in range(em_iters_per_round):
            counts = soft_counts(scores)
            scores = _mstep_soft(counts, pieces)
        multi = [p for p in pieces if len(p) > 1]
        if len(multi) <= target_multi:
            break
        losses = _prune_losses(scores, viterbi_freq(scores), multi, max_len)
        keep_n = max(target_multi, int(len(multi) * shrink_keep))
        if keep_n >= len(multi):  # shrink stalled: jump to target
            keep_n = target_multi
        kept = sorted(multi, key=lambda p: (-losses[p], p))[:keep_n]
        pieces = sorted(singles) + sorted(kept)
        scores = {p: scores[p] for p in pieces}
    return sorted(scores.items())


def _seed_distributed(
    vocab: DataFrame, seed_size: int, max_len: int
) -> tuple[list[str], dict[str, int]]:
    """Distributed seeding (the train_unigram distributed tier's seed
    stage, factored): singles + top multi-char substrings by
    corpus-weighted count, plus the seed counts for the initial M-step."""
    empty = F.array().cast("array<string>")
    subs = vocab.select(
        "cnt",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(2), F.lit(max_len)),
                    lambda piece_len: F.when(
                        F.length("word") >= piece_len,
                        F.transform(
                            F.sequence(
                                F.lit(1), F.length("word") - piece_len + 1
                            ),
                            lambda i: F.substring(
                                F.col("word"), i, piece_len
                            ),
                        ),
                    ).otherwise(empty),
                )
            )
        ).alias("p"),
    ).filter(F.length("p") >= 2)
    sub_counts = subs.groupBy("p").agg(F.sum("cnt").alias("c"))
    singles_df = (
        vocab.select("cnt", F.explode(F.split(F.col("word"), "")).alias("ch"))
        .filter(F.length("ch") > 0)
        .groupBy("ch")
        .agg(F.sum("cnt").alias("c"))
        .collect()
    )
    singles = sorted(r["ch"] for r in singles_df)
    room = max(seed_size - len(singles), 0)
    top_multi = [
        r["p"]
        for r in sub_counts.orderBy(F.desc("c"), F.asc("p")).limit(room).collect()
    ]
    pieces = singles + top_multi
    seed_counts = {r["ch"]: int(r["c"]) for r in singles_df}
    for r in sub_counts.filter(F.col("p").isin(top_multi)).collect():
        seed_counts[r["p"]] = int(r["c"])
    return pieces, seed_counts


def _soft_counts_distributed(vocab: DataFrame, max_len: int):
    """Distributed soft E-step: Arrow-batched per-word expected counts
    (quantized decimals serialized as strings — exact through the Arrow
    boundary), one explode + groupBy(piece) decimal sum per iteration."""

    def run(scores: dict[str, Decimal]) -> dict[str, Decimal]:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        table = dict(scores)

        @pandas_udf("array<struct<p: string, c: string>>")
        def ec(words, cnts):  # type: ignore[no-untyped-def]
            return pd.Series(
                [
                    [
                        {"p": p, "c": str(q)}
                        for p, q in _soft_counts_word(w, int(c), table, max_len)
                    ]
                    for w, c in zip(words, cnts)
                ]
            )

        agg = (
            vocab.select(F.explode(ec("word", "cnt")).alias("e"))
            .select(
                F.col("e.p").alias("p"),
                F.col("e.c").cast(_ACC).alias("c"),
            )
            .groupBy("p")
            .agg(F.sum("c").alias("c"))
            .collect()
        )
        return {r["p"]: Decimal(str(r["c"])) for r in agg}

    return run


def _viterbi_freq_distributed(vocab: DataFrame, max_len: int):
    """Distributed Viterbi frequencies: the codegen encoder over the
    word table (model as a broadcast map literal), explode + int sum.
    Production vocab sizes swap the fold for unigram_encode_udf behind
    the same law (the module's standing tier contract)."""

    def run(scores: dict[str, Decimal]) -> dict[str, int]:
        ordered = sorted(scores.items())
        enc = viterbi_encode_words_expr("array(word)", ordered, max_len)
        seg = vocab.select("cnt", F.explode(enc).alias("p"))
        return {
            r["p"]: int(r["c"])
            for r in seg.groupBy("p").agg(F.sum("cnt").alias("c")).collect()
        }

    return run


# --- 2-best Viterbi (segmentation-margin audit) -------------------------------


def _viterbi2_py(
    word: str, scores: dict[str, Decimal], max_len: int
) -> tuple[Decimal, Decimal | None, list[str]]:
    """Exact-decimal 2-best segmentation DP: (best score, second-best
    PATH score or None, best pieces). The top candidate is chosen by
    the module's 1-best law — (score, longest last piece) — so the
    best pieces are bit-identical to _viterbi_py's; the second score is
    over DISTINCT PATHS (two different segmentations with equal scores
    count as rank 1 and 2), the standard k-best lattice semantics."""
    n = len(word)
    # per position: list of up to 2 (score, last_len, prev_rank)
    table: list[list[tuple[Decimal, int, int]]] = [[(Decimal(0), 0, 0)]]
    for i in range(1, n + 1):
        cands: list[tuple[Decimal, int, int]] = []
        for piece_len in range(1, min(max_len, i) + 1):
            s = scores.get(word[i - piece_len : i])
            if s is None and piece_len == 1:
                s = UNK_LOGP
            if s is None:
                continue
            for rank, (ps, _, _) in enumerate(table[i - piece_len]):
                cands.append((ps + s, piece_len, rank))
        # top by the 1-best comparator (score, then longer piece); the
        # remainder ordered the same way — element 2 is the runner-up
        cands.sort(key=lambda c: (c[0], c[1]), reverse=True)
        table.append(cands[:2])
    best = table[n][0]
    second = table[n][1][0] if len(table[n]) > 1 else None
    pieces: list[str] = []
    pos, rank = n, 0
    while pos > 0:
        _, piece_len, prev_rank = table[pos][rank]
        pieces.insert(0, word[pos - piece_len : pos])
        pos, rank = pos - piece_len, prev_rank
    return best[0], second, pieces


def unigram_margin_udf(scores: list[tuple[str, Decimal]], max_len: int = 4):
    """Arrow-batched segmentation-margin scorer: text -> struct of
    (pieces = the 1-best segmentation, min_margin = the smallest
    best-vs-second-best score gap over the text's words as a 9dp
    decimal string, n_ambiguous = words whose margin is 0, i.e. a
    tie-broken segmentation). Words with a single complete path
    contribute no margin (unambiguous by construction)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    table = dict(scores)

    def one(text: str):
        pieces: list[str] = []
        min_m: Decimal | None = None
        n_amb = 0
        for w in _ASCII_WS.split(text.lower()):
            if not w:
                continue
            b, s2, ps = _viterbi2_py(w, table, max_len)
            pieces.extend(ps)
            if s2 is not None:
                m = b - s2
                if m == 0:
                    n_amb += 1
                if min_m is None or m < min_m:
                    min_m = m
        return {
            "pieces": pieces,
            "min_margin": str(min_m) if min_m is not None else None,
            "n_ambiguous": n_amb,
        }

    empty = {"pieces": None, "min_margin": None, "n_ambiguous": None}

    @pandas_udf(
        "struct<pieces: array<string>, min_margin: string, n_ambiguous: int>"
    )
    def f(texts):  # type: ignore[no-untyped-def]
        # a top-level StructType pandas_udf must return a DataFrame
        return pd.DataFrame(
            [one(t) if isinstance(t, str) else empty for t in texts]
        )

    return f
