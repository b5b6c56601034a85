"""Distributed hashing-trick logistic regression — the learned quality
classifier of a training-data pipeline (the GPT-3 / CCNet recipe: score
every document with a cheap linear model and keep the high-scoring
tail; Brown et al. 2020 Appendix A, Wenzek et al. 2019 §4.4 train a
fastText-style linear classifier for exactly this gate; Joulin et al.
2016 is the model family).

The reference engine consumes model scores through its degrade-ladder
seam (reference api/hf_sentiment.py:75-148 — an external model scores,
the pipeline gates); at 100TB the engine must also be able to TRAIN the
gate on the corpus it curates. Scale decomposition:

1. ONE corpus pass builds the binary feature table: tokens hashed to
   4096 buckets by md5-hex-prefix (the hashing trick — Weinberger et
   al. 2009), one row per distinct (doc, feature). Map-side explode +
   one distinct shuffle; the table is then repartitioned by doc and
   localCheckpointed — every GD iteration runs on IT, never the corpus.
2. Each full-batch gradient-descent iteration is three small jobs:
   margin (feature table ⋈ broadcast 4096-row weight table, groupBy
   doc — the doc-hash partitioning from step 1 satisfies the
   clustering, no extra exchange), residual join-back (co-partitioned
   on doc), and the per-feature gradient sum (one shuffle of ≤4096
   keys per partition, partial-agg'd). The gradient collect is
   MODEL-sized (≤4097 rows), never data-sized — the same driver-loop
   contract as BPE training (operators/bpe.py) and IVF (similarity.py).
3. All training arithmetic is EXACT DECIMAL: binary features, decimal
   weights, and a hard-sigmoid activation p = clamp(m/4 + 1/2, 0, 1)
   (Courbariaux et al. 2015's piecewise-linear sigmoid) instead of
   exp — so every margin, residual, and gradient is an exact,
   order-independent decimal sum. Training is bit-reproducible across
   partitionings AND engines: tests/test_lr.py re-trains in pure
   Python (hashlib + Decimal) and asserts weight-for-weight equality.
   A deployment wanting true log-loss swaps the activation at the
   sigmoid seam; the distributed shape is identical.

Labels come from the engine's own deterministic quality heuristic
(operators/textan.quality_score >= 0.5) — the classifier DISTILLS the
multi-pass heuristic gate into one broadcast-join scoring pass, which
is the CCNet production trick (train on a trusted gate, score cheaply
everywhere).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import textan

#: hex-prefix length -> 16**3 = 4096 feature buckets
FEATURE_HEX_CHARS = 3
BIAS_KEY = "__bias__"
_W_SCALE = Decimal("0.000000001")  # weights quantized to 9 dp


def feature_key(token) -> "F.Column":
    """Hashing-trick feature id: first 3 hex chars of md5(token).

    A STRING key, not an int — md5 hex agrees byte-for-byte across
    Spark, DuckDB, and hashlib, so no engine-specific hex->int
    conversion can diverge (the x_split_assign md5-bucket pattern,
    queries/textdata.py)."""
    return F.substring(F.md5(token), 1, FEATURE_HEX_CHARS)


def doc_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Binary bag-of-hashed-words: one row per distinct (doc, feature).

    Map-side tokenize+hash, one distinct shuffle. Binary presence (not
    tf) keeps every downstream sum an exact integer/decimal — and is
    the standard fastText-style bag encoding for short documents."""
    toks = F.explode(textan.tokens(F.col(text_col))).alias("tok")
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks)
        .filter(F.length("tok") > 0)
        .select("doc_id", feature_key(F.col("tok")).alias("feature"))
        .distinct()
    )


def doc_labels(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """y = 1 iff the deterministic quality heuristic >= 0.5 (the
    distillation target). NULL text labels 0 (no evidence = low)."""
    q = textan.quality_score(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(q >= 0.5, F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )


def _margins(feats: DataFrame, labels: DataFrame, wdf: DataFrame, bias: Decimal) -> DataFrame:
    """(doc_id, y, r): hard-sigmoid residuals, exact decimal.

    feats and labels are hash-partitioned by doc_id upstream, so both
    the groupBy and the left join reuse that exchange; the weight table
    is model-sized and broadcast. Docs with zero features (empty text)
    keep margin = bias via the left join + coalesce."""
    msum = (
        feats.join(F.broadcast(wdf), "feature")
        .groupBy("doc_id")
        .agg(F.sum("w").alias("msum"))
    )
    m = F.coalesce(F.col("msum"), F.lit(0).cast("decimal(28,9)")) + F.lit(bias)
    # hard sigmoid: p = clamp(0.25*m + 0.5, 0, 1) — piecewise-linear,
    # exact in decimal (no exp), gradient rule r = p - y unchanged.
    p = F.greatest(
        F.least(
            m * F.lit(Decimal("0.25")) + F.lit(Decimal("0.5")),
            F.lit(Decimal("1")).cast("decimal(38,11)"),
        ),
        F.lit(Decimal("0")).cast("decimal(38,11)"),
    )
    # Keep the subtraction inside 38 digits: p in [0,1] fits (26,11), y
    # in {0,1} fits (12,11), so p - y types as exact decimal(27,11).
    # Subtracting an untyped int instead would require precision 39 and
    # trip Spark's precision-loss rule, which silently TRUNCATES the
    # result to scale 10 — a 5e-11 rounding the pure-Python twin never
    # performs (caught by the weight-parity golden).
    r = p.cast("decimal(26,11)") - F.col("y").cast("decimal(12,11)")
    return labels.join(msum, "doc_id", "left").select("doc_id", "y", r.alias("r"))


def train_logreg(
    docs: DataFrame,
    iters: int = 16,
    lr: str = "1",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[dict[str, Decimal], Decimal]:
    """Full-batch GD; returns ({feature -> weight}, bias), all Decimal.

    Deterministic by construction: exact-decimal sums are
    order-independent (unlike float), the weight update runs in driver
    Python Decimal arithmetic quantized to 9 dp, and features/labels
    are pure functions of the text — so the learned model is identical
    under any partitioning, and tests/test_lr.py reproduces it
    weight-for-weight in pure Python."""
    feats = doc_features(docs, id_col, text_col).repartition("doc_id").localCheckpoint(eager=True)
    labels = doc_labels(docs, id_col, text_col).repartition("doc_id").localCheckpoint(eager=True)
    n_docs = labels.count()
    if n_docs == 0:
        return {}, Decimal(0)

    keys = [r["feature"] for r in feats.select("feature").distinct().collect()]
    keys.sort()
    w: dict[str, Decimal] = {k: Decimal(0) for k in keys}
    bias = Decimal(0)
    rate = Decimal(lr)
    spark = docs.sparkSession

    for _ in range(iters):
        wdf = spark.createDataFrame(
            [(k, w[k]) for k in keys], "feature string, w decimal(14,9)"
        )
        resid = _margins(feats, labels, wdf, bias)
        grad_rows = (
            feats.join(resid, "doc_id")
            .groupBy("feature")
            .agg(F.sum("r").alias("g"))
            .collect()
        )
        gsum = {r["feature"]: Decimal(r["g"]) for r in grad_rows}
        bias_g = Decimal(resid.agg(F.sum("r").alias("g")).collect()[0]["g"])
        n = Decimal(n_docs)
        for k in keys:
            w[k] = (w[k] - rate * gsum.get(k, Decimal(0)) / n).quantize(
                _W_SCALE, ROUND_HALF_UP
            )
        bias = (bias - rate * bias_g / n).quantize(_W_SCALE, ROUND_HALF_UP)
    return w, bias


def score_expr(feats: DataFrame, labels: DataFrame, w: dict[str, Decimal], bias: Decimal) -> DataFrame:
    """Score every doc with a trained model: (doc_id, y, p, pred).

    ONE broadcast join + one groupBy — the cheap gate the heuristic
    was distilled into. p is the exact-decimal hard sigmoid."""
    spark = feats.sparkSession
    wdf = spark.createDataFrame(
        sorted((k, v) for k, v in w.items()), "feature string, w decimal(14,9)"
    )
    msum = (
        feats.join(F.broadcast(wdf), "feature")
        .groupBy("doc_id")
        .agg(F.sum("w").alias("msum"))
    )
    m = F.coalesce(F.col("msum"), F.lit(0).cast("decimal(28,9)")) + F.lit(bias)
    p = F.greatest(
        F.least(
            m * F.lit(Decimal("0.25")) + F.lit(Decimal("0.5")),
            F.lit(Decimal("1")).cast("decimal(38,11)"),
        ),
        F.lit(Decimal("0")).cast("decimal(38,11)"),
    )
    return labels.join(msum, "doc_id", "left").select(
        "doc_id",
        "y",
        p.alias("p"),
        F.when(p >= F.lit(Decimal("0.5")), F.lit(1)).otherwise(F.lit(0)).alias("pred"),
    )
