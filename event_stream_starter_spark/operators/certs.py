"""Shared in-plan certification laws (the a5 pattern).

Every registered *_cert query routes its load-bearing boolean through
one of these helpers, and tests/test_cert_adversarial.py feeds the SAME
helper a PLANTED VIOLATION (an under-covered dedup output, a shortlist
with recall below the bound, a padding table exceeding pad-to-max) and
asserts the certification flips FALSE.

Why this module exists: the round-6 coverage-cert bug (avg() silently
skipping the NULL rows of uncovered pairs, pinning coverage at 1.0)
stayed hash-green because BOTH engines encoded the same wrong law — the
one failure class the DuckDB oracle gate structurally cannot catch. A
cert law that lives in one place and is exercised by a planted-violation
golden cannot go vacuous silently: weakening the law (reintroducing a
NULL-skipping avg, inverting a bound, dropping the missed-row penalty)
turns the planted test red even though every oracle stays green.

Laws:
- hit_flags / pooled_recall: truth-vs-approx pooled recall where a
  truth row MISSING from the approx arm counts AGAINST recall.
- agreement: exact-vs-approx per-row value agreement where a row
  MISSING from the approx arm counts as disagreement.
- dup_pair_coverage / drop_witness_flags / unjustified_drops: the
  SemDeDup coverage + drops-justified laws.
- beats_majority: the learned-gate strictly-beats-majority law.
- pack_waste_rollup: the bucketed-packing waste <= greedy law.
- tier_agreement: two-implementation-tier row agreement counts.
- drift_cert: frozen-vs-fresh quantizer Rand index + error inflation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hit_flags(
    truth: DataFrame, approx: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Truth rows LEFT-joined with a hit=1 marker for every key tuple
    present in the approx arm. Unmatched truth rows carry NULL hit so
    pooled_recall can count them AGAINST recall (never skip them).

    The output is materialized (localCheckpoint): every registered
    recall cert consumes it TWICE — pooled_recall plus the per-row /
    per-query emit — and without a barrier each consumption re-executes
    BOTH the truth arm and the approx arm (dd_edit_lsh_recall_cert
    carried 86 Exchange nodes; probe 3.97s -> 2.0s after). The frame is
    truth-pair-sized (bounded for every caller), computed from the
    inputs on every invocation — no cross-run state."""
    marker = approx.select(*keys).withColumn("hit", F.lit(1))
    return truth.join(marker, list(keys), "left").localCheckpoint(eager=True)


def pooled_recall(hits: DataFrame) -> DataFrame:
    """1-row (recall DOUBLE) frame over a hit_flags output: the fraction
    of truth rows the approximate arm recovered.

    Deliberately sum(coalesce(hit,0))/count(*), NOT avg(hit): avg would
    NULL-skip exactly the missed rows and certify any non-empty overlap
    at recall 1.0 — the r6 vacuity class this module guards against."""
    return hits.agg(
        (F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count(F.lit(1))).alias(
            "recall"
        )
    )


def agreement(
    exact: DataFrame, approx: DataFrame, col: str, key: str = "doc_id"
) -> DataFrame:
    """1-row (agree DOUBLE) frame: fraction of EXACT-arm rows whose
    approx-arm `col` value matches, joined on `key`.

    LEFT join + null-safe compare: a row missing from the approx arm
    counts as DISAGREEMENT. An inner join here would let a broken
    approx arm that emits only the rows it happens to agree on certify
    vacuously — the planted sparse-arm golden pins this."""
    e = exact.select(key, F.col(col).alias("_e"))
    a = approx.select(key, F.col(col).alias("_a"))
    return e.join(a, key, "left").agg(
        F.avg(F.col("_e").eqNullSafe(F.col("_a")).cast("double")).alias("agree")
    )


def drop_witness_flags(pairs: DataFrame, dropped: DataFrame) -> DataFrame:
    """Exact dup-pair rows (id_a, id_b, ...) flagged with da/db = 1 when
    the corresponding endpoint was dropped by the dedup under test.
    `dropped` is a 1-column (did) frame. Callers needing cluster
    columns (cl_a/cl_b for the within-cluster arm) join them on after."""
    return pairs.join(
        dropped.withColumnRenamed("did", "id_a").withColumn("da", F.lit(1)),
        "id_a",
        "left",
    ).join(
        dropped.withColumnRenamed("did", "id_b").withColumn("db", F.lit(1)),
        "id_b",
        "left",
    )


def _covered_col() -> Column:
    # Uncovered pairs join NULL on both witness sides — coalesce to 0.0
    # so they COUNT AGAINST coverage instead of being skipped by avg
    # (else cov == 1.0 whenever any single pair is covered: the r6 bug).
    return F.coalesce(
        ((F.col("da") == 1) | (F.col("db") == 1)).cast("double"), F.lit(0.0)
    )


def dup_pair_coverage(flagged: DataFrame, within_cluster: bool = False) -> DataFrame:
    """1-row coverage frame over drop_witness_flags output: `cov` =
    pooled fraction of exact dup pairs with >= 1 member dropped. With
    within_cluster=True also emits `wc_cov` restricted to co-clustered
    pairs (cl_a == cl_b; vacuously 1.0 when no pair is co-clustered —
    the theorem arm)."""
    aggs = [F.avg(_covered_col()).alias("cov")]
    if within_cluster:
        aggs.append(
            F.coalesce(
                F.avg(F.when(F.col("cl_a") == F.col("cl_b"), _covered_col())),
                F.lit(1.0),
            ).alias("wc_cov")
        )
    return flagged.agg(*aggs)


def unjustified_drops(pairs: DataFrame, dropped: DataFrame) -> DataFrame:
    """1-row (n_unjustified BIGINT) frame: dropped ids with NO exact
    dup-pair witness on either endpoint. The drops_justified law is
    n_unjustified == 0."""
    members = (
        pairs.select(F.col("id_a").alias("did"))
        .union(pairs.select(F.col("id_b").alias("did")))
        .distinct()
    )
    return dropped.join(members, "did", "left_anti").agg(
        F.count(F.lit(1)).alias("n_unjustified")
    )


def beats_majority(scored: DataFrame) -> DataFrame:
    """1-row learned-gate certification over a (y, pred) frame:
    (n_docs, n_pos, majority_n, model_beats_majority). The model must
    STRICTLY beat the majority-class baseline on its distillation
    labels — a constant predictor ties majority and flips FALSE."""
    n = F.count(F.lit(1))
    n_pos = F.sum("y").cast("bigint")
    n_correct = F.sum(F.when(F.col("pred") == F.col("y"), 1).otherwise(0))
    majority = F.greatest(n_pos, (n - n_pos).cast("bigint"))
    return scored.agg(
        n.alias("n_docs"),
        n_pos.alias("n_pos"),
        majority.alias("majority_n"),
        (n_correct > majority).alias("model_beats_majority"),
    )


def pack_waste_rollup(
    bucketed: DataFrame, budget: int, max_len: int = 512
) -> DataFrame:
    """Per-(source, bucket) padding rollup + the waste_le_greedy law:
    sum_padding(bucketed) <= sum_padding(pad-to-max_len greedy). A
    theorem while every bucket <= max_len — the planted golden feeds a
    bucket ABOVE max_len and asserts the boolean actually flips (i.e.
    the comparison is computed, not a literal)."""
    g = bucketed.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("eff_tok").alias("sum_tokens"),
        F.sum(F.col("bucket") - F.col("eff_tok")).alias("sum_padding"),
        F.sum(F.lit(max_len) - F.col("eff_tok")).alias("sum_padding_greedy"),
    )
    return g.select(
        "source",
        "bucket",
        "n_docs",
        F.expr(
            f"(n_docs + ({budget} div bucket) - 1) div ({budget} div bucket)"
        )
        .cast("bigint")
        .alias("n_batches"),
        F.col("sum_tokens").cast("bigint").alias("sum_tokens"),
        F.col("sum_padding").cast("bigint").alias("sum_padding"),
        F.col("sum_padding_greedy").cast("bigint").alias("sum_padding_greedy"),
        F.round(
            F.col("sum_padding").cast("double")
            / (F.col("n_docs") * F.col("bucket")),
            6,
        ).alias("waste_frac"),
        (F.col("sum_padding") <= F.col("sum_padding_greedy")).alias(
            "waste_le_greedy"
        ),
    )


def within_frac(est: Column, exact: Column, frac: float = 0.05) -> Column:
    """The sketch-error bound law shared by the approx-distinct certs
    (a5_approx_distinct, a5_hll_mergeable_rollup): |est - exact| <=
    frac * exact, INCLUSIVE at the bound. The oracle states TRUE as
    fact, so an estimate past the bound fails the value hash; the
    planted-violation golden (tests/test_cert_adversarial.py) pins the
    inclusive absolute form — dropping abs(), inverting the comparison,
    or widening frac flips it."""
    return F.abs(est - exact) <= frac * exact


def tier_agreement(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """1-row (n_docs, n_agree) frame: null-safe equality count between
    two implementation tiers of the same function. The certification
    law is n_agree == n_docs, stated as fact by the oracle — one
    diverging row fails the value hash."""
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col(col_a).eqNullSafe(F.col(col_b)), 1).otherwise(0)
        ).alias("n_agree"),
    )


def drift_cert(
    af: DataFrame,
    ag: DataFrame,
    err: DataFrame,
    rand_bound: float = 0.8,
    err_inflation: float = 1.10,
) -> DataFrame:
    """Frozen-vs-fresh quantizer drift certification from two (cid,
    cf)/(cid, cg) assignment frames and a 1-row (ef, eg) mean-error
    frame: 1-row (n_vecs, assignment_stability_ok, quant_error_ok).

    - assignment_stability_ok: pairwise co-assignment agreement (Rand
      index, label-alignment-free via the contingency table) >= bound.
    - quant_error_ok: frozen mean quantization error <= inflation x
      fresh — the documented re-index trigger."""
    cells = af.join(ag, "cid").groupBy("cf", "cg").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cells.agg(
        F.sum(F.col("c") * F.col("c")).cast("double").alias("scc"),
        F.sum("c").cast("double").alias("n"),
    )
    rows_sq = (
        cells.groupBy("cf")
        .agg(F.sum("c").alias("rc"))
        .agg(F.sum(F.col("rc") * F.col("rc")).cast("double").alias("srow"))
    )
    cols_sq = (
        cells.groupBy("cg")
        .agg(F.sum("c").alias("cc"))
        .agg(F.sum(F.col("cc") * F.col("cc")).cast("double").alias("scol"))
    )
    rand = (
        F.lit(1.0)
        - ((F.col("srow") + F.col("scol")) / 2.0 - F.col("scc"))
        / (F.col("n") * (F.col("n") - 1.0) / 2.0)
    )
    return (
        tot.crossJoin(F.broadcast(rows_sq))
        .crossJoin(F.broadcast(cols_sq))
        .crossJoin(F.broadcast(err))
        .select(
            F.col("n").cast("bigint").alias("n_vecs"),
            (rand >= rand_bound).alias("assignment_stability_ok"),
            (F.col("ef") <= err_inflation * F.col("eg")).alias("quant_error_ok"),
        )
    )
