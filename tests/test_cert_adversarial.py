"""Planted-violation ("broken-arm") goldens for every in-plan cert law.

The oracle gate structurally CANNOT catch a vacuous cert: when both
engines encode the same wrong law (the r6 coverage bug — avg() silently
skipping NULL rows, pinning coverage at 1.0) every hash stays green.
These tests close that class: each cert family's shared law helper
(operators/certs.py — the same code the registered *_cert queries
execute) is fed a PLANTED violation and must flip FALSE. Weakening any
law (reintroducing a NULL-skipping avg, switching a left join to inner,
inverting a bound, replacing a comparison with a literal) turns at
least one of these red while all 186 oracles stay green.

Pattern source: the 3-way adversarial BPE encoder test
(tests/test_bpe.py) — the one cert family that already had a planted
arm before round 8.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_stream_starter_spark.operators import certs

pytestmark = pytest.mark.usefixtures("spark")


# --- pooled recall (dd_minhash / dd_simhash / ann_ivf / ann_pq /
# --- ann_opq recall certs) ---------------------------------------------------


def test_pooled_recall_flips_on_missed_truth_pairs(spark):
    """Approx arm recovering 1 of 4 truth pairs must certify FALSE at
    every registered bound (0.6, 0.8, 0.9) — and recall must be exactly
    0.25: an avg(hit)-style NULL-skip mutation reports 1.0 here."""
    truth = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "id_a int, id_b int"
    )
    approx = spark.createDataFrame([(1, 2)], "id_a int, id_b int")
    hits = certs.hit_flags(truth, approx, ["id_a", "id_b"])
    recall = certs.pooled_recall(hits).collect()[0]["recall"]
    assert recall == pytest.approx(0.25)
    for bound in (0.6, 0.8, 0.9):
        assert not recall >= bound


def test_pooled_recall_empty_approx_arm_is_zero_not_null(spark):
    """A completely broken (empty) approx arm is recall 0.0, never
    NULL/1.0 — the inner-join mutation would make the hits frame empty
    and the pooled fraction NULL."""
    truth = spark.createDataFrame([(1, 2), (2, 3)], "id_a int, id_b int")
    approx = truth.filter(F.lit(False))
    hits = certs.hit_flags(truth, approx, ["id_a", "id_b"])
    assert hits.count() == 2  # truth rows survive the left join
    recall = certs.pooled_recall(hits).collect()[0]["recall"]
    assert recall == pytest.approx(0.0)


# --- agreement (x_ccnet_buckets / x_dsir_select / x_quality_bins
# --- agree certs) ------------------------------------------------------------


def test_agreement_flips_on_disagreeing_arm(spark):
    exact = spark.createDataFrame(
        [("d1", 1), ("d2", 2), ("d3", 3), ("d4", 1)], "doc_id string, v int"
    )
    approx = spark.createDataFrame(
        [("d1", 1), ("d2", 9), ("d3", 9), ("d4", 9)], "doc_id string, v int"
    )
    agree = certs.agreement(exact, approx, "v").collect()[0]["agree"]
    assert agree == pytest.approx(0.25)
    assert not agree >= 0.9


def test_agreement_counts_missing_docs_as_disagreement(spark):
    """A sparse approx arm that emits ONLY the rows it agrees on must
    not certify: the inner-join mutation reports agree == 1.0 here."""
    exact = spark.createDataFrame(
        [("d1", 1), ("d2", 2), ("d3", 3), ("d4", 4)], "doc_id string, v int"
    )
    approx = spark.createDataFrame([("d1", 1)], "doc_id string, v int")
    agree = certs.agreement(exact, approx, "v").collect()[0]["agree"]
    assert agree == pytest.approx(0.25)
    assert not agree >= 0.98


# --- SemDeDup coverage + drops-justified (dd_semdedup_cert,
# --- dd_semdedup_para_cert) --------------------------------------------------


def _planted_coverage(spark):
    # 4 exact dup pairs over a 6-node graph; the dedup under test
    # dropped only node 2 — covering exactly one pair. Pair (3,4) is
    # co-clustered (cluster 7) and UNcovered: the within-cluster
    # theorem arm must flip too.
    pairs = spark.createDataFrame(
        [(1, 2, 7, 8), (3, 4, 7, 7), (3, 5, 7, 8), (5, 6, 8, 8)],
        "id_a int, id_b int, cl_a int, cl_b int",
    )
    dropped = spark.createDataFrame([(2,), (99,)], "did int")
    return pairs, dropped


def test_dup_pair_coverage_flips_on_undercovered_dedup(spark):
    pairs, dropped = _planted_coverage(spark)
    flagged = certs.drop_witness_flags(pairs, dropped)
    row = certs.dup_pair_coverage(flagged, within_cluster=True).collect()[0]
    # exactly 1 of 4 pairs covered: the r6 NULL-skip mutation says 1.0
    assert row["cov"] == pytest.approx(0.25)
    assert not row["cov"] >= 0.3
    # the co-clustered pair (3,4) is uncovered: the theorem arm flips
    assert row["wc_cov"] == pytest.approx(0.0)
    assert not row["wc_cov"] >= 1.0


def test_unjustified_drops_flips_on_witnessless_drop(spark):
    pairs, dropped = _planted_coverage(spark)
    n = certs.unjustified_drops(pairs, dropped).collect()[0]["n_unjustified"]
    assert n == 1  # did=99 has no dup-pair witness
    assert not n == 0


def test_dup_pair_coverage_all_covered_still_certifies(spark):
    """Sanity arm: the laws must still certify a GOOD dedup (both
    endpoints of every pair dropped-or-partnered) — guards against a
    mutation that hardcodes FALSE."""
    pairs, _ = _planted_coverage(spark)
    dropped = spark.createDataFrame([(2,), (4,), (5,)], "did int")
    flagged = certs.drop_witness_flags(pairs, dropped)
    row = certs.dup_pair_coverage(flagged, within_cluster=True).collect()[0]
    assert row["cov"] == pytest.approx(1.0)
    assert row["wc_cov"] == pytest.approx(1.0)
    n = certs.unjustified_drops(pairs, dropped).collect()[0]["n_unjustified"]
    assert n == 0


# --- span containment (x_exact_substr_stride_cert, x_exact_substr_cds_cert) --


def test_span_containment_flips_on_uncontained_planted_span(spark):
    """Feed the shared cert body a 'sampled' arm claiming a span the
    exact arm never found: contained_in_exact must flip FALSE for that
    doc (the theorem boolean is computed, not stated)."""
    from event_stream_starter_spark.queries.textdata import (
        _substr_sampled_cert_df,
    )

    docs = spark.createDataFrame(
        [
            ("d1", "alpha beta gamma delta epsilon zeta eta theta iota"),
            ("d2", "completely different text with no repeated grams at all"),
        ],
        "doc_id string, text string",
    )
    planted = spark.createDataFrame(
        [("d1", 0, 25)], "doc_id string, span_start bigint, span_len bigint"
    )
    out = {
        r["doc_id"]: r
        for r in _substr_sampled_cert_df(docs, planted, "s_chars").collect()
    }
    assert out["d1"]["exact_dup_chars"] == 0  # no real duplication
    assert out["d1"]["s_chars"] == 25
    assert out["d1"]["contained_in_exact"] is False
    assert out["d2"]["contained_in_exact"] is True  # empty sampled arm OK


# --- learned-gate beats-majority (x_lr_quality_score_cert) -------------------


def test_beats_majority_flips_on_constant_predictor(spark):
    """An untrained gate predicting the majority class everywhere TIES
    majority_n — the strict > law must flip FALSE."""
    scored = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 1), (0, 1), (0, 1)], "y int, pred int"
    )
    row = certs.beats_majority(scored).collect()[0]
    assert row["n_docs"] == 5 and row["n_pos"] == 3 and row["majority_n"] == 3
    assert row["model_beats_majority"] is False


def test_beats_majority_certifies_a_working_model(spark):
    scored = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 1), (0, 0), (0, 1)], "y int, pred int"
    )
    assert certs.beats_majority(scored).collect()[0]["model_beats_majority"]


# --- bucketed-packing waste (x_pack_bucketed_waste_cert) ---------------------


def test_pack_waste_flips_when_bucket_exceeds_greedy_pad(spark):
    """The waste <= greedy law is a theorem only while bucket <=
    max_len; a planted 1024-token bucket must flip it — proving the
    comparison is computed per row, not stated."""
    bucketed = spark.createDataFrame(
        [("web", 1024, 10), ("web", 128, 100)],
        "source string, bucket int, eff_tok int",
    )
    rows = {
        r["bucket"]: r
        for r in certs.pack_waste_rollup(
            bucketed, budget=4096, max_len=512
        ).collect()
    }
    assert rows[1024]["sum_padding"] == 1014
    assert rows[1024]["sum_padding_greedy"] == 502
    assert rows[1024]["waste_le_greedy"] is False
    assert rows[128]["waste_le_greedy"] is True


# --- two-tier agreement (x_bpe_encode_cert) ----------------------------------


def test_tier_agreement_counts_one_diverging_row(spark):
    df = spark.createDataFrame(
        [("a b", "a b"), ("c d", "c d"), ("e f", "e DIVERGED")],
        "e string, u string",
    )
    row = certs.tier_agreement(df, "e", "u").collect()[0]
    assert row["n_docs"] == 3
    assert row["n_agree"] == 2  # the law n_agree == n_docs is violated
    assert row["n_agree"] != row["n_docs"]


def test_tier_agreement_null_vs_value_is_disagreement(spark):
    df = spark.createDataFrame([("x", None)], "e string, u string")
    row = certs.tier_agreement(df, "e", "u").collect()[0]
    assert row["n_agree"] == 0


# --- quantizer drift (ann_quantizer_drift_cert) ------------------------------


def test_drift_cert_flips_on_shattered_assignments(spark):
    """Frozen model putting everything in one cluster vs fresh model
    shattering every point: Rand index 0 → stability FALSE. Frozen
    quantization error 5x the fresh one → error inflation FALSE."""
    ids = list(range(8))
    af = spark.createDataFrame([(i, 0) for i in ids], "cid int, cf int")
    ag = spark.createDataFrame([(i, i) for i in ids], "cid int, cg int")
    err = spark.createDataFrame([(0.5, 0.1)], "ef double, eg double")
    row = certs.drift_cert(af, ag, err).collect()[0]
    assert row["n_vecs"] == 8
    assert row["assignment_stability_ok"] is False
    assert row["quant_error_ok"] is False


def test_drift_cert_certifies_identical_assignments(spark):
    ids = list(range(8))
    a = [(i, i % 2) for i in ids]
    af = spark.createDataFrame(a, "cid int, cf int")
    ag = spark.createDataFrame(a, "cid int, cg int")
    err = spark.createDataFrame([(0.1, 0.1)], "ef double, eg double")
    row = certs.drift_cert(af, ag, err).collect()[0]
    assert row["assignment_stability_ok"] is True
    assert row["quant_error_ok"] is True


# --- within_frac (a5_approx_distinct / a5_hll_mergeable_rollup sketch
# --- bound) --------------------------------------------------------------------


def test_within_frac_flips_on_sketch_past_bound(spark):
    """The sketch-error bound law must be the INCLUSIVE absolute 5%
    form: estimate just past the bound flips FALSE (in BOTH
    directions — dropping abs() passes underestimates), exactly at the
    bound stays TRUE, and a nonzero estimate against exact=0 flips
    FALSE (frac * 0 == 0)."""
    rows = [
        # (est, exact, want)
        (106.0, 100, False),  # 6% over: past the bound
        (94.0, 100, False),   # 6% under: abs() is load-bearing
        (105.0, 100, True),   # exactly 5%: inclusive
        (95.0, 100, True),    # exactly -5%: inclusive + abs
        (100.0, 100, True),
        (1.0, 0, False),      # exact 0: any estimate > 0 is out
        (0.0, 0, True),
    ]
    df = spark.createDataFrame(
        [(e, x) for e, x, _ in rows], "est double, exact long"
    )
    got = [
        r["ok"]
        for r in df.select(
            certs.within_frac(F.col("est"), F.col("exact")).alias("ok")
        ).collect()
    ]
    assert got == [w for _, _, w in rows]


# --- D6 cooldown fold (recursive-CTE-oracled ordered emit law) ----------------


def _cooldown_sim(ts_list, cooldown_s):
    """Independent pure-Python cooldown law: sort, emit t iff first or
    t >= last_emit + cooldown (inclusive)."""
    out, last = [], None
    for t in sorted(ts_list):
        if last is None or t >= last + cooldown_s * 1_000_000:
            out.append(t)
            last = t
    return out


def test_cooldown_fold_sorts_and_is_inclusive_at_boundary(spark, tmp_path):
    """The production d6_cooldown_emit on PLANTED events: arrival order
    scrambled (an unsorted fold emits a different set) and one gap of
    EXACTLY the cooldown (a strict-> mutation drops it). The fold must
    match the independent sim; both planted mutations must not."""
    from event_stream_starter_spark.queries import all_queries
    from event_stream_starter_spark.queries.ops import COOLDOWN_SEC

    c_us = COOLDOWN_SEC * 1_000_000
    # seconds offsets -> micros; SCRAMBLED arrival order
    offs_s = [1800, 7200, 0, 3601, 3600]
    base_us = 1_700_000_000_000_000
    ts_us = [base_us + s * 1_000_000 for s in offs_s]
    rows = [
        (i + 1, t, 7, "purchase", 1.0, "{}") for i, t in enumerate(ts_us)
    ] + [
        # decoy: wrong event_type inside a cooldown window — the filter
        # must keep it out of the fold
        (99, base_us + 100, 7, "view", 1.0, "{}"),
        # second key: single event, emits unconditionally
        (100, base_us, 8, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string, value double, props string"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    sf = tmp_path / "d6sf"
    df.coalesce(1).write.mode("overwrite").parquet(str(sf / "events.parquet"))

    got = {
        (r["user_id"], r["emit_ts_us"])
        for r in all_queries()["d6_cooldown_emit"].fn(spark, str(sf)).collect()
    }
    want = {(7, t) for t in _cooldown_sim(ts_us, COOLDOWN_SEC)} | {
        (8, base_us)
    }
    assert got == want
    # the exactly-at-cooldown emit is present (inclusive law)
    assert (7, base_us + 3600 * 1_000_000) in got

    # Planted mutation 1: ARRIVAL-ORDER fold (no sort) diverges.
    unsorted_emit = []
    last = None
    for t in ts_us:
        if last is None or t >= last + c_us:
            unsorted_emit.append(t)
            last = t
    assert {(7, t) for t in unsorted_emit} != {p for p in want if p[0] == 7}

    # Planted mutation 2: STRICT > at the boundary diverges.
    strict_emit = []
    last = None
    for t in sorted(ts_us):
        if last is None or t > last + c_us:
            strict_emit.append(t)
            last = t
    assert {(7, t) for t in strict_emit} != {p for p in want if p[0] == 7}
