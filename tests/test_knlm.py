"""Golden + plan tests for the Kneser-Ney trigram LM family (VERDICT r6
task 3). Value parity vs DuckDB is covered by test_oracle_parity's
auto-parametrization (x_kn_trigram_lm / x_kn_lm_buckets /
x_kn_ccnet_agree all carry full oracles); these tests certify the
approx twin's substitution contract and the scale shape of the plans.
"""

from __future__ import annotations

from event_stream_starter_spark.queries import all_queries


def _run(name, spark, sf_dir):
    return all_queries()[name].fn(spark, sf_dir).collect()


def test_kn_approx_matches_exact_up_to_boundary(spark, sf_dir):
    """Same contract as the ccnet approx twin: shared scoring (kn_nll
    bit-identical), bucket moves only to the ADJACENT tercile (threshold
    tie semantics + sketch rank error), and buckets stay nll-ordered
    within each language."""
    exact = {r["doc_id"]: r for r in _run("x_kn_lm_buckets", spark, sf_dir)}
    approx = {
        r["doc_id"]: r for r in _run("x_kn_lm_buckets_approx", spark, sf_dir)
    }
    assert exact.keys() == approx.keys()
    order = {"head": 0, "middle": 1, "tail": 2}
    moved = 0
    for k, e in exact.items():
        a = approx[k]
        assert a["kn_nll"] == e["kn_nll"], (k, a["kn_nll"], e["kn_nll"])
        assert a["n_grams"] == e["n_grams"]
        if a["ppl_bucket"] != e["ppl_bucket"]:
            assert abs(order[a["ppl_bucket"]] - order[e["ppl_bucket"]]) == 1, k
            moved += 1
    assert moved <= max(3, 0.02 * len(exact)), moved
    by_lang: dict[str, dict[str, list[float]]] = {}
    for a in approx.values():
        by_lang.setdefault(a["lang"], {}).setdefault(a["ppl_bucket"], []).append(
            a["kn_nll"]
        )
    for lang, buckets in by_lang.items():
        if "head" in buckets and "middle" in buckets:
            assert max(buckets["head"]) <= min(buckets["middle"]), lang
        if "middle" in buckets and "tail" in buckets:
            assert max(buckets["middle"]) <= min(buckets["tail"]), lang


def test_kn_scores_are_valid_nll(spark, sf_dir):
    """Interpolated KN with the add-one unigram floor is a proper
    sub-distribution pointwise: every per-gram p is in (0, 1], so every
    per-doc mean nll is >= 0 and finite; sampled langs must produce a
    nonzero score for nearly every doc (p=1 only for unsampled langs)."""
    import math

    rows = _run("x_kn_trigram_lm", spark, sf_dir)
    assert rows
    for r in rows:
        assert r["kn_nll"] >= 0.0, r
        assert math.isfinite(r["kn_nll"]), r
    nonzero = sum(1 for r in rows if r["kn_nll"] > 0)
    assert nonzero >= 0.95 * len(rows)


def test_kn_agreement_is_informative(spark, sf_dir):
    """The KN-vs-proxy agreement must beat chance (1/3 for terciles) in
    every language — the two models score differently but rank
    correlated — and never reach 1.0 exactly everywhere (identical
    buckets would mean the KN path silently collapsed onto the proxy)."""
    rows = _run("x_kn_ccnet_agree", spark, sf_dir)
    assert rows
    for r in rows:
        assert r["agree_frac"] > 1.0 / 3.0, r
        assert r["n_agree"] <= r["n_docs"]
    assert any(r["agree_frac"] < 1.0 for r in rows)


def test_kn_plans_have_scale_shape(spark, sf_dir):
    """x_kn_trigram_lm: model tables reach the corpus gram stream as
    broadcast joins (no corpus-side shuffle for scoring), no cartesian.
    x_kn_lm_buckets_approx: NO window/ntile at all (mergeable sketch
    thresholds + map-only assignment), the x_ccnet_lm_buckets_approx
    contract."""
    plan = (
        all_queries()["x_kn_trigram_lm"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    approx_plan = (
        all_queries()["x_kn_lm_buckets_approx"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in approx_plan
    assert "ntile(" not in approx_plan


def test_fused_twin_scorer_matches_standalones(spark, sf_dir):
    """_kn_cc_scored (one gram explode, one rollup) must be bit-equal
    to the standalone _kn_scored / _ccnet_scored frames it replaces in
    the DoReMi family and x_kn_ccnet_agree — same (doc_id, lang) set,
    same n_grams, same decimal score sums."""
    from event_stream_starter_spark.io import load_table
    from event_stream_starter_spark.queries.knlm import (
        _kn_cc_scored,
        _kn_scored,
    )
    from event_stream_starter_spark.queries.textdata import _ccnet_scored

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    kn = {
        (r["doc_id"], r["lang"]): (r["n_grams"], r["s"])
        for r in _kn_scored(docs).collect()
    }
    cc = {
        (r["doc_id"], r["lang"]): (r["n_grams"], r["s"])
        for r in _ccnet_scored(docs).collect()
    }
    fused = _kn_cc_scored(docs).collect()
    assert {(r["doc_id"], r["lang"]) for r in fused} == set(kn) == set(cc)
    for r in fused:
        k = (r["doc_id"], r["lang"])
        assert kn[k] == (r["n_grams"], r["kn_s"]), k
        assert cc[k] == (r["n_grams"], r["cc_s"]), k
