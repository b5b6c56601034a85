"""Degrade-ladder laws for the pluggable inference seam
(functions/inference.py), mirroring the reference's refine/sentiment
fallback behavior: api/refiner.py:33-261, api/hf_sentiment.py:75-148.

The bit-parity of the rules default vs the column-expression path is
certified by the u4_refine_seam / u1_sentiment_seam oracle queries in
test_oracle_parity.py; these tests pin the ladder itself — exception /
schema / budget degrades, TTL memoization, in-batch dedup — and the
executor round-trip of a runtime-registered model backend.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_stream_starter_spark.functions import inference as I


@pytest.fixture(autouse=True)
def _fresh_memo():
    I.clear_memo()
    yield
    I.clear_memo()


def _valid_refine(summary="a valid summary"):
    return {
        "type": "listing",
        "summary": summary,
        "impacted_assets": ["$AB"],
        "reasons": ["matched:listing"],
        "confidence": 0.9,
    }


# ---------------------------------------------------------------------------
# validate_refine: the api/schemas/refine_schema.py contract
# ---------------------------------------------------------------------------


def test_validate_accepts_clean():
    out = I.validate_refine(_valid_refine())
    assert out["confidence"] == 0.9


@pytest.mark.parametrize(
    "patch",
    [
        {"type": ""},  # type too short
        {"type": "x" * 41},  # type too long
        {"summary": "abc"},  # summary < 4
        {"summary": "x" * 81},  # summary > 80
        {"impacted_assets": ["$A"] * 6},  # > 5 assets
        {"reasons": []},  # 0 reasons
        {"reasons": ["r" * 4] * 5},  # 5 reasons
        {"reasons": ["abc"]},  # reason < 4 chars
        {"reasons": ["x" * 141]},  # reason > 140 chars
        {"confidence": 1.5},  # out of range
        {"confidence": "not-a-float"},
    ],
)
def test_validate_rejects(patch):
    bad = {**_valid_refine(), **patch}
    with pytest.raises(I.SchemaViolation):
        I.validate_refine(bad)


# ---------------------------------------------------------------------------
# The degrade ladder (pure-Python batch level)
# ---------------------------------------------------------------------------


def _run(texts, backend_fn, name="model", **kw):
    return I.infer_batch(
        "refine",
        texts,
        name,
        fallback=I.rules_refine_one,
        validate=I.validate_refine,
        backend_fn=backend_fn,
        **kw,
    )


def test_backend_exception_degrades_whole_batch():
    def boom(texts):
        raise RuntimeError("backend down")

    rows = _run(["pump it $AB now", "quiet text here"], boom)
    assert [r[2] for r in rows] == ["exception", "exception"]
    assert [r[1] for r in rows] == ["rules", "rules"]
    # Fallback rows equal the rules result exactly.
    assert rows[0][0] == I.rules_refine_one("pump it $AB now")
    assert rows[0][0]["confidence"] == I.FALLBACK_CONFIDENCE


def test_schema_violation_degrades_only_bad_row():
    def half_bad(texts):
        return [
            _valid_refine() if "ok" in t else {**_valid_refine(), "summary": "no"}
            for t in texts
        ]

    rows = _run(["ok text one", "bad text two"], half_bad)
    assert rows[0][2] is None and rows[0][1] == "model"
    assert rows[1][2] == "schema" and rows[1][1] == "rules"


def test_wrong_result_count_degrades_batch():
    rows = _run(["one text", "two text"], lambda ts: [_valid_refine()])
    assert [r[2] for r in rows] == ["schema", "schema"]


def test_budget_exhausted_takes_rules_path():
    calls = {"n": 0}

    def never_called(texts):
        calls["n"] += 1
        return [_valid_refine() for _ in texts]

    t = iter([0.0, 10.0, 10.0, 10.0, 10.0])  # budget blown before dispatch
    rows = _run(
        ["some text here"], never_called, budget_ms=100, clock=lambda: next(t)
    )
    assert rows[0][2] == "over_budget" and rows[0][1] == "rules"
    assert calls["n"] == 0


def test_slow_backend_response_discarded_over_budget():
    """A backend that RESPONDS but past the budget is discarded — the
    reference's over-budget law (api/refiner.py:208-215 returns rules
    even though an LLM response exists). Wall-clock driven: no injected
    clock, the real monotonic clock must cross the budget."""
    import time as _time

    def slow(texts):
        _time.sleep(0.05)
        return [_valid_refine() for _ in texts]

    rows = _run(["slow backend text"], slow, budget_ms=10)
    assert rows[0][2] == "over_budget" and rows[0][1] == "rules"
    assert rows[0][0]["confidence"] == I.FALLBACK_CONFIDENCE
    # Over-budget results are not memoized: a faster retry succeeds.
    rows = _run(["slow backend text"], lambda ts: [_valid_refine() for _ in ts],
                budget_ms=1000)
    assert rows[0][2] is None


def test_memo_is_keyed_by_backend_name():
    """A rules result cached for one call must not be served to a call
    requesting a DIFFERENT backend on the same text within the TTL."""
    texts = ["same text, two backends"]
    rules_rows = I.infer_batch(
        "refine", texts, "rules",
        fallback=I.rules_refine_one, validate=I.validate_refine,
    )
    assert rules_rows[0][1] == "rules"
    model_rows = _run(texts, lambda ts: [_valid_refine() for _ in ts], name="m1")
    assert model_rows[0][1] == "m1" and model_rows[0][2] is None
    assert model_rows[0][0]["confidence"] == 0.9  # the model's, not 0.35


def test_whitespace_parity_with_column_path(spark):
    """Java \\s is ASCII-only and F.trim strips spaces only; the Python
    twins must agree on tabs, newlines, and NBSP (which does NOT split
    tokens in either engine)."""
    from pyspark.sql import functions as F

    from event_stream_starter_spark.functions.scoring import (
        lexicon_sentiment_label,
        lexicon_sentiment_score,
    )

    texts = [
        "pump pump it",      # NBSP joins tokens in BOTH paths
        "\tgood bad bad",          # tab not trimmed, Java-\s split
        "good\nbad",               # newline splits in both
        "  good  bad  ",           # space runs + trim
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    col_rows = {
        r["doc_id"]: (r["l"], r["s"])
        for r in df.select(
            "doc_id",
            lexicon_sentiment_label(lexicon_sentiment_score(F.col("text"))).alias("l"),
            lexicon_sentiment_score(F.col("text")).alias("s"),
        ).collect()
    }
    for i, t in enumerate(texts):
        got = I.rules_sentiment_one(t)
        assert (got["label"], got["score"]) == col_rows[i], f"text={t!r}"
    # Refine summary law: ASCII-space trim only.
    from event_stream_starter_spark.functions import refine as R

    ref_rows = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", R.refined_summary(F.col("text")).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert I.rules_refine_one(t)["summary"] == ref_rows[i], f"text={t!r}"
        assert I.rules_refine_batch([t])[0]["summary"] == ref_rows[i]


def test_memoize_within_ttl_and_expiry():
    calls = {"n": 0}

    def counted(texts):
        calls["n"] += 1
        return [_valid_refine() for _ in texts]

    now = {"t": 0.0}
    clock = lambda: now["t"]  # noqa: E731
    _run(["same text here"], counted, clock=clock, memo_ttl_s=30.0)
    assert calls["n"] == 1
    now["t"] = 10.0  # within TTL: cache hit, no second call
    rows = _run(["same text here"], counted, clock=clock, memo_ttl_s=30.0)
    assert calls["n"] == 1 and rows[0][2] is None
    now["t"] = 50.0  # expired: backend re-invoked
    _run(["same text here"], counted, clock=clock, memo_ttl_s=30.0)
    assert calls["n"] == 2


def test_degraded_rows_are_not_memoized():
    """A degrade result must not poison the cache — the next batch should
    retry the backend (the reference memoizes only via the decorated
    success path; a crash raises through memoize_ttl uncached)."""
    state = {"fail": True, "calls": 0}

    def flaky(texts):
        state["calls"] += 1
        if state["fail"]:
            raise RuntimeError("transient")
        return [_valid_refine() for _ in texts]

    rows = _run(["retry me please"], flaky)
    assert rows[0][2] == "exception"
    state["fail"] = False
    rows = _run(["retry me please"], flaky)
    assert rows[0][2] is None and state["calls"] == 2


def test_vectorized_rules_batch_equals_per_row():
    """rules_refine_batch (pandas-vectorized) must be bit-identical to
    rules_refine_one per row — including edge shapes: empty text, <4
    char summaries, duplicate assets, >5 assets, all/none patterns."""
    texts = [
        "",
        "ab",
        "pump it $AB $CD $AB now",
        "listing hack partner pump crash rug collab launch",  # all 4 patterns
        "plain text with nothing special in it",
        "$AA $BB $CC $DD $EE $FF six assets over the cap",
        "  spaced   out\ttext  with  runs  ",
        "UPPER CASE LISTING TEXT",  # pattern is lowercase-matched
    ]
    assert I.rules_refine_batch(texts) == [I.rules_refine_one(t) for t in texts]


def test_in_batch_dedup_unique_texts_only():
    seen = []

    def record(texts):
        seen.append(list(texts))
        return [_valid_refine() for _ in texts]

    texts = ["dup text aa", "dup text aa", "other text bb"]
    rows = _run(texts, record)
    assert len(seen) == 1 and sorted(seen[0]) == ["dup text aa", "other text bb"]
    assert rows[0][0] == rows[1][0]


# ---------------------------------------------------------------------------
# Spark round-trip: runtime-registered backend reaches executors
# ---------------------------------------------------------------------------


@I.register_backend("refine", "upper_echo")
def _upper_echo(texts):
    return [
        {
            "type": "echo",
            "summary": t.upper()[: I.SUMMARY_MAX],
            "impacted_assets": [],
            "reasons": ["echo backend hit"],
            "confidence": 1.0,
        }
        for t in texts
    ]


def test_spark_model_backend_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "hello world listing"), (2, "quiet text")], "doc_id long, text string"
    )
    out = I.refine_with_backend(df, "text", ["doc_id"], backend="upper_echo")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["backend_used"] == "upper_echo"
    assert rows[1]["refined_summary"] == "HELLO WORLD LISTING"
    assert rows[1]["degrade_reason"] is None
    assert rows[1]["refine_confidence"] == 1.0


def test_spark_unknown_backend_raises_driver_side(spark):
    df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    with pytest.raises(KeyError):
        I.refine_with_backend(df, "text", ["doc_id"], backend="no_such_model")


def test_spark_sentiment_seam_degrade_columns(spark):
    @I.register_backend("sentiment", "always_invalid")
    def _bad(texts):
        return [{"label": "meh", "score": 0.0} for _ in texts]

    df = spark.createDataFrame(
        [(1, "good good good"), (2, "bad bad crash")], "doc_id long, text string"
    )
    out = I.sentiment_with_backend(df, "text", ["doc_id"], backend="always_invalid")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(r["degrade_reason"] == "schema" for r in rows.values())
    assert rows[1]["sentiment_label"] == "pos"  # rules fallback engaged
    assert rows[2]["sentiment_label"] == "neg"
    # Rules fallback equals the pure column-expression path.
    from event_stream_starter_spark.functions.scoring import (
        lexicon_sentiment_label,
        lexicon_sentiment_score,
    )

    col_rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            lexicon_sentiment_label(lexicon_sentiment_score(F.col("text"))).alias("l"),
            lexicon_sentiment_score(F.col("text")).alias("s"),
        ).collect()
    }
    for k in rows:
        assert rows[k]["sentiment_label"] == col_rows[k]["l"]
        assert rows[k]["sentiment_score"] == col_rows[k]["s"]
