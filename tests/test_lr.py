"""Golden tests for the learned quality classifier (operators/lr.py).

The rows-only queries' load-bearing check: weight-for-weight parity
against an independent pure-Python (hashlib + Decimal) trainer on the
full sf0.001 corpus — meaningful as EXACT equality because training
arithmetic is exact decimal end to end (binary features, decimal sums,
hard-sigmoid activation, driver-side Decimal updates).
"""

from __future__ import annotations

import hashlib
import re
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from event_stream_starter_spark.io import load_table
from event_stream_starter_spark.operators import lr
from event_stream_starter_spark.operators.textan import LANG_STOPWORDS
from event_stream_starter_spark.queries import all_queries

W9 = Decimal("0.000000001")


def py_tokens(text: str) -> list[str]:
    # re.ASCII mirrors Java regex default \s (the Spark tokenizer's
    # whitespace class); str.split(" ") after collapse matches F.split.
    s = re.sub(r"\s+", " ", text.lower(), flags=re.ASCII).strip()
    return [t for t in s.split(" ") if t]


def py_quality(text: str) -> float:
    """Float-for-float twin of textan.quality_score (source order, IEEE
    doubles, re.ASCII = Java/RE2 ASCII \\w \\s classes)."""
    toks = py_tokens(text)
    n_toks = float(max(len(toks), 1))
    length_score = min(n_toks / 100.0, 1.0)
    n_chars = float(max(len(text), 1))
    n_punct = float(len(text) - len(re.sub(r"[^\w\s]", "", text, flags=re.ASCII)))
    stop = LANG_STOPWORDS["en"]
    sw = min(float(sum(1 for t in toks if t in stop)) / n_toks * 5.0, 1.0)
    return 0.4 * length_score + 0.3 * (1.0 - n_punct / n_chars) + 0.3 * sw


def py_features(text: str | None) -> set[str]:
    if text is None:
        return set()
    return {
        hashlib.md5(t.encode("utf-8")).hexdigest()[: lr.FEATURE_HEX_CHARS]
        for t in py_tokens(text)
    }


def py_label(text: str | None) -> int:
    return 1 if text is not None and py_quality(text) >= 0.5 else 0


def py_hard_sigmoid(m: Decimal) -> Decimal:
    return min(max(m * Decimal("0.25") + Decimal("0.5"), Decimal(0)), Decimal(1))


def py_train(rows, iters=16, rate=Decimal("1")):
    """Reference trainer: plain dict/set loops, no Spark code shared."""
    feats = {d: py_features(t) for d, t in rows}
    labels = {d: py_label(t) for d, t in rows}
    n = Decimal(len(rows))
    keys = sorted(set().union(*feats.values()) if feats else set())
    w = {k: Decimal(0) for k in keys}
    bias = Decimal(0)
    for _ in range(iters):
        gsum = {k: Decimal(0) for k in keys}
        bias_g = Decimal(0)
        for d, fs in feats.items():
            m = bias + sum((w[k] for k in fs), Decimal(0))
            r = py_hard_sigmoid(m) - labels[d]
            bias_g += r
            for k in fs:
                gsum[k] += r
        for k in keys:
            w[k] = (w[k] - rate * gsum[k] / n).quantize(W9, ROUND_HALF_UP)
        bias = (bias - rate * bias_g / n).quantize(W9, ROUND_HALF_UP)
    return w, bias


def _corpus_rows(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]


def test_train_matches_python_reference_corpus(spark, sf_dir):
    """Full-corpus weight-for-weight parity at sf0.001: the distributed
    decimal sums, label arithmetic, and update schedule must all agree
    exactly with the reference loops."""
    docs = load_table(spark, sf_dir, "documents")
    w, bias = lr.train_logreg(docs)
    wp, bp = py_train(_corpus_rows(spark, sf_dir))
    assert bias == bp
    assert set(w) == set(wp)
    bad = {k: (w[k], wp[k]) for k in w if w[k] != wp[k]}
    assert not bad, f"{len(bad)} diverging weights, e.g. {sorted(bad.items())[:3]}"


def test_score_matches_python_per_doc(spark, sf_dir):
    rows = _corpus_rows(spark, sf_dir)
    w, bias = py_train(rows)
    scored = {
        r["doc_id"]: r
        for r in all_queries()["x_lr_quality_score"].fn(spark, sf_dir).collect()
    }
    assert len(scored) == len(rows)
    for d, t in rows:
        fs = py_features(t)
        p = py_hard_sigmoid(bias + sum((w[k] for k in fs if k in w), Decimal(0)))
        got = scored[d]
        assert got["y"] == py_label(t), d
        assert Decimal(got["p"]) == p, d
        assert got["pred"] == (1 if p >= Decimal("0.5") else 0), d


def test_cert_query_beats_majority_and_counts(spark, sf_dir):
    rows = _corpus_rows(spark, sf_dir)
    out = all_queries()["x_lr_quality_score_cert"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    got = out[0]
    n_pos = sum(py_label(t) for _, t in rows)
    assert got["n_docs"] == len(rows)
    assert got["n_pos"] == n_pos
    assert got["majority_n"] == max(n_pos, len(rows) - n_pos)
    assert got["model_beats_majority"] is True


def test_empty_and_null_text_score_at_bias(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "the of and to in is it that for a " * 12)],
        "doc_id long, text string",
    )
    w, bias = lr.train_logreg(df, iters=2)
    out = {
        r["doc_id"]: r
        for r in lr.score_expr(lr.doc_features(df), lr.doc_labels(df), w, bias).collect()
    }
    assert len(out) == 3
    # docs 1-2 have no features: margin is exactly the bias
    expect = py_hard_sigmoid(bias)
    assert Decimal(out[1]["p"]) == expect
    assert Decimal(out[2]["p"]) == expect
    assert out[1]["y"] == 0 and out[2]["y"] == 0 and out[3]["y"] == 1


def test_model_join_is_broadcast(spark, sf_dir):
    """The scoring pass must broadcast the model-sized weight table —
    a shuffle join here would shuffle the 100TB feature table against
    4096 rows."""
    plan = (
        all_queries()["x_lr_quality_score"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
