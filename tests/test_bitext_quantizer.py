"""Frozen bitext coarse-quantizer goldens (round 10):

- provenance: refitting at sf0.001 reproduces the COMMITTED model
  artifact exactly (deterministic k-means + deterministic calibration
  sample -> byte-equal floats), the _FROZEN_MERGES convention;
- registry behavior: unknown corpora fit once and persist to the
  writable cache (second lookup loads, never refits); a hand-edited /
  stale artifact whose recorded fingerprint disagrees with the lookup
  raises instead of silently serving a mismatched model;
- calibration floor: the probe depth is never below 2 even on a
  perfectly clustered corpus (the end-to-end recall cert's margin).
"""

from __future__ import annotations

import json
import os

import pytest

from event_stream_starter_spark.operators import quantizer_registry as qreg


SF001 = "/root/testdata/sf0.001"


def test_bitext_quantizer_provenance(spark):
    """The committed artifact for the sf0.001 corpus IS what the fit
    function produces today — spliced from the generator, never
    retyped; a drift in kmeans/calibration semantics fails here."""
    from event_stream_starter_spark.queries.vectors import (
        _fit_bitext_quantizer,
    )

    fp = qreg.corpus_fingerprint(SF001)
    committed = qreg.load_model("bitext_ivf", fp)
    assert committed is not None, (
        "no committed bitext_ivf artifact for sf0.001 — run "
        "scripts/gen_bitext_quantizer.py"
    )
    refit = _fit_bitext_quantizer(spark, SF001)
    assert refit["n_vectors"] == committed["n_vectors"]
    assert refit["n_lists"] == committed["n_lists"]
    assert refit["n_probe"] == committed["n_probe"]
    assert refit["centroids"] == committed["centroids"]


def test_registry_fits_once_and_caches(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(qreg, "_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setattr(qreg, "_MEM", {})
    sf = tmp_path / "corpus"
    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0 - (i % 3)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(sf / "embeddings.parquet")
    )
    calls = {"n": 0}

    def fit():
        calls["n"] += 1
        return {"n_vectors": 30, "n_lists": 8, "n_probe": 2, "centroids": [[0.0]]}

    m1 = qreg.get_or_fit("bitext_ivf", str(sf), fit)
    assert calls["n"] == 1 and m1["n_lists"] == 8
    # in-memory hit
    qreg.get_or_fit("bitext_ivf", str(sf), fit)
    assert calls["n"] == 1
    # cold-process hit: clear the memory cache, the DISK cache answers
    monkeypatch.setattr(qreg, "_MEM", {})
    qreg.get_or_fit("bitext_ivf", str(sf), fit)
    assert calls["n"] == 1


def test_registry_rejects_fingerprint_mismatch(tmp_path, monkeypatch):
    monkeypatch.setattr(qreg, "_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setattr(qreg, "_MEM", {})
    path = qreg.persist_model(
        "bitext_ivf", "aa" * 16, {"n_lists": 4, "centroids": []}
    )
    # hand-edit the artifact to carry the WRONG fingerprint
    with open(path) as fh:
        m = json.load(fh)
    m["fingerprint"] = "bb" * 16
    with open(path, "w") as fh:
        json.dump(m, fh)
    monkeypatch.setattr(qreg, "_MEM", {})
    with pytest.raises(ValueError, match="fingerprint"):
        qreg.load_model("bitext_ivf", "aa" * 16)


def test_calibration_floor_is_two(spark, tmp_path, monkeypatch):
    """A perfectly clustered corpus (every true neighbor shares the
    query's own list) calibrates to rank 1 — the floor must still
    emit 2 (measured: depth 1 left the smoke-corpus recall cert at
    0.909, no margin)."""
    from event_stream_starter_spark.queries import vectors as V

    sf = tmp_path / "clustered"
    rows = []
    for c in range(4):
        for i in range(10):
            v = [0.0] * 8
            v[c] = 1.0
            v[4 + c] = 0.01 * (i + 1)  # tiny in-cluster spread
            rows.append((c * 10 + i, v))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(sf / "embeddings.parquet")
    )
    model = V._fit_bitext_quantizer(spark, str(sf))
    assert model["n_probe"] >= 2
