"""Multi-round DoReMi goldens: the baseline-re-centered EG recurrence
must (a) concentrate weight on the above-average-excess domain
monotonically on a planted skew, (b) stay a probability vector, and
(c) reproduce the registered query's recurrence exactly (pure-Python
twin of the decimal law vs the Spark/oracle-checked output columns)."""

from __future__ import annotations

from decimal import Decimal
from math import exp

import pytest

from event_stream_starter_spark.queries.corpusstats import (
    _DOREMI_ETA,
    _DOREMI_ROUNDS,
)


def _r(x: float, dp: int) -> float:
    return float(Decimal(x).quantize(Decimal(1).scaleb(-dp)))


def _eg_rounds_py(rows, eta, rounds):
    """Pure-Python twin of _doremi_rounds_ctes: rows = [(share, excess)];
    returns per-round weight vectors (round 0 = rounded shares)."""
    w = [_r(s, 6) for s, _ in rows]
    out = [list(w)]
    for _ in range(rounds):
        b = float(sum(Decimal(str(_r(wi * e, 12))) for wi, (_, e) in zip(w, rows)))
        nums = [
            Decimal(str(_r(wi * exp(eta * _r(max(e - b, 0.0), 9)), 12)))
            for wi, (_, e) in zip(w, rows)
        ]
        den = sum(nums)
        w = [_r(float(n / den), 6) for n in nums]
        out.append(list(w))
    return out


def test_planted_skew_concentrates_monotonically():
    """One domain with excess far above the rest: its weight must rise
    every round and the others' must fall; every round stays ~normalized."""
    rows = [(0.5, 0.02), (0.3, 0.50), (0.2, 0.01)]  # domain 1 is hard
    traj = _eg_rounds_py(rows, _DOREMI_ETA, 6)
    hard = [w[1] for w in traj]
    assert all(b > a for a, b in zip(hard, hard[1:])), hard
    for w in traj:
        assert abs(sum(w) - 1.0) < 5e-6
    easy = [w[0] for w in traj]
    assert all(b <= a for a, b in zip(easy, easy[1:]))


def test_uniform_excess_is_a_fixed_point():
    """Equal excess everywhere: the baseline equals the excess, every
    adjusted excess clips to 0, and the weights never move."""
    rows = [(0.25, 0.1), (0.25, 0.1), (0.25, 0.1), (0.25, 0.1)]
    traj = _eg_rounds_py(rows, _DOREMI_ETA, 4)
    assert all(w == traj[0] for w in traj)


def test_registered_query_matches_python_recurrence(spark, sf_dir):
    """The Spark query's (weight_r1, weight) columns must equal the
    pure-Python recurrence applied to its own (ref_share, excess)
    columns — pinning the round loop itself, independent of the LM
    scoring that produced the excess table."""
    from event_stream_starter_spark.queries import all_queries

    rows = all_queries()["x_doremi_weights_multiround"].fn(
        spark, sf_dir
    ).collect()
    assert rows
    # rebuild unrounded shares from token_mass (the query's own law)
    tot = sum(r["token_mass"] for r in rows)
    planted = [(r["token_mass"] / tot, r["excess"]) for r in rows]
    traj = _eg_rounds_py(planted, _DOREMI_ETA, _DOREMI_ROUNDS)
    for i, r in enumerate(rows):
        assert r["weight_r1"] == pytest.approx(traj[1][i], abs=2e-6), r
        assert r["weight"] == pytest.approx(traj[-1][i], abs=2e-6), r
