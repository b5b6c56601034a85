"""Skew-mitigation operators (SURVEY.md §7.4 100TB posture).

AQE's skew-join handling covers joins; aggregation skew on a hot key
(one symbol/topic receiving most of the stream) still funnels one
reducer. ``salted_agg`` is the standard two-phase fix: shard the hot key
across ``n_salts`` partial groups, aggregate, then combine partials —
correct for any commutative-associative aggregation set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (partial_expr, combine_expr) pairs per supported law keep the two
# phases in lockstep: phase-1 computes partial_expr per (key, salt),
# phase-2 folds partials with combine_expr.
_LAWS = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: output_name -> (law, column), law in {count,sum,min,max}
    (count ignores the column). Example::

        salted_agg(ev, ["event_type"], {"cnt": ("count", "*"),
                                        "total": ("sum", "value")})

    Phase 1 shuffles on (keys..., salt) — the hot key spreads over
    n_salts reducers; phase 2 shuffles n_salts rows per key.
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(n_salts))
    partial_exprs = []
    combine_exprs = []
    for name, (law, col) in aggs.items():
        if law not in _LAWS:
            raise ValueError(f"unsupported aggregation law: {law}")
        partial_fn, combine_fn = _LAWS[law]
        partial_exprs.append(partial_fn(F.col(col) if law != "count" else F.lit(1)).alias(name))
        combine_exprs.append(combine_fn(F.col(name)).alias(name))
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    return phase1.groupBy(*keys).agg(*combine_exprs)
