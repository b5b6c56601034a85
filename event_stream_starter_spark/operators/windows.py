"""Window-function operators (SURVEY.md §2.6 W1-W9).

Scale notes: all windows partition by a key (bounded per-partition state);
the single global window in `global_share_topn` (reference
top_holders_snapshot.sql) computes the global total with a scalar agg +
broadcast instead of `Window.partitionBy()` — an empty partitionBy pulls
every row into ONE task, which would not survive 100TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order_col: str, tiebreak: Sequence[str] = ()
) -> DataFrame:
    """W7: latest row per key — row_number over desc(order) == 1.

    Reference: api/signals/heat.py:405-425 (ORDER BY ts DESC LIMIT 1 per key).
    Deterministic via explicit tiebreak columns.
    """
    order = [F.col(order_col).desc()] + [F.col(t).desc() for t in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_name: str = "rank",
) -> DataFrame:
    """T1/T3: top-k rows per group via row_number (shuffle once on keys)."""
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return df.withColumn(rank_name, F.row_number().over(w)).filter(
        F.col(rank_name) <= k
    )


def growth_ratio(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str = "growth_ratio",
) -> DataFrame:
    """W2: (cur - prev) / prev vs previous row within key, ordered by time.

    Reference: api/jobs/onchain/enrich_features.py:60-106. `lag` replaces
    the reference's correlated LIMIT-1 self-lookup (SURVEY J6) — one
    shuffle on the key instead of N point queries.
    """
    w = Window.partitionBy(*keys).orderBy(order_col)
    prev = F.lag(F.col(value_col)).over(w)
    return df.withColumn(
        out_col,
        F.when(
            prev.isNotNull() & (prev != 0),
            (F.col(value_col) - prev) / prev,
        ),
    )


def global_share_topn(
    df: DataFrame, value_col: str, id_cols: Sequence[str], top_n: int
) -> DataFrame:
    """W1: share = value / global_total, keep top-N by value.

    Reference: templates/sql/eth/top_holders_snapshot.sql:7-17
    (SUM OVER (), SAFE_DIVIDE, QUALIFY ROW_NUMBER <= n).

    Implementation: global total via cross-join of a 1-row aggregate
    (broadcast by AQE), global top-N via orderBy+limit (Spark's TakeOrdered
    — per-partition top-N then merge on driver, no full sort shuffle).
    """
    total = df.agg(F.sum(F.col(value_col)).alias("__total"))
    ranked = (
        df.orderBy(F.col(value_col).desc(), *[F.col(c) for c in id_cols])
        .limit(top_n)
        .crossJoin(F.broadcast(total))
    )
    return ranked.withColumn(
        "share", F.try_divide(F.col(value_col), F.col("__total"))
    ).drop("__total")


def trailing_heat_counts(ev: DataFrame) -> DataFrame:
    """A3 heat windows in ONE place: per event_type conditional counts of
    the trailing 10m / 30m and the previous 10m (20m→10m ago), with
    `now` = max event time (injected, not wall-clock). One pass over the
    fact table — three conditional sums, not three scans
    (reference api/signals/heat.py:225-295 issues three COUNT queries).
    Shared by a3_w5_heat_slope and the flagship slice so the boundary
    operators (>= / <) can never fork between them — inclusive-left,
    exclusive-right exactly as the reference's ts >= :t_10m_ago /
    ts < :t_10m_ago predicates (heat.py:232,250,283-285).
    """
    now_t = ev.agg(F.max("ts").alias("now_ts"))
    e = ev.crossJoin(F.broadcast(now_t))
    in_10 = F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 10 MINUTES")
    in_30 = F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 30 MINUTES")
    in_prev = (F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 20 MINUTES")) & (
        F.col("ts") < F.col("now_ts") - F.expr("INTERVAL 10 MINUTES")
    )
    return e.groupBy("event_type").agg(
        F.sum(F.when(in_10, 1).otherwise(0)).alias("cnt_10m"),
        F.sum(F.when(in_30, 1).otherwise(0)).alias("cnt_30m"),
        F.sum(F.when(in_prev, 1).otherwise(0)).alias("prev_10m"),
    )


def endpoint_slope(counts: Column, window_minutes: Column | int) -> Column:
    """W3: (last - first) / window_minutes over an ordered count array.

    Reference: api/services/topic_analyzer.py:107-117.
    """
    n = F.size(counts)
    last = F.element_at(counts, n)
    first = F.element_at(counts, 1)
    wm = F.lit(window_minutes) if isinstance(window_minutes, int) else window_minutes
    # element_at(arr, 0) RAISES (even non-ANSI) — an empty counts array
    # (quiet key after gap-filling/filters) must yield NULL slope, not
    # fail the query.
    return F.when(
        n > 0, (last - first).cast("double") / wm.cast("double")
    ).otherwise(F.lit(None).cast("double"))


def ema_last(values: Column, alpha: float) -> Column:
    """W6: exponential moving average of an ordered array, returning the
    final EMA value. ema_0 = x_0; ema_t = alpha*x_t + (1-alpha)*ema_{t-1}.

    Reference: api/signals/heat.py:81-95. Expressed with the higher-order
    `aggregate` — no UDF, no driver loop. Streaming keeps the same scalar
    as keyed state.
    """
    return F.aggregate(
        values,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x.cast("double")).otherwise(
            F.lit(alpha) * x.cast("double") + F.lit(1.0 - alpha) * acc
        ),
    )


def heat_gates(
    cnt_10m: Column,
    cnt_30m: Column,
    slope: Column,
    theta: float = 0.2,
    noise_floor: int = 1,
    min_sample: int = 3,
) -> dict[str, Column]:
    """W5 noise/sample gates (reference heat.py:125-127 defaults,
    264-273 branch order): below the noise floor → slope NULL, trend
    'flat', degrade FALSE (quiet is not an error); else below the 30m
    sample minimum → slope NULL, 'flat', degrade TRUE (not enough data
    to trust a trend); else the slope/trend computation runs. Returns
    {'slope', 'trend', 'degrade'} column expressions."""
    gated = (cnt_10m < noise_floor) | (cnt_30m < min_sample)
    return {
        "slope": F.when(~gated, F.round(slope, 6) + F.lit(0)),
        "trend": F.when(gated, F.lit("flat")).otherwise(slope_trend(slope, theta)),
        "degrade": (cnt_10m >= noise_floor) & (cnt_30m < min_sample),
    }


def slope_trend(slope: Column, theta: float = 0.2) -> Column:
    """W5 trend label: up/down/flat at ±theta — INCLUSIVE bounds: the
    reference labels `slope >= theta_rise` up and `slope <= -theta_rise`
    down (heat.py:298-303), and exact ±theta is common (slopes are
    int-diff/10 multiples of 0.1)."""
    return (
        F.when(slope >= theta, F.lit("up"))
        .when(slope <= -theta, F.lit("down"))
        .otherwise(F.lit("flat"))
    )
