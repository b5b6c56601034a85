"""As-of join: for each left row, the latest right row with
right_ts <= left_ts per key (J6 family — the reference answers
"state as of event time" with per-key latest-snapshot SQL,
api/signals/heat.py:405-425 / features_snapshot reads; this is the
general two-table operator).

Spark has no ASOF JOIN physical operator. The scalable composition is
union+window, NOT a range join: tag both inputs, union them, and carry
the right payload forward with last(ignorenulls) over
(key ORDER BY ts, side). One shuffle on the key, linear in
|L|+|R|, no candidate-pair explosion — a range-condition join would
rewrite to a broadcast-nested-loop (quadratic) or need interval
bucketing. At equal timestamps the right row sorts first, so the match
is inclusive (l.ts >= r.ts), matching DuckDB's ASOF semantics — the
oracle for the registered query.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join. Output: all left columns + right_cols (null when
    no matching right row exists for the key).

    `direction`: "backward" (default) matches the LATEST right row with
    right_ts <= left_ts; "forward" the EARLIEST with right_ts >=
    left_ts — both inclusive, mirroring DuckDB ASOF's >= / <= forms.
    `tolerance_us`: when set, a match farther than this from the left
    timestamp is nulled out (the pandas merge_asof tolerance law) —
    applied to the WHOLE payload, never per column. Same one-shuffle
    union+window plan either way (forward just reverses the sort).

    `right` must be unique per (keys, right_ts) — pre-aggregate ties
    (e.g. max_by) so the carried value is deterministic.
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_cols = left.columns
    overlap = set(right_cols) & set(left_cols)
    if overlap:
        raise ValueError(
            f"right_cols {sorted(overlap)} collide with left columns — "
            "alias the right payload before joining"
        )
    # The right payload travels as ONE struct, not per-column: carrying
    # each column independently with last(ignorenulls) would backfill a
    # NULL field of the latest right row from an OLDER row, emitting a
    # column mix that never existed as a row. The struct is non-null for
    # every right row (even all-NULL-fields ones), so last(ignorenulls)
    # picks whole snapshots atomically. The matched right timestamp
    # rides along as `__rts` so the tolerance law can see it.
    payload_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in right_cols]
        + [T.StructField("__rts", right.schema[right_ts].dataType, True)]
    )
    l_tag = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_t).alias("__r"),
    )
    # A right row with NULL right_ts can never satisfy the as-of
    # predicate (DuckDB ASOF semantics); unfiltered it would sort
    # nulls-first and backfill its payload into EVERY left row
    # preceding the first real snapshot.
    r_tag = right.filter(F.col(right_ts).isNotNull()).select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in keys
            else F.col(c)
            for c in left_cols
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c).alias(c) for c in right_cols],
            F.col(right_ts).alias("__rts"),
        ).alias("__r"),
    )
    unioned = l_tag.unionByName(r_tag)
    # At EQUAL timestamps the right row must sort before the left one in
    # both directions (inclusive match): __side asc does that under asc
    # AND desc ts order, since the tie group keeps its own ordering.
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left_cols,
        "__side",
        F.col("__ts"),
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__r"),
    )
    if tolerance_us is not None:
        gap = (
            F.col("__ts") - F.col("__r.__rts")
            if direction == "backward"
            else F.col("__r.__rts") - F.col("__ts")
        )
        carried = carried.withColumn(
            "__r", F.when(gap <= F.lit(int(tolerance_us)), F.col("__r"))
        )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *left_cols,
            *[F.col(f"__r.{c}").alias(c) for c in right_cols],
        )
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    ts_us: str = "ts_us",
    start_us: str = "start_us",
    end_us: str = "end_us",
    granule_us: int = 3600 * 1_000_000,
) -> DataFrame:
    """Interval (range) join: event rows matched to every interval with
    ``start_us <= ts < end_us`` on the same key — via GRANULE BUCKETING,
    never a range-condition join.

    A raw range predicate join has no equi-key, so Catalyst plans a
    (broadcast) nested loop — quadratic at scale. Instead both sides
    are mapped onto a fixed time granule: an event belongs to exactly
    one granule (its timestamp's), an interval EXPLODES into the
    granules it covers (ceil(len/granule) rows), and the join becomes a
    plain hash equi-join on (keys…, granule) with the exact containment
    predicate as a post-filter. Each (event, interval) pair meets at
    most once — the event side has one granule row — so no dedup pass
    is needed. One shuffle per side; explosion factor = interval length
    / granule (pick the granule near the TYPICAL interval length; a hot
    granule shards with the standard salting from operators/skew).

    Intervals with ``end_us <= start_us`` are dropped (empty by the
    half-open contract; also keeps the granule sequence ascending).
    """
    g = int(granule_us)
    ev = events.withColumn("__g", F.expr(f"{ts_us} div {g}"))
    iv = intervals.filter(F.col(end_us) > F.col(start_us)).withColumn(
        "__g",
        F.explode(
            F.sequence(
                F.expr(f"{start_us} div {g}"), F.expr(f"({end_us} - 1) div {g}")
            )
        ),
    )
    return (
        ev.join(iv, [*keys, "__g"])
        .filter((F.col(start_us) <= F.col(ts_us)) & (F.col(ts_us) < F.col(end_us)))
        .drop("__g")
    )
