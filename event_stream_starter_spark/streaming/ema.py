"""Stateful EMA (SURVEY.md §2.6 W6; reference api/signals/heat.py:81-95 —
``ema = α*cur + (1-α)*prev`` per key, previous value held in cache).

Keyed GroupState holds (last_ts_us, ema); each micro-batch folds its
rows in event-time order into the state. ORDERING CONTRACT: per-key
arrival order must follow event time across batches (true for Kafka
per-key partitions and for ordered file landing; the reference's Redis
cache makes the same assumption). Late rows older than the state's
last_ts are folded with their stale position — exactly what the
reference's cache-based EMA does.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_ALPHA = 0.3

STATE_SCHEMA = StructType(
    [StructField("last_ts_us", LongType()), StructField("ema", DoubleType())]
)

OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("last_ts_us", LongType()),
        StructField("ema", DoubleType()),
        StructField("n_seen", LongType()),
    ]
)


def ema_fold(prev: float | None, values: list[float | None], alpha: float) -> float | None:
    """Fold values into an EMA. A NULL/NaN value RESETS the accumulator
    — the same law as the batch `aggregate` in operators/windows.ema_last
    (any null x nulls the accumulator; the next non-null restarts it).
    Without the reset, one NULL row would poison the keyed state with
    NaN forever (alpha*NaN + ... is NaN for every later update)."""
    ema = prev
    for v in values:
        if v is None or v != v:  # None or NaN
            ema = None
        elif ema is None:
            ema = float(v)
        else:
            ema = alpha * float(v) + (1 - alpha) * ema
    return ema


def _make_fn(alpha: float):
    def fn(
        key: tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_ts, ema = state.get if state.exists else (0, None)
        # Concat all Arrow chunks, then sort ONCE: a key's rows can span
        # chunks in arbitrary order — chunk-local sorting would fold the
        # series out of event-time order (see state_machine for the same
        # law).
        chunks = [pdf for pdf in batches if len(pdf)]
        n = 0
        if chunks:
            all_rows = pd.concat(chunks, ignore_index=True).sort_values("ts_us")
            vals = [None if pd.isna(v) else float(v) for v in all_rows["value"]]
            ema = ema_fold(ema, vals, alpha)
            last_ts = max(last_ts, int(all_rows["ts_us"].max()))
            n = len(all_rows)
        state.update((last_ts, float(ema) if ema is not None else None))
        yield pd.DataFrame(
            [{"key": key[0], "last_ts_us": last_ts, "ema": ema, "n_seen": n}]
        )

    return fn


def ema_stream(df: DataFrame, alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """df: streaming (key, ts_us, value) → per-key running EMA after each
    micro-batch (update mode)."""
    return df.groupBy("key").applyInPandasWithState(
        _make_fn(alpha),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
