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


def ema_fold(prev: float | None, values: list[float], alpha: float) -> float | None:
    ema = prev
    for v in values:
        ema = v if ema is None else alpha * v + (1 - alpha) * ema
    return ema


def _make_fn(alpha: float):
    def fn(
        key: tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_ts, ema = state.get if state.exists else (0, None)
        n = 0
        for pdf in batches:
            pdf = pdf.sort_values("ts_us")
            ema = ema_fold(ema, [float(v) for v in pdf["value"]], alpha)
            if len(pdf):
                last_ts = max(last_ts, int(pdf["ts_us"].max()))
            n += len(pdf)
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
