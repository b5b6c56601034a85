"""Signal state machine (SURVEY.md §2.11 ST4; reference
worker/jobs/onchain/verify_signal.py:268-573, migration 012).

states: candidate → verified | downgraded (terminal states sticky).
The reference needs CAS (`WHERE state=:prev_state`), distributed locks
and a 3-failure cooldown because many workers race per key; Spark
partitions state BY KEY — exactly one owner per key — so the protocol
reduces to a pure transition function over keyed state. The cooldown
(skip re-verification for cooldown_sec after 3 consecutive failures)
survives as ordinary state fields.

Implemented with ``applyInPandasWithState`` (GroupState); the same
transition function is reused by the batch golden test.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FAIL_LIMIT = 3
COOLDOWN_US = 600 * 1_000_000

STATE_SCHEMA = StructType(
    [
        StructField("state", StringType()),
        StructField("fail_count", IntegerType()),
        StructField("cooldown_until_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_key", StringType()),
        StructField("state", StringType()),
        StructField("fail_count", IntegerType()),
        StructField("last_ts_us", LongType()),
    ]
)


def transition(
    state: str, fail_count: int, cooldown_until_us: int, verdict: str, ts_us: int
) -> tuple[str, int, int]:
    """One verification verdict applied to (state, fail_count, cooldown).

    verdict ∈ {upgrade, downgrade, hold, error}; terminal states sticky
    (verify_signal.py:479-530); 3 consecutive errors → cooldown window
    during which verdicts are ignored (verify_signal.py:296-308).
    """
    if state in ("verified", "downgraded"):
        return state, fail_count, cooldown_until_us
    if ts_us < cooldown_until_us:
        return state, fail_count, cooldown_until_us
    if verdict == "error":
        fail_count += 1
        if fail_count >= FAIL_LIMIT:
            return state, 0, ts_us + COOLDOWN_US
        return state, fail_count, cooldown_until_us
    if verdict == "upgrade":
        return "verified", 0, cooldown_until_us
    if verdict == "downgrade":
        return "downgraded", 0, cooldown_until_us
    return state, 0, cooldown_until_us  # hold


def _make_apply_group(ttl_ms: int | None):
    def _apply_group(
        key: tuple[str],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # State TTL (SURVEY §7.4): the reference expires keyed state
        # implicitly via its 24h/14d scan windows; here an idle key's
        # state times out and is dropped, emitting a tombstone row so
        # downstream sinks can clear it. Without this, event_key state
        # grows without bound at 100TB.
        if ttl_ms is not None and state.hasTimedOut:
            st, fails, cd = state.get if state.exists else ("candidate", 0, 0)
            state.remove()
            yield pd.DataFrame(
                [{"event_key": key[0], "state": "expired", "fail_count": fails,
                  "last_ts_us": 0}]
            )
            return
        if state.exists:
            st, fails, cd = state.get
        else:
            st, fails, cd = "candidate", 0, 0
        # CONCATENATE all Arrow chunks, then sort ONCE: a key's rows can
        # arrive split across chunks in arbitrary order, so sorting each
        # chunk independently would fold verdicts out of event-time
        # order whenever a group straddles a chunk boundary (terminal
        # states are sticky — a reordered upgrade/downgrade diverges
        # permanently from the event-time replay).
        chunks = [pdf for pdf in batches if len(pdf)]
        last_ts = 0
        rows = []
        if chunks:
            all_rows = pd.concat(chunks, ignore_index=True).sort_values("ts_us")
            for _, r in all_rows.iterrows():
                st, fails, cd = transition(st, fails, cd, r["verdict"], int(r["ts_us"]))
            last_ts = int(all_rows["ts_us"].max())
        state.update((st, fails, cd))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        rows.append(
            {"event_key": key[0], "state": st, "fail_count": fails, "last_ts_us": last_ts}
        )
        yield pd.DataFrame(rows)

    return _apply_group


_apply_group = _make_apply_group(None)  # batch-parity default (golden test)


def apply_state_machine(verdicts: DataFrame, ttl_sec: int | None = None) -> DataFrame:
    """verdicts: streaming DF (event_key, ts_us, verdict) →
    per-key current state after each micro-batch.

    ttl_sec: idle-key state TTL (processing-time timeout). None keeps
    state forever — only for bounded tests; production mirrors the
    reference's 24h/14d windows (verify_signal.py scan cutoffs).

    Caveat: with ProcessingTimeTimeout the engine schedules micro-batches
    continuously to fire timers, so run the query with a processingTime
    trigger cadence; trigger(availableNow) will not terminate while
    timers are registered (observed: unbounded empty epochs).
    """
    return verdicts.groupBy("event_key").applyInPandasWithState(
        _make_apply_group(None if ttl_sec is None else ttl_sec * 1000),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_sec is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def replay_batch(rows: list[dict[str, Any]]) -> dict[str, tuple[str, int, int]]:
    """Pure-Python replay of the same transition function (golden
    oracle for the streaming test)."""
    states: dict[str, tuple[str, int, int]] = {}
    for r in sorted(rows, key=lambda r: (r["event_key"], r["ts_us"])):
        st, fails, cd = states.get(r["event_key"], ("candidate", 0, 0))
        states[r["event_key"]] = transition(st, fails, cd, r["verdict"], r["ts_us"])
    return states
