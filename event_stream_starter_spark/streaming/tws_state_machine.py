"""Signal state machine on the transformWithState API (Spark 4) —
the successor to applyInPandasWithState (state_machine.py keeps the
classic implementation; both reuse the same pure ``transition``).

Why both: transformWithState gives NATIVE per-state TTL (the engine
expires idle keys in the state store itself — no timer bookkeeping in
user code), typed value state, and is the API Spark is evolving for
custom stateful operators. The transition semantics are identical; the
golden test replays both against the same pure-Python oracle.

Reference: worker/jobs/onchain/verify_signal.py:268-573 (states +
cooldown); TTL mirrors the reference's implicit 24h/14d state windows.

Environment note: transformWithState's Python worker requires the
``protobuf`` wheel; in environments without it (like this container)
the import of this module still succeeds but running the query fails at
stream start — use state_machine.apply_state_machine (the tested
default) there. The golden test importorskips on google.protobuf.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from .state_machine import OUTPUT_SCHEMA, transition


class SignalStateProcessor(StatefulProcessor):
    """Keyed (state, fail_count, cooldown_until_us) value state; rows of
    one micro-batch are applied in ts order through ``transition``."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "sig",
            "state string, fail_count int, cooldown_until_us long",
            ttlDurationMs=self._ttl_ms,
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            st, fails, cd = self._state.get()
        else:
            st, fails, cd = "candidate", 0, 0
        # Concat-then-sort ONCE: chunk-local sorting would fold verdicts
        # out of event-time order when a key's rows straddle an Arrow
        # chunk boundary (see state_machine._make_apply_group).
        chunks = [pdf for pdf in rows if len(pdf)]
        last_ts = 0
        if chunks:
            all_rows = pd.concat(chunks, ignore_index=True).sort_values("ts_us")
            for _, r in all_rows.iterrows():
                st, fails, cd = transition(st, fails, cd, r["verdict"], int(r["ts_us"]))
            last_ts = int(all_rows["ts_us"].max())
        self._state.update((st, fails, cd))
        yield pd.DataFrame(
            [{"event_key": key[0], "state": st, "fail_count": fails,
              "last_ts_us": last_ts}]
        )

    def close(self) -> None:
        pass


def apply_state_machine_tws(
    verdicts: DataFrame, ttl_sec: int | None = None
) -> DataFrame:
    """verdicts: streaming DF (event_key, ts_us, verdict) → per-key state
    after each micro-batch, with native state-store TTL when ttl_sec set
    (expired keys simply restart as 'candidate' — the state store drops
    them without user-level timers)."""
    return verdicts.groupBy("event_key").transformWithStateInPandas(
        statefulProcessor=SignalStateProcessor(
            None if ttl_sec is None else ttl_sec * 1000
        ),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_sec is not None else "None",
    )
