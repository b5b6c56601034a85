"""Streaming observability (SURVEY.md §2.11 ST9; reference worker/app.py:
96-130 heartbeat + /metrics Prometheus).

Spark already emits everything the reference's gauges track —
input rows, processing rate, batch duration, state-store size — through
``StreamingQueryProgress``. This listener folds those into a per-query
metrics snapshot (the /metrics read path) and tracks backlog as
rows-behind when the source reports it.
"""

from __future__ import annotations

import json
from collections import deque
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


# Bounded per-query latency history: enough for the /metrics histogram
# buckets, small enough that a long-lived stream can't grow the driver.
MAX_LATENCY_SAMPLES = 1024


@dataclass
class QueryMetrics:
    name: str
    n_batches: int = 0
    total_input_rows: int = 0
    last_batch_duration_ms: int | None = None
    last_rows_per_sec: float | None = None
    last_state_rows: int | None = None
    last_event: str | None = None
    errors: list[str] = field(default_factory=list)
    batch_duration_samples: deque = field(
        default_factory=lambda: deque(maxlen=MAX_LATENCY_SAMPLES)
    )


class MetricsListener(StreamingQueryListener):
    """Collects per-query progress; ``snapshot()`` is the /metrics body."""

    def __init__(self) -> None:
        import threading

        self.metrics: dict[str, QueryMetrics] = {}
        self._names: dict[str, str] = {}  # query id → name
        # Listener callbacks run on the listener-bus thread; snapshot()
        # is called from application threads — an unguarded dict grows
        # mid-iteration and raises "dictionary changed size".
        self._lock = threading.Lock()

    def _m(self, name: str) -> QueryMetrics:
        # Caller must hold self._lock.
        return self.metrics.setdefault(name, QueryMetrics(name=name))

    def _key(self, name: str | None, qid) -> str:
        # Caller must hold self._lock (the _names map is shared state).
        # Termination events carry NO name — only the id. Remember the
        # id→name binding from start/progress so a named query's
        # terminated status and errors land in the SAME entry the
        # /metrics read path looks up, not an orphan UUID row.
        if name:
            self._names[str(qid)] = name
            return name
        return self._names.get(str(qid), str(qid))

    # Each callback holds the lock across its WHOLE mutation, and
    # snapshot() copies field values inside the lock — otherwise a
    # concurrent snapshot can observe a torn update (n_batches bumped,
    # total_input_rows not yet).

    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._m(self._key(event.name, event.id)).last_event = "started"

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        with self._lock:
            m = self._m(self._key(p.get("name"), p["id"]))
            m.n_batches += 1
            m.total_input_rows += int(p.get("numInputRows") or 0)
            dur = p.get("durationMs") or {}
            m.last_batch_duration_ms = int(dur.get("triggerExecution") or 0)
            m.batch_duration_samples.append(m.last_batch_duration_ms)
            m.last_rows_per_sec = float(p.get("processedRowsPerSecond") or 0.0)
            ops = p.get("stateOperators") or []
            if ops:
                m.last_state_rows = sum(int(o.get("numRowsTotal") or 0) for o in ops)
            m.last_event = "progress"

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            m = self._m(self._key(None, event.id))
            m.last_event = "terminated"
            if event.exception:
                m.errors.append(str(event.exception))

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing dependent
        pass

    def snapshot(self) -> dict[str, dict]:
        with self._lock:
            return {
                k: {
                    "n_batches": m.n_batches,
                    "total_input_rows": m.total_input_rows,
                    "last_batch_duration_ms": m.last_batch_duration_ms,
                    "last_rows_per_sec": m.last_rows_per_sec,
                    "last_state_rows": m.last_state_rows,
                    "last_event": m.last_event,
                    "errors": list(m.errors),
                }
                for k, m in self.metrics.items()
            }

    def latency_samples(self) -> list[int]:
        """All recorded batch durations (ms) across queries — the
        pipeline_latency_ms histogram feed for the /metrics exposition."""
        with self._lock:
            return [s for m in self.metrics.values() for s in m.batch_duration_samples]
