"""SWR dimension-snapshot cache (SURVEY.md §2.1 S5/S6, §4).

The reference's enrichment providers (DexScreener→GeckoTerminal→24h
last_ok cache, dex_provider.py:368-538; GoPlus with stale-tolerant
reads, goplus_provider.py:112-244) reduce to one pattern: a small keyed
dimension table, refreshed on a cadence, where a failed refresh serves
the previous snapshot with a ``degrade`` flag instead of failing the
pipeline (ST7).

In Spark the snapshot is a cached DataFrame joined broadcast-side into
each micro-batch (J5). This manager owns the swap-on-success /
keep-on-failure lifecycle; freshness is data, exposed on every row.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fetch_with_failover(
    backends: list[tuple[str, Callable[[], DataFrame]]],
) -> Callable[[], DataFrame]:
    """S2 multi-backend source failover: try backends in configured order,
    first success wins (reference api/clients/x_client.py:96-110 —
    ``X_BACKENDS_TWEETS="apify,graphql"``). The winning backend's name is
    stamped on every row so degradation is observable downstream.

    Composes with :class:`DimensionCache`: all backends failing raises,
    which the cache turns into stale-while-revalidate (ST7)."""

    def fetch() -> DataFrame:
        errors: list[str] = []
        for name, fn in backends:
            try:
                df = fn()
                return df.withColumn("source_backend", F.lit(name))
            except Exception as exc:  # noqa: BLE001 - policy: next backend
                errors.append(f"{name}: {exc}")
        raise RuntimeError("all backends failed: " + "; ".join(errors))

    return fetch


@dataclass
class DimensionSnapshot:
    df: DataFrame
    fetched_at: float  # epoch seconds (injected clock for testability)
    version: int
    degraded: bool  # True when this snapshot outlived a failed refresh


class DimensionCache:
    """Holds the current snapshot of one dimension (e.g. dex pools,
    token security). ``refresh`` swaps atomically on success and keeps
    serving the stale snapshot on failure (stale-while-revalidate)."""

    def __init__(
        self,
        fetch: Callable[[], DataFrame],
        ttl_sec: float = 300.0,
        clock: Callable[[], float] = time.time,
    ):
        self._fetch = fetch
        self._ttl = ttl_sec
        self._clock = clock
        self._snap: DimensionSnapshot | None = None
        self._attempted_at: float | None = None

    def refresh(self) -> DimensionSnapshot:
        self._attempted_at = self._clock()
        df = None
        try:
            df = self._fetch()
            df.persist()
            df.count()  # materialize before swapping so readers never block
            old = self._snap
            self._snap = DimensionSnapshot(
                df=df,
                fetched_at=self._clock(),
                version=(old.version + 1) if old else 1,
                degraded=False,
            )
            if old is not None:
                old.df.unpersist()
        except Exception:
            # The fetch can fail AFTER persist() marked the new frame
            # (lazy plan, scan-time error) — release it or every failed
            # refresh pins one cached frame until clearCache.
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass
            if self._snap is None:
                raise  # nothing stale to serve — fail loudly
            self._snap = DimensionSnapshot(
                df=self._snap.df,
                fetched_at=self._snap.fetched_at,
                version=self._snap.version,
                degraded=True,
            )
        return self._snap

    def current(self) -> DimensionSnapshot:
        # Gate on the last refresh ATTEMPT, not the snapshot's fetch
        # time: a degraded snapshot keeps its old fetched_at, so gating
        # on it would either hammer the backend on every call or (if
        # guarded by the degraded flag) never retry at all — the stale
        # snapshot must be REvalidated once per TTL window until a
        # refresh succeeds.
        snap = self._snap
        now = self._clock()
        if snap is None or (
            self._attempted_at is None or now - self._attempted_at > self._ttl
        ):
            snap = self.refresh()
        return snap

    def enrich(self, facts: DataFrame, on: list[str], how: str = "left") -> DataFrame:
        """Broadcast-join the current snapshot into a fact frame, carrying
        the SWR metadata as columns (data_as_of / degrade — the reference
        exposes both on every response, DATABASE.md:486-490)."""
        snap = self.current()
        dim = snap.df.withColumn(
            "dim_as_of", F.timestamp_seconds(F.lit(snap.fetched_at))
        ).withColumn("dim_degraded", F.lit(snap.degraded))
        return facts.join(F.broadcast(dim), on=on, how=how)
