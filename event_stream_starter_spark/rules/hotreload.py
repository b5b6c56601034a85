"""Hot-reloading rules registry (SURVEY.md §2.10 R10; reference
api/config/hotreload.py:65-627).

mtime+TTL-checked YAML load with atomic swap and a monotonically
advancing version string. The streaming driver calls ``current()`` at
the top of every micro-batch (foreachBatch), so rule changes apply on
the next trigger without restarting the query — compiled Catalyst
expressions are rebuilt only when the file content version changes.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from dataclasses import dataclass
from typing import Any


@dataclass
class LoadedRules:
    value: Any
    version: str  # "<mtime_ns>-<size>"
    loaded_at: float


class HotReloadRegistry:
    def __init__(
        self,
        path: str,
        loader: Callable[[str], Any],
        ttl_sec: float = 5.0,
        clock: Callable[[], float] = time.time,
    ):
        self._path = path
        self._loader = loader
        self._ttl = ttl_sec
        self._clock = clock
        self._cached: LoadedRules | None = None
        self.reload_count = 0

    def _file_version(self) -> str:
        st = os.stat(self._path)
        return f"{st.st_mtime_ns}-{st.st_size}"

    def current(self) -> LoadedRules:
        now = self._clock()
        cached = self._cached
        if cached is not None and now - cached.loaded_at < self._ttl:
            return cached
        try:
            version = self._file_version()
            if cached is not None and cached.version == version:
                # File unchanged: refresh the TTL clock only — compiled
                # expressions stay as-is (atomic swap not needed).
                self._cached = LoadedRules(cached.value, version, now)
                return self._cached
            value = self._loader(self._path)  # load BEFORE swap
        except Exception:
            if cached is None:
                raise  # first load: nothing to fall back to
            # Half-written or briefly-missing file mid-save: SERVE the
            # old ruleset (don't fail the micro-batch) and retry after
            # the next TTL window — a propagated loader error here would
            # crash the streaming query the registry exists to protect.
            self._cached = LoadedRules(cached.value, cached.version, now)
            return self._cached
        self._cached = LoadedRules(value, version, now)
        self.reload_count += 1
        return self._cached
