"""Dimension sources: provider snapshots with stale-while-revalidate
semantics (SURVEY.md §2.1 S5-S7, §4 SWR cache)."""

from .dimensions import DimensionCache, DimensionSnapshot

__all__ = ["DimensionCache", "DimensionSnapshot"]
