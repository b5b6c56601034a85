"""MMR keyphrase selection (SURVEY.md §2.8 T8; reference
api/keyphrases.py:164-188).

Greedy maximal-marginal-relevance: iteratively pick the candidate
maximizing ``alpha*relevance - (1-alpha)*max_sim_to_selected``. The
reference scores relevance with KBIR embeddings; this deterministic
variant uses term frequency for relevance and token-set Jaccard for
similarity, so results are reproducible without models (the embedding
backend plugs into the same signature).

Shape: a grouped Pandas UDF would shuffle; MMR is per-row, so this is
``mapInPandas`` — map-only, Arrow-batched, no shuffle at any scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

ALPHA = 0.65

OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mmr_phrases", ArrayType(StringType())),
    ]
)


def mmr_select(text: str, k: int = 5, alpha: float = ALPHA) -> list[str]:
    """Pure-Python core (shared by the UDF and the golden test)."""
    toks = [t for t in text.lower().split() if len(t) >= 2]
    if not toks:
        return []
    freq: dict[str, int] = {}
    order: list[str] = []
    for t in toks:
        if t not in freq:
            order.append(t)
        freq[t] = freq.get(t, 0) + 1
    n = len(toks)
    rel = {t: freq[t] / n for t in order}
    chars = {t: set(t) for t in order}

    def sim(a: str, b: str) -> float:
        u = chars[a] | chars[b]
        return len(chars[a] & chars[b]) / len(u) if u else 0.0

    selected: list[str] = []
    remaining = list(order)
    while remaining and len(selected) < k:
        best, best_score = None, None
        for c in remaining:  # first-seen order breaks ties deterministically
            div = max((sim(c, s) for s in selected), default=0.0)
            score = alpha * rel[c] - (1 - alpha) * div
            if best_score is None or score > best_score:
                best, best_score = c, score
        selected.append(best)
        remaining.remove(best)
    return selected


def mmr_keyphrases(docs: DataFrame, k: int = 5) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mmr_phrases": [mmr_select(t or "", k) for t in pdf["text"]],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(run, OUT_SCHEMA)
