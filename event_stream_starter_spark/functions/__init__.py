"""Column-returning scalar helpers (SURVEY.md §2.3 C1-C17).

Every function here returns a ``pyspark.sql.Column`` built from JVM-side
built-ins — no Python UDFs — so they stay inside whole-stage codegen and
are expressible as ANSI SQL for the DuckDB oracle.
"""

from .hashing import (
    event_key_v1,
    event_key_v2,
    fingerprint,
    topic_hash,
    topic_id,
    ts_bucket,
)
from .normalize import (
    normalize_ca,
    normalize_text,
    normalize_token_symbol,
    normalize_url,
)
from .scoring import (
    candidate_score,
    clamp,
    clamp01,
    lexicon_sentiment_label,
    lexicon_sentiment_score,
    quantize3,
)

__all__ = [
    "event_key_v1",
    "event_key_v2",
    "fingerprint",
    "topic_hash",
    "topic_id",
    "ts_bucket",
    "normalize_ca",
    "normalize_text",
    "normalize_token_symbol",
    "normalize_url",
    "candidate_score",
    "clamp",
    "clamp01",
    "lexicon_sentiment_label",
    "lexicon_sentiment_score",
    "quantize3",
]
