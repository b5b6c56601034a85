"""Content hashing / keying expressions.

Reference semantics: api/events.py:175-184 (_ts_bucket), 313-341
(_compute_topic_hash), 414-528 (make_event_key v1/v2);
worker/jobs/x_kol_poll.py:82-86 (fingerprint);
api/services/topic_analyzer.py:144-147 (topic_id).

Hash-function policy: the engine standardizes on SHA-256 (Spark ``sha2``)
for all content hashes. The reference mixes sha256/blake2s/sha1; the new
engine declares sha256 as its hash and keeps the *shape* (input concat
order, separators, truncation lengths) identical, which preserves all
dedup/keying semantics. This is a documented divergence, not a bug.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = "|"
DEFAULT_BUCKET_SEC = 600  # reference env EVENT_TIME_BUCKET_SEC default


def ts_bucket(ts: Column, bucket_sec: int = DEFAULT_BUCKET_SEC) -> Column:
    """Epoch floor-div bucket (seconds). Reference: api/events.py:175-184."""
    return (F.floor(ts.cast("long") / bucket_sec) * bucket_sec).cast("long")


def _sha256_40(c: Column) -> Column:
    return F.substring(F.sha2(c, 256), 1, 40)


def key_concat(*cols: Column) -> Column:
    """NULL-STRICT '|'-joined key input: any NULL field nulls the whole
    key (F.concat propagates NULL; concat_ws silently SKIPS null fields,
    which would key a type-less row into the wrong dedup group while
    the SQL oracles' `||` chains null-propagate). A NULL key is the
    engine analog of the reference's make_event_key ValueError on a
    missing type (api/events.py:414-436): the row is quarantined by
    key-nullability instead of raising mid-job. Keyed CONSUMERS must
    filter `key IS NOT NULL` before grouping/deduping — SQL groups
    NULLs together, so an unfiltered NULL key would collapse every
    type-less row across users into one group (the query surfaces and
    deduped_stream apply this filter).

    The explicit-default builders below (event_key_v1/v2, fingerprint)
    intentionally coalesce OPTIONAL fields to '' first — this helper is
    for ad-hoc keys whose every field is REQUIRED.
    """
    parts: list[Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(SEP))
        parts.append(c)
    return F.concat(*parts)


def event_key_v1(
    event_type: Column,
    symbol: Column,
    token_ca: Column,
    text_norm: Column,
    ts: Column,
    bucket_sec: int = DEFAULT_BUCKET_SEC,
    salt: str = "",
) -> Column:
    """v1 event key: sha256(type|SYMBOL|token_ca|text_norm|bucket|salt)[:40].

    Reference: api/events.py:414-528 (bucket 494-497, v1 498-502).
    """
    return _sha256_40(
        F.concat_ws(
            SEP,
            F.coalesce(event_type, F.lit("")),
            F.upper(F.coalesce(symbol, F.lit(""))),
            F.coalesce(token_ca, F.lit("")),
            F.coalesce(text_norm, F.lit("")),
            ts_bucket(ts, bucket_sec).cast("string"),
            F.lit(salt),
        )
    )


def event_key_v2(
    event_type: Column,
    symbol: Column,
    token_ca: Column,
    chain_id: Column,
    topic_hash_col: Column,
    text_norm: Column,
    ts: Column,
    bucket_sec: int = DEFAULT_BUCKET_SEC,
) -> Column:
    """v2 event key: identity = token_ca else symbol|chain_id; then
    sha256('v2'|type|identity|topic_hash|bucket|text_sig)[:40] with
    text_sig = sha256(text_norm)[:16].

    Reference: api/events.py:503-514 (keyed blake2s → declared sha256).
    """
    identity = F.coalesce(
        token_ca,
        F.concat_ws(
            SEP, F.coalesce(symbol, F.lit("")), F.coalesce(chain_id, F.lit(""))
        ),
    )
    text_sig = F.substring(F.sha2(F.coalesce(text_norm, F.lit("")), 256), 1, 16)
    return _sha256_40(
        F.concat_ws(
            SEP,
            F.lit("v2"),
            F.coalesce(event_type, F.lit("")),
            identity,
            F.coalesce(topic_hash_col, F.lit("none")),
            ts_bucket(ts, bucket_sec).cast("string"),
            text_sig,
        )
    )


def topic_hash(keywords: Column) -> Column:
    """sha256('||'.join(sorted(keywords)))[:12]; empty/null keywords hash
    the CONTENT string 'none' (the reference hashes "none", it does not
    emit the literal — api/events.py:324-329), so the output is always
    12 hex chars.

    Reference: api/events.py:313-341 (_compute_topic_hash, blake2s → sha256).
    """
    content = F.when(
        keywords.isNull() | (F.size(keywords) == 0), F.lit("none")
    ).otherwise(F.array_join(F.array_sort(keywords), "||"))
    return F.substring(F.sha2(content, 256), 1, 12)


def topic_id(entities: Column) -> Column:
    """'t.' + sha256('|'.join(sorted(lower(entities))))[:12].

    Reference: api/services/topic_analyzer.py:144-147 (sha1 → sha256).
    """
    joined = F.array_join(
        F.array_sort(F.transform(entities, lambda e: F.lower(e))), SEP
    )
    return F.concat(F.lit("t."), F.substring(F.sha2(joined, 256), 1, 12))


def fingerprint(source: Column, author: Column, ts: Column, text: Column) -> Column:
    """Soft-dedup fingerprint: sha256(source|author|epoch_sec|text[:30])[:40].

    Reference: worker/jobs/x_kol_poll.py:82-86 (sha1 → sha256[:40]).
    """
    return _sha256_40(
        F.concat_ws(
            SEP,
            F.coalesce(source, F.lit("")),
            F.coalesce(author, F.lit("")),
            ts.cast("long").cast("string"),
            F.substring(F.coalesce(text, F.lit("")), 1, 30),
        )
    )
