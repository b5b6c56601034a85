"""Outbox + retry/backoff + DLQ semantics (SURVEY.md §2.1 S9-S10,
§2.11 ST6; reference worker/jobs/outbox_retry.py:17-313,
api/db/repositories/outbox_repo.py).

The reference claims due rows with ``FOR UPDATE SKIP LOCKED``; in Spark
each micro-batch owns its partition of the outbox exclusively, so the
claim protocol disappears — what remains are the POLICIES, expressed as
pure column expressions so they are testable and oracle-checkable:

- due:        status IN (pending, retry) AND next_try_at <= now
- order:      next_try_at NULLS FIRST, created_at  (T7)
- backoff:    429 → Retry-After; 5xx → min(2^attempt, 600) ±30% jitter;
              other → min(2·2^attempt, 300) ±20% jitter
- DLQ:        attempt >= 20 OR permanent 4xx
- recovery:   DLQ rows younger than max-age re-queued
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_ATTEMPTS = 20
CAP_5XX_SEC = 600
CAP_OTHER_SEC = 300


def due_filter(now: Column) -> Column:
    """outbox_repo.py:73-81 fetch_due predicate."""
    return F.col("status").isin("pending", "retry") & (
        F.col("next_try_at").isNull() | (F.col("next_try_at") <= now)
    )


def delivery_order(df: DataFrame, limit: int = 50) -> DataFrame:
    """T7: COALESCE(next_try_at, 'now') NULLS FIRST, created_at ASC LIMIT."""
    return df.orderBy(
        F.col("next_try_at").asc_nulls_first(),
        F.col("created_at").asc(),
        F.col("id").asc(),
    ).limit(limit)


def _jitter(seed: Column, spread: float) -> Column:
    """Deterministic ±spread jitter in [1-spread, 1+spread], derived from
    a hash of the row key (the reference uses random.uniform; the engine
    uses keyed jitter so retries stay reproducible and testable)."""
    frac = (F.pmod(F.xxhash64(seed), F.lit(10000)) / 10000.0)
    return F.lit(1.0 - spread) + frac * F.lit(2 * spread)


def backoff_seconds(attempt: Column, status_code: Column, retry_after: Column, key: Column) -> Column:
    """ST6 backoff policy → seconds until next try (outbox_retry.py:247-313).

    429 without a Retry-After header gets the reference's SHORT delay
    (uniform 1-3s there; keyed-deterministic 1-3s here), not the
    moderate exponential branch — rate limits clear quickly."""
    exp_5xx = F.least(F.pow(F.lit(2.0), attempt.cast("double")), F.lit(float(CAP_5XX_SEC)))
    exp_other = F.least(
        F.lit(2.0) * F.pow(F.lit(2.0), attempt.cast("double")), F.lit(float(CAP_OTHER_SEC))
    )
    short_429 = F.lit(2.0) * _jitter(key, 0.50)  # [1, 3] sec, keyed
    return (
        F.when((status_code == 429) & retry_after.isNotNull(), retry_after.cast("double"))
        .when(status_code == 429, short_429)
        .when((status_code >= 500), exp_5xx * _jitter(key, 0.30))
        .otherwise(exp_other * _jitter(key, 0.20))
    )


def is_permanent_4xx(status_code: Column) -> Column:
    """Permanent client errors skip retries → DLQ (outbox_retry.py:292-313).
    429 is retryable, and so are 408 (Request Timeout), 423 (Locked) and
    425 (Too Early) — the reference's transient-4xx exemptions; everything
    else in [400, 500) is permanent."""
    return (
        (status_code >= 400)
        & (status_code < 500)
        & ~status_code.isin(429, 408, 423, 425)
    )


def apply_delivery_result(
    df: DataFrame, now: Column
) -> DataFrame:
    """Fold one delivery attempt's result columns (ok, status_code,
    retry_after) into the next outbox state: done / retry(next_try_at) /
    dlq. Pure column logic — the actual send happens in the foreachBatch
    sink; this is the state transition that follows it."""
    attempt = F.col("attempt") + 1
    to_dlq = (~F.col("ok")) & (
        (attempt >= MAX_ATTEMPTS) | is_permanent_4xx(F.col("status_code"))
    )
    delay = backoff_seconds(attempt, F.col("status_code"), F.col("retry_after"), F.col("event_key"))
    return df.select(
        "id",
        "event_key",
        "payload_json",
        "created_at",
        attempt.alias("attempt"),
        F.when(F.col("ok"), F.lit("done"))
        .when(to_dlq, F.lit("dlq"))
        .otherwise(F.lit("retry"))
        .alias("status"),
        F.when(F.col("ok") | to_dlq, F.lit(None).cast("timestamp"))
        .otherwise(
            F.timestamp_seconds(F.unix_timestamp(now) + delay.cast("long"))
        )
        .alias("next_try_at"),
        F.when(F.col("ok"), F.lit(None)).otherwise(
            F.concat(F.lit("http_"), F.col("status_code").cast("string"))
        ).alias("last_error"),
    )


# The snapshot column carries the whole outbox row as JSON (the
# reference's push_outbox_dlq.snapshot JSONB, DATABASE.md:561-568), so
# recovery never needs the original outbox row to still exist.
_SNAPSHOT_SCHEMA = (
    "id long, event_key string, payload_json string, "
    "created_at timestamp, attempt int, last_error string"
)


def to_dlq_rows(delivered: DataFrame, now: Column) -> DataFrame:
    """Project the status='dlq' outcomes of :func:`apply_delivery_result`
    into the PUSH_OUTBOX_DLQ table shape (schemas.PUSH_OUTBOX_DLQ):
    ``(id, ref_id, snapshot, failed_at)`` — this is the frame
    :func:`dlq_recover` consumes, keeping the module's producer and
    consumer schemas provably consistent (round-tripped in tests)."""
    dlq = delivered.filter(F.col("status") == "dlq")
    return dlq.select(
        F.col("id"),
        F.col("id").alias("ref_id"),
        F.to_json(
            F.struct(
                "id", "event_key", "payload_json", "created_at", "attempt", "last_error"
            )
        ).alias("snapshot"),
        now.alias("failed_at"),
    )


def dlq_recover(dlq: DataFrame, now: Column, max_age_sec: int = 3600) -> DataFrame:
    """S10: re-queue DLQ rows younger than max-age; older rows discarded
    (worker/jobs/outbox_dlq_recover.py:31-60). Input is the
    PUSH_OUTBOX_DLQ shape written by :func:`to_dlq_rows`; the outbox row
    is reconstructed from the JSON snapshot with attempt reset."""
    young = dlq.filter(
        F.col("failed_at") >= F.timestamp_seconds(F.unix_timestamp(now) - max_age_sec)
    )
    snap = F.from_json(F.col("snapshot"), _SNAPSHOT_SCHEMA)
    return young.select(
        snap["id"].alias("id"),
        snap["event_key"].alias("event_key"),
        snap["payload_json"].alias("payload_json"),
        snap["created_at"].alias("created_at"),
        F.lit(0).alias("attempt"),
        F.lit("retry").alias("status"),
        F.lit(None).cast("timestamp").alias("next_try_at"),
        F.lit(None).cast("string").alias("last_error"),
    )
