"""Structured Streaming shell (SURVEY.md §2.11 ST1-ST9, §2.1 S1-S11).

The reference is a hand-rolled micro-batch engine (Celery beat jobs on
20s-15min cadences, worker/celeryconfig.py:17-40); this package is the
idiomatic Spark equivalent: one streaming query per stage with
``trigger(processingTime=...)``, checkpointed offsets as the cursor,
watermarks as the staleness windows, and ``foreachBatch`` MERGE for the
keyed upsert sinks.

Batch/stream parity: every stage reuses the SAME column expressions as
the batch queries in ``..queries`` — the tests assert a streamed run over
the sf0.001 events parquet produces byte-identical results to the batch
plan.
"""
