"""event_stream_starter_spark — a PySpark-native event-stream analytics engine.

A brand-new DataFrame/SQL/Structured-Streaming engine with the query and
data-processing capabilities of the reference event-stream processor
(Tracy625/event-stream-starter): normalize → filter → dedup → keyed
aggregate → enrich → rules-score → state machine → topic/heat analytics →
outbox delivery — re-expressed as declarative Catalyst plans.

Design rules (see SURVEY.md):
- DataFrame/SQL first; Catalyst picks physical strategy.
- Event-time everywhere; `now` is an injected parameter, never wall-clock.
- No row-at-a-time Python UDFs on hot paths; Arrow/pandas UDFs only where
  built-ins genuinely cannot express the semantics.
- Every deterministic operator is oracle-checkable (DuckDB-expressible).
"""

__version__ = "0.1.0"
