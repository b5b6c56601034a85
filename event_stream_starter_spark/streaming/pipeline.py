"""The streaming pipeline stages (SURVEY.md §3.1 re-expressed;
§7.2's slice in streaming form).

Each stage is a function (streaming DF → streaming DF / query) reusing
the batch column expressions, so streamed results equal batch results
on the same input — asserted by tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import key_concat, ts_bucket


def with_event_key(df: DataFrame) -> DataFrame:
    """C4 key shape over the events stream (same expression as the batch
    c4_event_key_dedup query)."""
    key = F.substring(
        F.sha2(
            key_concat(
                F.col("user_id").cast("string"),
                F.col("event_type"),
                ts_bucket(F.col("ts")).cast("string"),
            ),
            256,
        ),
        1,
        40,
    )
    return df.withColumn("event_key", key)


def deduped_stream(df: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """D1/D3 streaming dedup: watermark bounds state (ST3 — the
    reference's TTL windows), dropDuplicatesWithinWatermark keeps the
    first arrival per key within it."""
    # NULL-key quarantine: dropDuplicates groups NULLs together, which
    # would collapse all type-less rows into one survivor across keys.
    return (
        df.filter(F.col("event_key").isNotNull())
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_key"])
    )


def heat_counts_stream(df: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """A3 streaming form: tumbling 10-minute event-time windows per
    event_type (the batch query derives trailing 10m/30m sums from these
    buckets; streaming emits the buckets incrementally)."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def topic_counts_stream(df: DataFrame) -> DataFrame:
    """A2 streaming form (SURVEY §3.3: the interactive read becomes a
    lookup into a continuously-updated result table): a RUNNING per-topic
    aggregate in complete mode — state is one row per topic_hash (bounded
    by topic cardinality, not time). Fine while topics stay bounded; the
    100TB/unbounded-topic path is `topic_counts_windowed_stream` +
    `topic_rollup_batch` (watermark-bounded state, update mode)."""
    topic = F.substring(F.sha2((F.col("user_id") % 50).cast("string"), 256), 1, 12)
    return df.groupBy(topic.alias("topic_hash")).agg(
        F.count(F.lit(1)).alias("mention_count"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("entities"),
    )


def topic_counts_windowed_stream(
    df: DataFrame, watermark: str = "30 minutes", window: str = "10 minutes"
) -> DataFrame:
    """A2 scale form (reference worker/jobs/topic_aggregate.py:36-150
    cadence refresh): watermark-bounded tumbling-window per-topic
    aggregate in UPDATE mode. State = topics × windows still inside the
    watermark — bounded by TIME, not by all-time topic cardinality, so
    it survives an unbounded topic space where complete mode cannot.
    Each emitted row is one (window, topic) partial; the A2 running
    totals are derived downstream by `topic_rollup_batch` over the
    last emit per (window, topic) — the keyed-upsert read side (S8).
    Late rows beyond the watermark are dropped (declared ST3 law)."""
    topic = F.substring(F.sha2((F.col("user_id") % 50).cast("string"), 256), 1, 12)
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), topic.alias("topic_hash"))
        .agg(
            F.count(F.lit(1)).alias("mention_count"),
            F.unix_micros(F.max("ts")).alias("last_ts_us"),
            F.array_sort(F.collect_set("event_type")).alias("entities_set"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "topic_hash",
            "mention_count",
            "last_ts_us",
            "entities_set",
        )
    )


def topic_rollup_batch(window_rows: DataFrame) -> DataFrame:
    """Merge windowed topic partials into the A2 per-topic totals
    (mention sum, max ts, sorted entity-set union) — same output shape
    as a2_topic_aggregate. Input must already be last-emit-per-
    (window, topic); in update mode the sink upserts on that key."""
    return window_rows.groupBy("topic_hash").agg(
        F.sum("mention_count").alias("mention_count"),
        F.max("last_ts_us").alias("last_ts_us"),
        F.array_join(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("entities_set")))),
            ",",
        ).alias("entities"),
    )


def sessionized_stream(
    df: DataFrame, gap: str = "30 minutes", watermark: str = "1 minute"
) -> DataFrame:
    """x_sessionize's streaming analog: gap-based session windows via
    `session_window` (state merges adjacent partial sessions as events
    arrive; watermark finalizes a session once no event can extend it).

    Emits one row per closed session in APPEND mode: a session is
    final when the watermark passes its end (last event + gap), the
    exact cutover the batch query's lag+cumsum composition computes
    after the fact. Same output contract as x_sessionize
    (session_start/end = first/last event micros, n_events); the
    ordinal session_no is inherently batch (it numbers a user's full
    history) and is derived downstream if needed. State is bounded by
    open sessions inside the watermark — never by history."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
        )
        .select(
            "user_id",
            "session_start_us",
            "session_end_us",
            "n_events",
            (F.col("session_end_us") - F.col("session_start_us")).alias("duration_us"),
        )
    )


def conversion_join_stream(
    events: DataFrame, horizon_sec: int = 3600, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-STREAM inner join: each click matched to the same user's
    purchases within [click_ts, click_ts + horizon] — the streaming
    form of the forward-as-of/interval conversion queries.

    Both sides carry a watermark and the join condition bounds the
    event-time distance, so Spark can expire state: a click older than
    the watermark minus the horizon can never match a future purchase
    and is dropped from the state store (same for purchases). Without
    the time-bound condition the state would grow forever — that is
    the stream-stream-join contract, not an optimization. Inner-join
    matches emit as soon as both rows have arrived (append mode);
    results equal the batch join over the same rows (parity-tested).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_sec} SECONDS")
        ),
        "inner",
    ).select(
        "click_id",
        "user_id",
        F.unix_micros("click_ts").alias("click_ts_us"),
        "purchase_id",
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        "purchase_value",
    )


def decontaminated_stream(docs: DataFrame, eval_grams: DataFrame, n: int = 13) -> DataFrame:
    """Streaming test-set decontamination, probe half: the
    x_decontaminate expressions as a STATELESS stream.

    Stream-static broadcast join: the eval-gram dim is a static
    DataFrame re-resolved per micro-batch (so a refreshed benchmark
    set is picked up on the next trigger, the S5-S7 dimension
    pattern), and the corpus stream is map-side explode + probe — no
    stream-stream join, no watermark, no state store at all, so
    append mode works and nothing accumulates over an unbounded
    ingest. The per-doc rollup is deliberately NOT a streaming
    aggregation (it would keep a state row per contaminated doc
    forever): a doc's grams all live in its single input row, so the
    rollup is exact per micro-batch — apply ``decontaminate_batch``
    inside foreachBatch. `eval_grams` must have one `gram` column.
    """
    from ..operators.dedup import token_shingles

    g = docs.select("doc_id", "source", token_shingles(F.col("text"), n).alias("g"))
    tr = g.select(
        "doc_id",
        "source",
        F.size("g").alias("n_grams"),
        F.explode("g").alias("gram"),
    )
    return tr.join(F.broadcast(eval_grams.select("gram").distinct()), "gram")


def decontaminate_batch(hits: DataFrame) -> DataFrame:
    """Per-micro-batch rollup of decontaminated_stream output — exact
    because each doc's grams arrive wholly inside one batch. COUNT, not
    COUNT DISTINCT: shingle arrays are array_distinct per doc and the
    dim side is deduplicated, so each (doc, gram) survives the join at
    most once."""
    return (
        hits.groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_hit_grams"),
            F.min("n_grams").alias("n_grams"),
        )
        .withColumn(
            "hit_ratio",
            F.round(F.col("n_hit_grams").cast("double") / F.col("n_grams"), 6),
        )
    )


def refined_stream(
    docs: DataFrame, backend: str = "rules", budget_ms: float | None = None
) -> DataFrame:
    """U4 refinement over a streaming document source through the
    pluggable inference seam (functions/inference.py).

    Stateless map-side shape: mapInPandas runs per micro-batch with no
    state store, so append mode works and nothing accumulates over an
    unbounded ingest — the streaming analog of the reference's per-event
    refine call in the pipeline worker (worker/pipeline/*). The degrade
    ladder (exception/schema/budget → rules fallback, reason-tagged
    columns) applies per Arrow batch exactly as in batch mode, and the
    executor-local TTL memo means a hot topic's repeated evidence text
    inside the memo window skips the model on whichever worker has seen
    it (a best-effort cache, not a correctness mechanism: results are
    deterministic per text either way).
    """
    from ..functions import inference as I

    kwargs = {} if budget_ms is None else {"budget_ms": budget_ms}
    return I.refine_with_backend(docs, "text", ["doc_id"], backend=backend, **kwargs)


def run_to_completion(stream_df: DataFrame, sink_writer, checkpoint_dir: str) -> None:
    """Drain all available input through foreachBatch (availableNow — the
    batch-parity test harness; production uses trigger(processingTime))."""
    q = (
        stream_df.writeStream.foreachBatch(sink_writer)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory_table(
    stream_df: DataFrame, table_name: str, checkpoint_dir: str, output_mode: str
) -> None:
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def lm_scored_stream(
    docs: DataFrame, model: DataFrame, langstats: DataFrame
) -> DataFrame:
    """Streaming CCNet-style LM scoring, probe half: explode each
    incoming doc's char trigrams and join the STATIC model (the
    x_ccnet_lm_buckets / x_dsir_select trigram table — bounded, built
    in batch, broadcast per micro-batch like every S5-S7 dimension).

    Stateless: a doc's grams all live in its single input row, so the
    per-doc score rollup is exact per micro-batch — apply
    ``lm_score_batch`` inside foreachBatch (same split as
    decontaminated_stream / decontaminate_batch; a streaming
    aggregation here would pin a state row per doc forever).

    `model` columns: (lang, g, p). `langstats`: (lang, n, v) for the
    UNK mass 1/(n+v).
    """
    nt = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    base = docs.select("doc_id", "lang", nt.alias("nt"))
    grams = F.expr(
        "transform(sequence(1, greatest(length(nt) - 2, 1)),"
        " i -> substring(nt, i, 3))"
    )
    ex = base.select("doc_id", "lang", F.explode(grams).alias("g"))
    return (
        ex.join(F.broadcast(model), ["lang", "g"], "left")
        .join(F.broadcast(langstats), ["lang"], "left")
    )


def lm_score_batch(joined: DataFrame) -> DataFrame:
    """Per-micro-batch rollup of lm_scored_stream output: the same
    order-independent decimal-summed nll law as the batch query."""
    p_eff = (
        F.when(F.col("p").isNotNull(), F.col("p"))
        .when(
            F.col("n").isNotNull(),
            F.lit(1.0) / (F.col("n") + F.col("v")).cast("double"),
        )
        .otherwise(F.lit(1.0))
    )
    return (
        joined.groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.round(-F.log(p_eff), 7).cast("decimal(28,9)"))
            .cast("double")
            .alias("s"),
        )
        .select(
            "doc_id",
            "lang",
            "n_grams",
            (F.round(F.col("s") / F.col("n_grams"), 6) + 0).alias("nll"),
        )
    )
