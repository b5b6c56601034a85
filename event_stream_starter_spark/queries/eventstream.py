"""Event-stream queries over the `events` table (SURVEY.md §2.3 hashing,
§2.4 dedup, §2.5 A2-A4 aggregation, §2.6 time-series W2-W7, §2.9 set ops).

These are the batch (oracle-checkable) forms of the streaming pipeline
stages; the streaming shell reuses the same column expressions.

`now` is always derived from the data (max ts) — never wall-clock —
per SURVEY §7.4 determinism rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import fingerprint, key_concat, ts_bucket
from ..operators.dedup import exact_dedup
from ..io import load_table
from ..operators import certs
from ..operators.windows import ema_last, growth_ratio, latest_per_key, slope_trend
from . import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@query(
    "c4_event_key_dedup",
    """
    WITH keyed AS (
        SELECT event_id,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               user_id, event_type, value,
               substring(sha256(CAST(user_id AS VARCHAR) || '|' || event_type || '|' ||
                         CAST(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS VARCHAR)), 1, 40)
                   AS event_key
        FROM events
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_key
                                     ORDER BY ts_us ASC, event_id ASC) AS rn
        FROM keyed WHERE event_key IS NOT NULL
    )
    SELECT event_id, ts_us, user_id, event_type, event_key
    FROM ranked WHERE rn = 1
    """,
    survey_ids="C4,C6 (event key + ts bucket), D1/D3 (keyed dedup keep-first)",
)
def c4_event_key_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # Event key: sha256(user|type|10-min bucket)[:40] — the C4 key shape
    # over the driver's events table (FIXTURES.md §B mapping).
    # key_concat, not concat_ws: a NULL event_type must NULL the key
    # (quarantine), matching the oracle's null-propagating || chain and
    # the reference's make_event_key ValueError on a missing type.
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
    keyed = ev.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        key.alias("event_key"),
    )
    # QUARANTINE before the keyed dedup: a NULL key must not join the
    # partitioning (grouping NULLs together would collapse every
    # type-less row ACROSS users into one group — worse than keeping
    # them); keyed consumers exclude NULL keys, a quarantine sink owns
    # them.
    keyed = keyed.filter(F.col("event_key").isNotNull())
    # ONE survivor-selection law for the whole engine: the shared
    # operator (also used by d2_fingerprint_dedup and the e2e trace), so
    # a tiebreak change cannot silently fork this query's semantics.
    from ..operators.dedup import exact_dedup

    return exact_dedup(keyed, ["event_key"], "ts_us", tiebreak=["event_id"])


@query(
    "a1_event_upsert_merge",
    """
    SELECT substring(sha256(CAST(user_id AS VARCHAR) || '|' || event_type), 1, 40) AS event_key,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS start_ts_us,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS last_ts_us,
           COUNT(*) AS evidence_count,
           ROUND(MAX(value), 6) AS max_weight,
           (max(struct_pack(ts := ts, v := value))).v AS last_value
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY substring(sha256(CAST(user_id AS VARCHAR) || '|' || event_type), 1, 40)
    """,
    survey_ids="A1 (keyed upsert-merge laws: greatest last_ts, evidence count, last non-null)",
)
def a1_event_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    key = F.substring(
        F.sha2(key_concat(F.col("user_id").cast("string"), F.col("event_type")), 256),
        1,
        40,
    )
    ev = ev.filter(F.col("event_type").isNotNull())  # NULL-key quarantine
    # Batch form of the streaming keyed upsert (reference api/events.py:
    # 1139-1256): last_ts = greatest(old,new) ≡ max(ts); evidence_count;
    # "replace with latest" ≡ lexicographic struct-max on (ts, value) —
    # NOT max_by(value, ts), which is nondeterministic when two rows
    # share a timestamp (at-least-once replay makes that reachable);
    # ties break toward the larger value in both engines. One shuffle.
    return ev.groupBy(key.alias("event_key")).agg(
        F.unix_micros(F.min("ts")).alias("start_ts_us"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
        F.count(F.lit(1)).alias("evidence_count"),
        F.round(F.max("value"), 6).alias("max_weight"),
        F.max(F.struct(F.col("ts"), F.col("value").alias("v")))["v"].alias(
            "last_value"
        ),
    )


@query(
    "d4_evidence_merge",
    """
    WITH ranked AS (
        SELECT user_id, event_type, ts, value, props,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY len(props) DESC, props DESC) AS rn
        FROM events
    ), agg AS (
        SELECT user_id, event_type,
               CAST(epoch_us(MIN(ts)) AS BIGINT) AS first_ts_us,
               ROUND(MAX(value), 6) AS max_weight,
               COUNT(*) AS merged_count
        FROM events GROUP BY user_id, event_type
    )
    SELECT a.user_id, a.event_type, a.first_ts_us, a.max_weight,
           r.props AS longest_summary, a.merged_count
    FROM agg a JOIN ranked r
      ON a.user_id = r.user_id AND a.event_type = r.event_type AND r.rn = 1
    """,
    survey_ids="D4 (evidence merge-dedup laws: earliest ts, max weight, longest summary)",
)
def d4_evidence_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The D4 merge laws live in ONE place — operators/dedup.evidence_merge
    # (one shuffle; struct-max argmax-by-length with deterministic
    # lexicographic tiebreak, reference api/events.py:682-875); this query
    # only adapts column names/units for the oracle.
    from ..operators.dedup import evidence_merge

    ev = _events(spark, sf_dir)
    merged = evidence_merge(ev, ["user_id", "event_type"], "ts", "value", "props")
    return merged.select(
        "user_id",
        "event_type",
        F.unix_micros("first_ts").alias("first_ts_us"),
        F.round("max_weight", 6).alias("max_weight"),
        "longest_summary",
        "merged_count",
    )


def _d4_keyed_fragments(dialect: str) -> dict[str, str]:
    """Dual-dialect column fragments for D4 per-source dedup keys.

    Synthesizes a deterministic evidence frame from `events` (source +
    typed ref fields), then derives the dedup key with the reference's
    per-source rules (api/events.py:531-586):
      x: tweet_id → 'x:{tid}'; else /status/<id> from the url; else the url
      dex: tx → 'dex:{tx}'; else 'dex:{chain}:{pool}:{600s-bucket}'
      goplus: 'gp:{endpoint|na}|{chain|na}|{address|na}'
      default: sha of source + sorted-key ref JSON (sha1→sha256
      substitution, same declared policy as C5)
    One template, two dialects — the branch structure provably matches.
    """
    if dialect == "duckdb":
        st, sha = "VARCHAR", "sha256({})"
        bucket = "CAST((epoch_us(ts) // 1000000 // 600) * 600 AS VARCHAR)"
    else:
        st, sha = "STRING", "sha2({}, 256)"
        bucket = "CAST((unix_micros(ts) div 1000000 div 600) * 600 AS STRING)"
    src = (
        "CASE event_type WHEN 'click' THEN 'x' WHEN 'error' THEN 'x' "
        "WHEN 'view' THEN 'dex' WHEN 'purchase' THEN 'goplus' "
        "ELSE 'other' END"
    )
    f = {
        "source": src,
        "tweet_id": (
            f"CASE WHEN event_type = 'click' AND event_id % 3 <> 0 "
            f"THEN CAST(event_id % 1000 AS {st}) ELSE '' END"
        ),
        "url": (
            f"CASE WHEN {src} = 'x' THEN "
            f"  CASE WHEN event_id % 2 = 0 "
            f"       THEN 'https://x.com/u/status/' || CAST(event_id % 500 AS {st}) "
            f"       ELSE 'https://example.com/p/' || CAST(event_id % 100 AS {st}) END "
            f"WHEN {src} = 'other' "
            f"THEN 'https://example.com/d/' || CAST(event_id % 80 AS {st}) "
            f"ELSE '' END"
        ),
        "tx": (
            f"CASE WHEN {src} = 'dex' AND event_id % 4 <> 0 "
            f"THEN 'tx' || CAST(event_id % 300 AS {st}) ELSE '' END"
        ),
        "chain_id": (
            f"CASE WHEN {src} IN ('dex', 'goplus') "
            f"THEN CAST(user_id % 5 AS {st}) ELSE '' END"
        ),
        "pool": (
            f"CASE WHEN {src} = 'dex' "
            f"THEN 'p' || CAST(event_id % 7 AS {st}) ELSE '' END"
        ),
        "endpoint": (
            f"CASE WHEN {src} = 'goplus' AND event_id % 2 = 0 "
            f"THEN 'token_security' ELSE '' END"
        ),
        "address": (
            f"CASE WHEN {src} = 'goplus' "
            f"THEN '0x' || CAST(user_id % 50 AS {st}) ELSE '' END"
        ),
    }
    status_id = r"regexp_extract(url, '/status(?:es)?/([0-9]+)', 1)"
    f["dedup_key"] = (
        "CASE source "
        "WHEN 'x' THEN CASE WHEN tweet_id <> '' THEN 'x:' || tweet_id "
        f"    WHEN {status_id} <> '' THEN 'x:' || {status_id} "
        "    ELSE 'x:' || url END "
        "WHEN 'dex' THEN CASE WHEN tx <> '' THEN 'dex:' || tx "
        "    ELSE 'dex:' || CASE WHEN chain_id = '' THEN 'na' ELSE chain_id END "
        f"        || ':' || CASE WHEN pool = '' THEN 'na' ELSE pool END "
        f"        || ':' || {bucket} END "
        "WHEN 'goplus' THEN "
        "    'gp:' || CASE WHEN endpoint = '' THEN 'na' ELSE endpoint END "
        "    || '|' || CASE WHEN chain_id = '' THEN 'na' ELSE chain_id END "
        "    || '|' || CASE WHEN address = '' THEN 'na' ELSE address END "
        + "ELSE " + sha.format("source || '|{\"url\":\"' || url || '\"}'") + " END"
    )
    return f


_D4_REF_FIELDS = ("address", "chain_id", "endpoint", "pool", "tweet_id", "tx", "url")


def _d4_source_oracle() -> str:
    f = _d4_keyed_fragments("duckdb")
    ref_proj = ",\n               ".join(
        f"{f[c]} AS {c}" for c in ("source",) + _D4_REF_FIELDS
    )
    merged = ",\n           ".join(
        f"COALESCE(FIRST({c} ORDER BY ts, event_id) FILTER (WHERE {c} <> ''), '')"
        f" AS m_{c}"
        for c in _D4_REF_FIELDS
    )
    frags = ", ".join(
        f"CASE WHEN m_{c} <> '' THEN '\"{c}\":\"' || m_{c} || '\"' END"
        for c in _D4_REF_FIELDS
    )
    return f"""
    WITH ref AS (
        SELECT event_id, user_id, event_type, ts, value, props,
               {ref_proj}
        FROM events
    ), keyed AS (
        SELECT *, {f["dedup_key"]} AS dedup_key FROM ref
    ), m AS (
        SELECT dedup_key,
           MIN(source) AS source,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS first_ts_us,
           ROUND(MAX(value), 6) AS max_weight,
           FIRST(props ORDER BY len(props) DESC, props DESC) AS longest_summary,
           COUNT(*) AS merged_count,
           {merged}
        FROM keyed GROUP BY dedup_key
    )
    SELECT dedup_key, source, first_ts_us, max_weight, longest_summary,
           merged_count,
           '{{' || COALESCE(array_to_string(
               list_filter([{frags}], x -> x IS NOT NULL), ','), '') || '}}'
               AS ref_json
    FROM m
    """


@query(
    "d4_source_dedup_keys",
    None,  # patched at import end (template-generated dual-dialect SQL)
    survey_ids=(
        "D4 full fidelity: per-source dedup-key derivation (x tweet_id/url, "
        "dex tx/(chain,pool,ts_bucket), goplus endpoint|chain|address, "
        "default ref-hash) + ref-union merge preferring non-empty fields"
    ),
)
def d4_source_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference api/events.py:531-586 (_make_evidence_dedup_key) and
    682-875 (merge_event_evidence strict mode): derive the per-source
    dedup key, then merge each key's evidence — earliest ts, max weight,
    longest summary (deterministic tiebreak, declared), and the ref
    union preferring the first non-empty value per field, serialized as
    sorted-key JSON. One shuffle on dedup_key; the key derivation is a
    map-side projection inside whole-stage codegen."""
    from ..operators.dedup import first_nonempty

    f = _d4_keyed_fragments("spark")
    ev = _events(spark, sf_dir)
    keyed = ev.selectExpr(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        "value",
        "props",
        *[f"{f[c]} AS {c}" for c in ("source",) + _D4_REF_FIELDS],
    ).selectExpr("*", f"{f['dedup_key']} AS dedup_key")
    m = keyed.groupBy("dedup_key").agg(
        F.min("source").alias("source"),
        F.unix_micros(F.min("ts")).alias("first_ts_us"),
        F.round(F.max("value"), 6).alias("max_weight"),
        F.max(F.struct(F.length("props").alias("l"), F.col("props").alias("v")))[
            "v"
        ].alias("longest_summary"),
        F.count(F.lit(1)).alias("merged_count"),
        *[
            first_nonempty(c, ["ts", "event_id"]).alias(f"m_{c}")
            for c in _D4_REF_FIELDS
        ],
    )
    frags = F.array(
        *[
            F.when(
                F.col(f"m_{c}") != "",
                F.concat(F.lit(f'"{c}":"'), F.col(f"m_{c}"), F.lit('"')),
            )
            for c in _D4_REF_FIELDS
        ]
    )
    return m.select(
        "dedup_key",
        "source",
        "first_ts_us",
        "max_weight",
        "longest_summary",
        "merged_count",
        F.concat(
            F.lit("{"),
            F.array_join(F.filter(frags, lambda x: x.isNotNull()), ","),
            F.lit("}"),
        ).alias("ref_json"),
    )


@query(
    "d4_dedup_keys_urlnorm",
    """
    WITH keyed AS (
        SELECT event_id, ts, value,
               CASE event_id % 4
                 WHEN 0 THEN 'http://Example.com/p/' || CAST(event_id % 9 AS VARCHAR)
                             || '/?utm_source=t&b=2&A=1'
                 WHEN 1 THEN 'https://example.com:443/p/' || CAST(event_id % 9 AS VARCHAR)
                             || '?A=1&b=2&ref=x'
                 WHEN 2 THEN 'https://BÜcher.example/bücher/'
                             || CAST(event_id % 9 AS VARCHAR) || '/'
                 ELSE 'https://x.com/u/status/' || CAST(event_id % 500 AS VARCHAR)
                      || '?utm_source=z'
               END AS raw_url,
               CASE WHEN event_id % 4 = 3
                    THEN 'x:' || CAST(event_id % 500 AS VARCHAR)
                    WHEN event_id % 4 = 2
                    THEN 'x:https://xn--bcher-kva.example/bücher/'
                         || CAST(event_id % 9 AS VARCHAR)
                    ELSE 'x:https://example.com/p/' || CAST(event_id % 9 AS VARCHAR)
                         || '?a=1&b=2'
               END AS dedup_key
        FROM events
    )
    SELECT dedup_key,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS first_ts_us,
           ROUND(MAX(value), 6) AS max_weight,
           COUNT(DISTINCT raw_url) AS n_raw_variants,
           COUNT(*) AS merged_count
    FROM keyed
    GROUP BY dedup_key
    """,
    survey_ids=(
        "D4 full-fidelity URL dedup keys: the x-source key falls back to "
        "the PARSED canonical URL (C2 normalize_url_full — IDN punycode, "
        "default-port drop, tuple param sort) exactly as the reference "
        "keys evidence on _normalize_url (api/events.py:531-586 + 123-173)"
    ),
)
def d4_dedup_keys_urlnorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 evidence keying through the full C2 parser path — the consumer
    of normalize_url_full: raw variants that differ in scheme, host case,
    default port, tracking params, param order, trailing slashes or IDN
    encoding must collapse to ONE dedup key (n_raw_variants shows the
    collapse: the example.com keys merge two distinct raw spellings).
    The oracle states the expected canonical key per synthesized shape
    as hand-derived literals (independent of both implementations), the
    same certification pattern as c2_url_normalize_full. The moduli (9,
    4) are coprime so every (target, spelling-variant) pair occurs and
    cross-variant collapse is actually exercised. Plan shape: the UDF is
    one Arrow-batched projection; one shuffle on the canonical key."""
    from ..functions.normalize import normalize_url_full

    ev = _events(spark, sf_dir)
    n = (F.col("event_id") % 9).cast("string")
    variant = F.col("event_id") % 4
    raw_url = (
        F.when(
            variant == 0,
            F.concat(F.lit("http://Example.com/p/"), n, F.lit("/?utm_source=t&b=2&A=1")),
        )
        .when(
            variant == 1,
            F.concat(F.lit("https://example.com:443/p/"), n, F.lit("?A=1&b=2&ref=x")),
        )
        .when(
            variant == 2,
            F.concat(
                F.lit("https://BÜcher.example/bücher/"), n, F.lit("/")
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://x.com/u/status/"),
                (F.col("event_id") % 500).cast("string"),
                F.lit("?utm_source=z"),
            )
        )
    )
    keyed = ev.select(
        "ts", "value", raw_url.alias("raw_url")
    ).withColumn("url_norm", normalize_url_full(F.col("raw_url")))
    status_id = F.regexp_extract("url_norm", r"/status(?:es)?/([0-9]+)", 1)
    key = F.when(status_id != "", F.concat(F.lit("x:"), status_id)).otherwise(
        F.concat(F.lit("x:"), F.col("url_norm"))
    )
    return keyed.groupBy(key.alias("dedup_key")).agg(
        F.unix_micros(F.min("ts")).alias("first_ts_us"),
        F.round(F.max("value"), 6).alias("max_weight"),
        F.countDistinct("raw_url").alias("n_raw_variants"),
        F.count(F.lit(1)).alias("merged_count"),
    )


@query(
    "a2_topic_aggregate",
    """
    WITH topics AS (
        SELECT substring(sha256(CAST(user_id % 50 AS VARCHAR)), 1, 12) AS topic_hash,
               event_type, ts
        FROM events
    )
    SELECT topic_hash,
           COUNT(*) AS mention_count,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS last_ts_us,
           array_to_string(list_sort(list_distinct(list(event_type))), ',') AS entities
    FROM topics
    GROUP BY topic_hash
    """,
    survey_ids="A2 (topic aggregation: count, max ts, entity set union+sort), E1, C7",
)
def a2_topic_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    topic = F.substring(F.sha2((F.col("user_id") % 50).cast("string"), 256), 1, 12)
    return ev.groupBy(topic.alias("topic_hash")).agg(
        F.count(F.lit(1)).alias("mention_count"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("entities"),
    )


@query(
    "a3_w5_heat_slope",
    """
    WITH now_t AS (SELECT MAX(ts) AS now_ts FROM events),
    counts AS (
        SELECT e.event_type,
               CAST(SUM(CASE WHEN e.ts >= n.now_ts - INTERVAL 10 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS cnt_10m,
               CAST(SUM(CASE WHEN e.ts >= n.now_ts - INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS cnt_30m,
               CAST(SUM(CASE WHEN e.ts >= n.now_ts - INTERVAL 20 MINUTE
                         AND e.ts < n.now_ts - INTERVAL 10 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS prev_10m
        FROM events e CROSS JOIN now_t n
        GROUP BY e.event_type
    )
    SELECT event_type, cnt_10m, cnt_30m, prev_10m,
           CASE WHEN cnt_10m < 1 OR cnt_30m < 3 THEN NULL
                ELSE ROUND((cnt_10m - prev_10m) / 10.0, 6) + 0 END AS slope,
           CASE WHEN cnt_10m < 1 OR cnt_30m < 3 THEN 'flat'
                WHEN (cnt_10m - prev_10m) / 10.0 >= 0.2 THEN 'up'
                WHEN (cnt_10m - prev_10m) / 10.0 <= -0.2 THEN 'down'
                ELSE 'flat' END AS trend,
           (cnt_10m >= 1 AND cnt_30m < 3) AS degrade
    FROM counts
    """,
    survey_ids=(
        "A3 (trailing 10m/30m/prev-10m heat counts), W5 (slope+trend with "
        "noise-floor/min-sample gates + degrade flag), ST2"
    ),
)
def a3_w5_heat_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import heat_gates, trailing_heat_counts

    # Shared A3 helper: `now` = max event time (injected, not wall-clock),
    # one conditional-sum pass over the fact table (see
    # operators/windows.trailing_heat_counts). Gates: below the noise
    # floor slope is NULL (quiet, not degraded); below the 30m sample
    # minimum slope is NULL with degrade=true (reference heat.py:264-273).
    counts = trailing_heat_counts(_events(spark, sf_dir))
    slope = (F.col("cnt_10m") - F.col("prev_10m")) / F.lit(10.0)
    g = heat_gates(F.col("cnt_10m"), F.col("cnt_30m"), slope, theta=0.2)
    return counts.select(
        "event_type",
        "cnt_10m",
        "cnt_30m",
        "prev_10m",
        g["slope"].alias("slope"),
        g["trend"].alias("trend"),
        g["degrade"].alias("degrade"),
    )


@query(
    "w2_growth_ratio",
    """
    WITH hourly AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_bucket,
               COUNT(*) AS tx_count
        FROM events GROUP BY user_id, CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
    )
    SELECT user_id, hour_bucket, tx_count,
           ROUND(CAST(tx_count - LAG(tx_count) OVER w AS DOUBLE)
                 / NULLIF(LAG(tx_count) OVER w, 0), 6) + 0 AS growth_ratio
    FROM hourly
    WINDOW w AS (PARTITION BY user_id ORDER BY hour_bucket)
    """,
    survey_ids="W2 (lag-based growth_ratio), J6 (as-of prev row via lag, no join)",
)
def w2_growth_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "user_id", ts_bucket(F.col("ts"), 3600).alias("hour_bucket")
    ).agg(F.count(F.lit(1)).alias("tx_count"))
    out = growth_ratio(hourly, ["user_id"], "hour_bucket", "tx_count")
    return out.select(
        "user_id",
        "hour_bucket",
        "tx_count",
        (F.round("growth_ratio", 6) + F.lit(0)).alias("growth_ratio"),
    )


@query(
    "w4_regr_slope",
    """
    WITH per_min AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 60) AS BIGINT) - 28401120 AS minute_idx,
               COUNT(*) AS cnt
        FROM events GROUP BY event_type, CAST(floor(epoch(ts) / 60) AS BIGINT) - 28401120
    )
    SELECT event_type,
           ROUND(regr_slope(cnt, minute_idx), 6) + 0 AS slope,
           COUNT(*) AS n_buckets
    FROM per_min GROUP BY event_type
    """,
    survey_ids="W4 (regression slope over minute buckets)",
)
def w4_regr_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # minute_idx is re-based to 2024-01-01 (epoch-minute 28401120) so the
    # regression runs on small x values — avoids catastrophic cancellation
    # and keeps float results stable across engines.
    per_min = ev.groupBy(
        "event_type",
        (F.floor(F.col("ts").cast("long") / 60).cast("long") - 28401120).alias(
            "minute_idx"
        ),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return per_min.groupBy("event_type").agg(
        (F.round(F.regr_slope(F.col("cnt").cast("double"), F.col("minute_idx").cast("double")), 6) + F.lit(0)).alias("slope"),
        F.count(F.lit(1)).alias("n_buckets"),
    )


@query(
    "w3_w6_endpoint_slope_ema",
    """
    WITH now_t AS (SELECT MAX(ts) AS now_ts FROM events),
    per_min AS (
        SELECT e.event_type,
               CAST(floor(epoch(e.ts) / 60) * 60 AS BIGINT) AS minute_bucket,
               COUNT(*) AS cnt
        FROM events e CROSS JOIN now_t n
        WHERE e.ts > n.now_ts - INTERVAL 30 MINUTE
        GROUP BY e.event_type, CAST(floor(epoch(e.ts) / 60) * 60 AS BIGINT)
    ),
    series AS (
        SELECT event_type,
               list(cnt ORDER BY minute_bucket ASC) AS counts,
               COUNT(*) AS n_buckets
        FROM per_min GROUP BY event_type
    )
    SELECT event_type, n_buckets,
           ROUND(CAST(counts[-1] - counts[1] AS DOUBLE) / 30.0, 6) + 0 AS endpoint_slope,
           ROUND(list_reduce(list_transform(counts, x -> CAST(x AS DOUBLE)),
                             (acc, x) -> 0.3 * x + 0.7 * acc), 6) + 0 AS ema
    FROM series
    """,
    survey_ids="W3 (endpoint slope), W6 (EMA via ordered fold), A3 minute buckets",
)
def w3_w6_endpoint_slope_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    now_t = ev.agg(F.max("ts").alias("now_ts"))
    e = ev.crossJoin(F.broadcast(now_t)).filter(
        F.col("ts") > F.col("now_ts") - F.expr("INTERVAL 30 MINUTES")
    )
    per_min = e.groupBy(
        "event_type", ts_bucket(F.col("ts"), 60).alias("minute_bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    series = per_min.groupBy("event_type").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("minute_bucket"), F.col("cnt")))
            ),
            lambda s: s["cnt"],
        ).alias("counts"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    counts = F.col("counts")
    # The shared operator carries the empty-array guard (element_at(_, 0)
    # raises even non-ANSI) — don't inline a guardless copy.
    from ..operators.windows import endpoint_slope

    endpoint = endpoint_slope(counts, 30)
    return series.select(
        "event_type",
        "n_buckets",
        (F.round(endpoint, 6) + F.lit(0)).alias("endpoint_slope"),
        (F.round(ema_last(counts, alpha=0.3), 6) + F.lit(0)).alias("ema"),
    )


@query(
    "w7_latest_per_key",
    """
    SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           event_type, ROUND(value, 6) AS value
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    survey_ids="W7 (latest-row-per-key)",
)
def w7_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = latest_per_key(ev, ["user_id"], "ts", tiebreak=["event_id"])
    return out.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        F.round("value", 6).alias("value"),
    )


@query(
    "e2_jaccard_user_pairs",
    """
    WITH sets AS (
        SELECT user_id, user_id % 20 AS cohort,
               list_sort(list_distinct(list(event_type))) AS types
        FROM events GROUP BY user_id
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           ROUND(CAST(len(list_intersect(a.types, b.types)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.types, b.types))), 6) AS jaccard_sim
    FROM sets a JOIN sets b ON a.cohort = b.cohort AND a.user_id < b.user_id
    WHERE CAST(len(list_intersect(a.types, b.types)) AS DOUBLE)
          / len(list_distinct(list_concat(a.types, b.types))) >= 0.6
    """,
    survey_ids="E2/D8 (Jaccard set similarity self-join with cohort blocking), J7",
)
def e2_jaccard_user_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    sets = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    ).withColumn("cohort", F.col("user_id") % 20)
    a = sets.alias("a")
    b = sets.alias("b")
    inter = F.size(F.array_intersect(F.col("a.types"), F.col("b.types")))
    union = F.size(F.array_union(F.col("a.types"), F.col("b.types")))
    jac = inter.cast("double") / union.cast("double")
    # Blocking on cohort bounds the self-join (SURVEY §7.4: blocking keys
    # for the similarity join at scale).
    return (
        a.join(
            b,
            (F.col("a.cohort") == F.col("b.cohort"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .filter(jac >= 0.6)
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            F.round(jac, 6).alias("jaccard_sim"),
        )
    )


@query(
    "d2_fingerprint_dedup",
    """
    WITH fp AS (
        SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, user_id,
               substring(sha256(
                   COALESCE(event_type, '') || '|' ||
                   CAST(user_id AS VARCHAR) || '|' ||
                   CAST(CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS VARCHAR) || '|' ||
                   COALESCE(substring(props, 1, 30), '')
               ), 1, 40) AS fp
        FROM events
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp
                                     ORDER BY ts_us ASC, event_id ASC) AS rn
        FROM fp
    )
    SELECT event_id, ts_us, user_id, fp FROM ranked WHERE rn = 1
    """,
    survey_ids="D2 (soft fingerprint sha256(source|author|ts_sec|text[:30])[:40], keep-first)",
)
def d2_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 soft dedup: fingerprint column + keep-first survivor.

    Reference: worker/jobs/x_kol_poll.py:82-117 — `dedup:fp:{hash}` Redis
    SETEX re-expressed as one hash-shuffle on the computed fingerprint
    (sha256 per hash policy, functions/hashing.py). At 100TB this is a
    single exchange on a high-cardinality key — no skew by construction.
    """
    ev = _events(spark, sf_dir)
    fp = fingerprint(
        F.col("event_type"), F.col("user_id").cast("string"), F.col("ts"), F.col("props")
    )
    keyed = ev.select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", fp.alias("fp")
    )
    return exact_dedup(keyed, ["fp"], "ts_us", tiebreak=["event_id"])


@query(
    "j4_rules_context_merge",
    """
    WITH sig AS (
        SELECT * FROM (
            SELECT user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   ROUND(value, 6) AS value,
                   event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE event_type = 'purchase'
        ) WHERE rn = 1
    ), ev AS (
        SELECT * FROM (
            SELECT user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   ROUND(value, 6) AS value,
                   event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    )
    SELECT COALESCE(e.user_id, s.user_id) AS user_id,
           COALESCE(e.ts_us, s.ts_us) AS ts_us,
           COALESCE(e.value, s.value) AS value,
           COALESCE(e.event_type, s.event_type) AS event_type,
           s.ts_us AS signal_ts_us,
           s.value AS signal_value,
           (s.user_id IS NOT NULL) AS has_signal
    FROM ev e FULL OUTER JOIN sig s ON e.user_id = s.user_id
    """,
    survey_ids="J4 (rules eval context merge: latest-per-key per table, {**signals,**events} override)",
)
def j4_rules_context_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: the `{**signals_row, **events_row}` eval context.

    Reference: api/rules/eval_event.py:311, api/routes/rules.py:50-115 —
    latest row per key from each table (W7), then a full-outer merge where
    the events side wins on shared columns (dict-update law). Both sides
    derive from one scan here; at scale these are two table scans joined
    on the same key with identical partitioning.
    """
    ev = _events(spark, sf_dir)

    def latest_side(df: DataFrame) -> DataFrame:
        return latest_per_key(df, ["user_id"], "ts", tiebreak=["event_id"]).select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.round("value", 6).alias("value"),
            "event_type",
        )

    sig = latest_side(ev.filter(F.col("event_type") == "purchase")).select(
        "user_id",
        F.col("ts_us").alias("signal_ts_us"),
        F.col("value").alias("signal_value"),
        F.col("event_type").alias("signal_event_type"),
    )
    evl = latest_side(ev)
    merged = evl.join(sig, "user_id", "full_outer")
    return merged.select(
        "user_id",
        F.col("ts_us").alias("ts_us"),
        F.col("value").alias("value"),
        F.col("event_type").alias("event_type"),
        "signal_ts_us",
        "signal_value",
        F.col("signal_event_type").isNotNull().alias("has_signal"),
    )


@query(
    "st9_latency_percentiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.50), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           ROUND(quantile_cont(value, 0.99), 6) AS p99,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    survey_ids="ST9/§6 (P50/P95/P99 SLA percentiles per stage — alerts.yml latency gates)",
)
def st9_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's headline SLA metrics (P50=45s / P95=110s,
    alerts.yml:31-43 P95>2000ms gate) as a grouped percentile query over
    the value column. Exact interpolated percentile here (matches
    quantile_cont bit-for-bit); the 100TB path swaps in
    approx_percentile — same plan shape, sketch-mergeable partials
    instead of a per-group sort (see a5_approx_distinct for the
    approx-sketch posture).
    """
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.50), 6).alias("p50"),
        F.round(F.percentile("value", 0.95), 6).alias("p95"),
        F.round(F.percentile("value", 0.99), 6).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "j6_asof_snapshot_enrich",
    """
    WITH l AS (
        SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               event_type
        FROM events
    ), snaps AS (
        SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS snap_ts_us,
               ROUND(MAX(value), 6) AS snap_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, CAST(epoch_us(ts) AS BIGINT)
    )
    SELECT l.event_id, l.user_id, l.ts_us, l.event_type,
           s.snap_ts_us, s.snap_value
    FROM l ASOF LEFT JOIN snaps s
      ON l.user_id = s.user_id AND l.ts_us >= s.snap_ts_us
    """,
    survey_ids="J6 (as-of join: latest snapshot at-or-before event time, union+window one-shuffle plan)",
)
def j6_asof_snapshot_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event enriched with the user's latest purchase snapshot
    at-or-before the event timestamp — checked against DuckDB's native
    ASOF LEFT JOIN. Snapshots are deduped per (user, ts) so ties are
    deterministic in both engines.
    """
    from ..operators.asof import asof_join

    ev = _events(spark, sf_dir)
    left = ev.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    snaps = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.unix_micros("ts").alias("snap_ts_us"))
        .agg(F.round(F.max("value"), 6).alias("snap_value"))
    )
    return asof_join(
        left, snaps, ["user_id"], "ts_us", "snap_ts_us",
        ["snap_ts_us", "snap_value"],
    )


@query(
    "j6_asof_forward_tolerance",
    """
    WITH l AS (
        SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               event_type
        FROM events WHERE event_type = 'click'
    ), snaps AS (
        SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS snap_ts_us,
               ROUND(MAX(value), 6) AS snap_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, CAST(epoch_us(ts) AS BIGINT)
    ), m AS (
        SELECT l.event_id, l.user_id, l.ts_us, l.event_type,
               s.snap_ts_us, s.snap_value
        FROM l ASOF LEFT JOIN snaps s
          ON l.user_id = s.user_id AND l.ts_us <= s.snap_ts_us
    )
    SELECT event_id, user_id, ts_us, event_type,
           CASE WHEN snap_ts_us - ts_us <= 3600000000 THEN snap_ts_us END
               AS snap_ts_us,
           CASE WHEN snap_ts_us - ts_us <= 3600000000 THEN snap_value END
               AS snap_value
    FROM m
    """,
    survey_ids=(
        "J6 variants: FORWARD as-of (earliest snapshot at-or-after) with "
        "a 1h tolerance null-out — DuckDB native forward-ASOF oracle"
    ),
)
def j6_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click enriched with the user's NEXT purchase snapshot within
    one hour (forward as-of + tolerance — 'time to next conversion').
    Same one-shuffle union+window plan as the backward form, sort
    reversed; the tolerance nulls the whole payload atomically."""
    from ..operators.asof import asof_join

    ev = _events(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    snaps = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.unix_micros("ts").alias("snap_ts_us"))
        .agg(F.round(F.max("value"), 6).alias("snap_value"))
    )
    return asof_join(
        left,
        snaps,
        ["user_id"],
        "ts_us",
        "snap_ts_us",
        ["snap_ts_us", "snap_value"],
        direction="forward",
        tolerance_us=3600 * 1_000_000,
    )


@query(
    "j9_interval_join",
    """
    WITH b AS (
        SELECT event_type,
               CAST(epoch_us(MIN(ts)) AS BIGINT) AS mn,
               CAST(epoch_us(MAX(ts)) AS BIGINT) AS mx
        FROM events GROUP BY event_type
    ), iv AS (
        SELECT event_type, CAST(t.j AS BIGINT) AS interval_id,
               mn + t.j * ((mx - mn) // 8) AS start_us,
               mn + t.j * ((mx - mn) // 8) + ((mx - mn) // 12) AS end_us
        FROM b, range(8) t(j)
    )
    SELECT e.event_id, e.event_type,
           CAST(epoch_us(e.ts) AS BIGINT) AS ts_us,
           iv.interval_id, iv.start_us, iv.end_us
    FROM events e JOIN iv
      ON e.event_type = iv.event_type
     AND iv.start_us <= CAST(epoch_us(e.ts) AS BIGINT)
     AND CAST(epoch_us(e.ts) AS BIGINT) < iv.end_us
    """,
    survey_ids=(
        "§2.7 interval/range join — granule-bucketed equi-join plan "
        "(explode intervals to covered granules, hash-join, exact "
        "containment post-filter); the scale-correct form of a "
        "range-predicate join Spark would otherwise nested-loop"
    ),
)
def j9_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events matched to synthetic per-type campaign intervals (eight
    per type tiling the time range, length span/12 so events fall both
    inside and between intervals). The oracle is the plain range
    predicate; the engine plan is operators/asof.interval_join's
    granule bucketing — hash equi-join on (event_type, hour-granule),
    no BroadcastNestedLoopJoin. Integer-microsecond arithmetic end to
    end, so both engines tile identically."""
    from ..operators.asof import interval_join

    ev = _events(spark, sf_dir).select(
        "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    b = ev.groupBy("event_type").agg(
        F.min("ts_us").alias("mn"), F.max("ts_us").alias("mx")
    )
    iv = (
        b.crossJoin(spark.range(8).select(F.col("id").alias("interval_id")))
        .select(
            "event_type",
            "interval_id",
            (F.col("mn") + F.col("interval_id") * F.expr("(mx - mn) div 8")).alias(
                "start_us"
            ),
            (
                F.col("mn")
                + F.col("interval_id") * F.expr("(mx - mn) div 8")
                + F.expr("(mx - mn) div 12")
            ).alias("end_us"),
        )
    )
    return interval_join(ev, iv, ["event_type"]).select(
        "event_id", "event_type", "ts_us", "interval_id", "start_us", "end_us"
    )


@query(
    "a5_hll_mergeable_rollup",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS distinct_users_exact,
           COUNT(DISTINCT epoch_us(ts) // 86400000000) AS n_days,
           TRUE AS within_5pct
    FROM events
    GROUP BY event_type
    """,
    survey_ids="A5/A6 100TB path: mergeable HLL sketches (daily rollup → union-merge)",
)
def a5_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-distinct posture for 100TB: persist one HLL sketch per
    (event_type, day) partition, answer any horizon by UNION-MERGING
    sketches — no re-scan of history (Datasketches HLL, mergeable by
    construction; the same pattern as the reference's cached counter
    refresh, api/signals/heat.py trailing windows, but re-aggregable).

    Certification shape: the union-merged sketch estimate is compared to
    the exact distinct count INSIDE the plan and emitted as a
    `within_5pct` boolean alongside the exact count, so the DuckDB oracle
    (exact distincts + literal TRUE) hash-checks the row while the HLL
    path stays the thing being bounded. Day is derived from epoch micros
    (TZ-independent in both engines). At 100TB only the persisted daily
    sketches are merged — the exact arm here exists to certify the bound
    at test SFs; bounded-error golden also in tests/test_ops_golden.py.

    lgConfigK=14 (rsd ~0.81%) puts the certified 5% bound at ~6 sigma;
    the default lgConfigK=12 (rsd ~1.6%) would leave it at ~3 sigma,
    where a dense-mode sketch at real scale flips within_5pct FALSE
    often enough to make the oracle hash nondeterministic. 16KB per
    (event_type, day) sketch is still trivially storable.
    """
    ev = _events(spark, sf_dir)
    day = F.expr("unix_micros(ts) div 86400000000")
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.hll_sketch_agg("user_id", 14).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_users_est"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users_exact")
    )
    # Both sides are |event_type|-sized (a handful of rows) — broadcast.
    return merged.join(F.broadcast(exact), "event_type").select(
        "event_type",
        "distinct_users_exact",
        "n_days",
        certs.within_frac(
            F.col("distinct_users_est"), F.col("distinct_users_exact")
        ).alias("within_5pct"),
    )


# HDR-histogram binning: the law lives in operators/sketch.py
# (hdr_bucket_spark / hdr_percentiles, shared verbatim with
# StreamingHdrHistogram); the DuckDB twin of the bucket expr is below.
from ..operators.sketch import HDR_SUB as _HDR_SUB  # noqa: E402
from ..operators.sketch import hdr_bucket_spark as _hdr_bucket_spark  # noqa: E402
from ..operators.sketch import hdr_percentiles as _hdr_percentiles  # noqa: E402

_HDR_QS = (0.50, 0.95, 0.99)


def _hdr_bucket_sql(v: str) -> str:
    """DuckDB twin of operators/sketch.hdr_bucket_spark: the bucket id
    of bigint expr `v`: k*16 + (v - 2^k)*16 div 2^k over v clamped to
    >= 1 — the clamp is part of the law (sub-micro/zero values fold
    into bucket 0; see hdr_bucket_spark's docstring)."""
    vc = f"greatest({v}, CAST(1 AS BIGINT))"
    k = f"(length(bin({vc})) - 1)"
    pw = f"(CAST(1 AS BIGINT) << {k})"
    return f"({k} * {_HDR_SUB} + ({vc} - {pw}) * {_HDR_SUB} // {pw})"


@query(
    "st9_hdr_percentile_rollup",
    f"""
    WITH v AS (
        SELECT event_type,
               CAST(floor(value * 1000000.0) AS BIGINT) AS vus
        FROM events
    ), hist AS (
        SELECT event_type, {_hdr_bucket_sql("vus")} AS bucket_id,
               COUNT(*) AS cnt
        FROM v GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, bucket_id, cnt,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket_id)
                   AS cum,
               SUM(cnt) OVER (PARTITION BY event_type) AS n
        FROM hist
    ), qv AS (SELECT unnest([{", ".join(str(q) for q in _HDR_QS)}]) AS q)
    SELECT c.event_type, q.q, CAST(c.n AS BIGINT) AS n,
           CAST(ceil(q.q * c.n) AS BIGINT) AS rank_r,
           CAST(MIN(c.bucket_id) AS BIGINT) AS bucket_id,
           CAST(MIN((CAST(1 AS BIGINT) << (c.bucket_id // {_HDR_SUB}))
                * {_HDR_SUB}
                + (c.bucket_id % {_HDR_SUB})
                * (CAST(1 AS BIGINT) << (c.bucket_id // {_HDR_SUB})))
               AS BIGINT) AS est_lo_us16,
           CAST(MIN((CAST(1 AS BIGINT) << (c.bucket_id // {_HDR_SUB}))
                * {_HDR_SUB}
                + (c.bucket_id % {_HDR_SUB} + 1)
                * (CAST(1 AS BIGINT) << (c.bucket_id // {_HDR_SUB})))
               AS BIGINT) AS est_hi_us16
    FROM cum c, qv q
    WHERE c.cum >= ceil(q.q * c.n)
    GROUP BY c.event_type, q.q, c.n
    """,
    survey_ids=(
        "beyond-ref: MERGEABLE percentile rollup (HdrHistogram law, "
        "exact integer binning) — per-(event_type, day) partial "
        "histograms union-merged by plain count addition, p50/p95/p99 "
        "bracketed to <= 1/16 relative width; the ST9 percentile "
        "family's 100TB path, FULLY value-hash-oracled (unlike an "
        "opaque approx_percentile sketch) with the merge itself pinned: "
        "Spark aggregates daily partials, the oracle re-derives the "
        "histogram in one pass — hash equality proves merge == direct"
    ),
)
def st9_hdr_percentile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st9_latency_percentiles' mergeable 100TB path: persist one
    fixed-size histogram per (event_type, day) partition — 16 linear
    sub-buckets per power-of-2 octave over integer micro-units, every
    bin boundary exact integer arithmetic — then answer any horizon by
    ADDING counts (mergeable by construction, the a5_hll_mergeable
    posture) and reading p50/p95/p99 off the merged counts.

    Emits per (event_type, q): n, the rank ceil(q*n), the winning
    bucket, and the bucket's EXACT integer bounds in micro-units x16
    (est_lo_us16, est_hi_us16) — the true rank-r value provably lies in
    [lo, hi) with relative width <= 1/16 (the HdrHistogram guarantee),
    pinned against numpy order statistics in tests/test_ops_golden.py.

    Oracle shape: the histogram, the cumulative rank scan and the
    bucket bounds are all integer-exact, so the WHOLE sketch is
    value-hash-checked — and because Spark builds it from daily partials
    while the oracle builds it in one pass, the hash also proves the
    merge law. Window functions here run over |event_type| x <=
    ~16*40 bucket rows (bounded), never the corpus."""
    ev = _events(spark, sf_dir)
    day = F.expr("unix_micros(ts) div 86400000000")
    # per-(event_type, day) partials: the persisted sketch at 100TB
    daily = (
        ev.select(
            "event_type",
            day.alias("day"),
            F.expr(_hdr_bucket_spark("cast(floor(value * 1000000.0) as bigint)")).alias(
                "bucket_id"
            ),
        )
        .groupBy("event_type", "day", "bucket_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # union-merge = plain count addition over the bucket key
    merged = daily.groupBy("event_type", "bucket_id").agg(
        F.sum("cnt").alias("cnt")
    )
    return _hdr_percentiles(merged, ["event_type"], list(_HDR_QS))


@query(
    "w10_rolling_range_sum",
    """
    SELECT event_id, user_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_1h_value,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS rolling_1h_events
    FROM events
    """,
    survey_ids="§2.6 time-series: rolling event-time RANGE window (trailing 1h per key)",
)
def w10_rolling_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1h per-user rolling sum/count via a RANGE frame on epoch
    micros — the window form of A3's trailing counts that emits one row
    PER EVENT (continuous feature) instead of per refresh. Decimal sum
    for order independence; one shuffle on the partition key. At 100TB
    the frame is evaluated with a sliding aggregate inside the sort —
    no self-join, no explode."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("rolling_1h_value"),
        F.count(F.lit(1)).over(w).alias("rolling_1h_events"),
    )


@query(
    "x_sessionize",
    """
    WITH marked AS (
        SELECT user_id, event_id,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                         - lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
                               PARTITION BY user_id
                               ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id)
                         > 1800000000
                      OR lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
                               PARTITION BY user_id
                               ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
    ), numbered AS (
        SELECT *, CAST(SUM(is_start) OVER (
                   PARTITION BY user_id
                   ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM marked
    )
    SELECT user_id, session_no,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us,
           COUNT(*) AS n_events,
           MAX(ts_us) - MIN(ts_us) AS duration_us
    FROM numbered
    GROUP BY user_id, session_no
    """,
    survey_ids="training-pipeline: gap-based sessionization (30-min idle gap → session rows)",
)
def x_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min idle gap): the lag+cumsum
    composition — mark session starts where the gap to the previous
    event exceeds the threshold, running-sum the marks into session ids,
    aggregate per (user, session). Two window passes over ONE
    sort+shuffle on user_id. The streaming analog is
    streaming/pipeline.sessionized_stream (session_window + watermark,
    append-mode emit of closed sessions; parity-tested). The standard
    batch sessionizer for training-data pipelines."""
    ev = _events(spark, sf_dir)
    us = F.unix_micros("ts")
    w_order = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    gap = us - F.lag(us).over(w_order)
    is_start = F.when(
        gap.isNull() | (gap > 1800 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    numbered = ev.select(
        "user_id", "event_id", us.alias("ts_us"), is_start.alias("is_start")
    ).withColumn(
        "session_no",
        F.sum("is_start").over(
            Window.partitionBy("user_id")
            .orderBy(F.col("ts_us"), F.col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


@query(
    "a11_grouped_stats",
    """
    SELECT event_type,
           ROUND(avg(value), 6) AS mean_value,
           ROUND(stddev_samp(value), 6) AS sd_value,
           ROUND(corr(value, CAST(epoch_us(ts) AS BIGINT)), 6) AS corr_value_time,
           ROUND(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS cov_value_user
    FROM events
    GROUP BY event_type
    """,
    survey_ids="§2.5 statistical aggregates (mean/stddev/corr/covar per group)",
)
def a11_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment grouped statistics — mean, sample stddev, Pearson
    correlation and sample covariance. All are one-pass mergeable
    aggregates (sum/sum-of-squares partials combine map-side), so the
    plan is the same single key shuffle as a COUNT at any scale."""
    ev = _events(spark, sf_dir)
    us = F.unix_micros("ts")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.corr(F.col("value"), us), 6).alias("corr_value_time"),
        F.round(
            F.covar_samp(F.col("value"), F.col("user_id").cast("double")), 6
        ).alias("cov_value_user"),
    )


# Patch the template-generated D4 oracle (needs the dual-dialect fragments
# defined above; kept out of the decorator so both dialects provably share
# the same branch structure).
from . import REGISTRY  # noqa: E402

REGISTRY["d4_source_dedup_keys"].oracle = _d4_source_oracle()
