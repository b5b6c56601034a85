"""Card build + render + schema-bounds queries (SURVEY.md §2 card surface).

Reference: api/cards/build.py:462-583 (build_card: multi-source merge,
meta.data_as_of = oldest source, jsonschema validation) and
templates/cards/*.tg.j2 / render_pipeline.py:74-155 (deterministic
template render keyed off risk_level/degrade).

The render here is the reference template's *structure* re-expressed as
one deterministic string expression: risk-level header, token + contract
lines, conditional risk-note block (non-green only), market-data lines
with a 'pending' fallback for missing metrics, conditional degrade
notice, verify path, data-as-of stamp, and the fixed legal note. The
reference's Chinese label strings are NOT copied — labels are original
English; the law being certified is the conditional-block structure and
the field formatting, not the prose. Number formatting uses C-style
%.6f / %.0f (printf / format_string) instead of Python's "{:,.0f}"
thousands-grouping (declared simplification: no locale separators).

The schema bounds (schemas/cards.schema.json: tax in [0,1], score in
[0,100], risk_level / level enums) are emitted as *flag columns*, not
filters — the reference raises on violation at build time; a batch
engine reports them so a pipeline can quarantine offending rows.

Everything is a single shared SQL template instantiated for both
dialects, so the Spark query and the DuckDB oracle provably share the
branch structure. One shuffle (groupBy token) + a broadcast-sized
full-outer source merge; the render itself is a map-side projection
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from . import query

# Dialect tokens: (printf-style format fn, json int extraction).
_FMT = {"duckdb": "printf", "spark": "format_string"}
_JSON_K = {
    "duckdb": "CAST(json_extract(props, '$.k') AS INTEGER)",
    "spark": "CAST(get_json_object(props, '$.k') AS INT)",
}


def _card_sql(dialect: str) -> str:
    fmt = _FMT[dialect]
    # data_as_of renders minute-truncated ISO-8601 Z (the reference's
    # snapshot format '2025-01-15T12:00Z', cards_router snapshot test).
    iso_min = (
        "strftime(make_timestamp(data_as_of_us), '%Y-%m-%dT%H:%MZ')"
        if dialect == "duckdb"
        else "date_format(timestamp_micros(data_as_of_us), \"yyyy-MM-dd'T'HH:mm'Z'\")"
    )
    jk = _JSON_K[dialect]
    sha = "sha256({})" if dialect == "duckdb" else "sha2({}, 256)"
    st = "VARCHAR" if dialect == "duckdb" else "STRING"
    ca_hash = sha.format(f"CAST(token_id AS {st})")
    # The Spark side reads a PRIVATE temp view — registering plain
    # 'events' would clobber api.register_catalog's catalog view.
    tbl = "events" if dialect == "duckdb" else "__ess_cards_events"
    return f"""
    WITH base AS (
        SELECT user_id % 30 AS token_id, event_type, ts, value
        FROM {tbl}
    ), dex AS (
        -- DEX source: price/liquidity snapshot per token (min/max only —
        -- order-independent, unlike double sums).
        SELECT token_id,
               ROUND(MIN(value) / 7.0e0, 6) AS price_usd,
               ROUND(MAX(value) * 13.0e0, 2) AS liquidity_usd,
               MAX(ts) AS dex_asof
        FROM base WHERE event_type IN ('click', 'view')
        GROUP BY token_id
    ), gp AS (
        -- GoPlus source: taxes + honeypot; the count/token_id integer
        -- arithmetic deliberately exceeds the schema bounds (tax > 1,
        -- score > 100) for some tokens to exercise the bounds flags.
        SELECT token_id,
               ROUND(((COUNT(*) * 7 + token_id * 13) % 120) / 100.0e0, 2) AS tax_buy,
               ROUND(((COUNT(*) * 3 + token_id * 5) % 90) / 100.0e0, 2) AS tax_sell,
               MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) = 1 AS honeypot,
               ROUND(((COUNT(*) * 11 + token_id * 17) % 115) * 1.0e0, 2) AS score_raw,
               MAX(ts) AS gp_asof
        FROM base WHERE event_type IN ('purchase', 'error')
        GROUP BY token_id
    ), merged AS (
        SELECT COALESCE(d.token_id, g.token_id) AS token_id,
               d.price_usd, d.liquidity_usd, g.tax_buy, g.tax_sell,
               g.honeypot, g.score_raw,
               CAST({'epoch_us' if dialect == 'duckdb' else 'unix_micros'}(
                   LEAST(d.dex_asof, g.gp_asof)) AS BIGINT) AS data_as_of_us,
               (CASE WHEN d.token_id IS NULL THEN 1 ELSE 0 END
                + CASE WHEN g.token_id IS NULL THEN 1 ELSE 0 END) AS degraded_sources
        FROM dex d FULL OUTER JOIN gp g ON d.token_id = g.token_id
    ), card AS (
        SELECT token_id,
               'TK' || CAST(token_id AS {st}) AS symbol,
               CASE WHEN token_id % 2 = 0 THEN 'eth' ELSE 'bsc' END AS chain,
               '0x' || substring({ca_hash}, 1, 40) AS ca_norm,
               price_usd, liquidity_usd, tax_buy, tax_sell,
               COALESCE(honeypot, FALSE) AS honeypot,
               score_raw, data_as_of_us, degraded_sources,
               CASE WHEN COALESCE(honeypot, FALSE) THEN 'red'
                    WHEN degraded_sources > 0 THEN 'gray'
                    WHEN COALESCE(tax_buy, 0) > 0.1 THEN 'yellow'
                    ELSE 'green' END AS risk_level,
               CASE WHEN COALESCE(score_raw, 0) >= 80 THEN 'risk'
                    WHEN COALESCE(score_raw, 0) >= 50 THEN 'caution'
                    WHEN COALESCE(score_raw, 0) >= 20 THEN 'watch'
                    ELSE 'none' END AS level
        FROM merged
    ), flagged AS (
        SELECT *,
               (tax_buy IS NULL OR (tax_buy >= 0 AND tax_buy <= 1))
               AND (tax_sell IS NULL OR (tax_sell >= 0 AND tax_sell <= 1)) AS tax_ok,
               (score_raw IS NULL OR (score_raw >= 0 AND score_raw <= 100)) AS score_ok
        FROM card
    )
    SELECT token_id, symbol, chain, risk_level, level,
           score_raw, tax_buy, tax_sell, tax_ok, score_ok,
           (tax_ok AND score_ok) AS schema_ok,
           degraded_sources, data_as_of_us,
           concat_ws(chr(10),
               CASE risk_level WHEN 'red' THEN '[RED] **high risk alert**'
                    WHEN 'yellow' THEN '[YELLOW] **medium risk notice**'
                    WHEN 'gray' THEN '[GRAY] **service degraded**'
                    ELSE '[GREEN] **low risk signal**' END,
               '**token:** ' || symbol || ' (' || upper(chain) || ')',
               '**contract:** `' || substring(ca_norm, 1, 6) || '...'
                   || substring(ca_norm, 39, 4) || '`',
               CASE WHEN risk_level IN ('red', 'yellow', 'gray')
                    THEN '**risk note:** level=' || level
                         || ' honeypot=' || CASE WHEN honeypot THEN 'true' ELSE 'false' END
                    END,
               '**market data**',
               '- price: ' || CASE WHEN price_usd IS NOT NULL
                    THEN '$' || {fmt}('%.6f', price_usd) ELSE 'pending' END,
               '- liquidity: ' || CASE WHEN liquidity_usd IS NOT NULL
                    THEN '$' || {fmt}('%.0f', ROUND(liquidity_usd, 0)) ELSE 'pending' END,
               CASE WHEN degraded_sources > 0
                    THEN '**degraded:** partial data, cached/fallback values' END,
               '**verify:** dexscreener:' || chain || '/' || substring(ca_norm, 1, 10),
               '**data as of:** ' || {iso_min},
               '_risk signal only, not investment advice_'
           ) AS tg_render,
           symbol || '|' || risk_level || '|' || level || '|'
               || CAST(degraded_sources AS {st}) AS ui_render
    FROM flagged
    """


@query(
    "j3_card_render",
    _card_sql("duckdb"),
    survey_ids=(
        "card render pipeline (templates/cards/*.tg.j2 structure as a "
        "deterministic string expression) + cards.schema.json bounds "
        "checks (tax in [0,1], score in [0,100]) as flag columns; "
        "data_as_of = oldest present source (api/cards/build.py:462-583)"
    ),
)
def j3_card_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("__ess_cards_events")
    return spark.sql(_card_sql("spark"))
