"""Scalar-function queries (SURVEY.md §2.2 F6-F10, §2.3 C1-C18): each
certifies a family of column expressions against a DuckDB oracle.

Deterministic inputs are synthesized from the driver tables (FIXTURES.md)
— e.g. CA candidates derived from sha256(text) — so every branch of each
normalizer is exercised without external fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.normalize import (
    nfc,
    normalize_ca,
    normalize_text,
    normalize_token_symbol,
    normalize_url,
    normalize_url_full,
)
from ..functions.scoring import (
    NEGATIVE_WORDS,
    POSITIVE_WORDS,
    candidate_score,
    clamp01,
    lexicon_sentiment_label,
    lexicon_sentiment_score,
    quantize3,
)
from ..io import load_table
from . import query

# ---------------------------------------------------------------------------
# C1 / C3 / C9(F9): text, symbol, contract-address normalization
# ---------------------------------------------------------------------------


@query(
    "c1_c3_normalize",
    """
    WITH base AS (
        SELECT doc_id,
               text,
               'HTTP://x.co/a www.trk.io/z b spam.com, c@d.org! @user ' || text AS raw_text,
               '  $$' || source || '  '        AS raw_symbol,
               CASE WHEN doc_id % 3 = 0
                    THEN '0X' || upper(substring(sha256(text), 1, 40))
                    WHEN doc_id % 3 = 1 THEN substring(text, 1, 10)
                    ELSE NULL END              AS raw_ca
        FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                lower(raw_text),
                'https?://[^ \\t\\n\\x0b\\f\\r]+', '', 'g'),
                'www\\.[^ \\t\\n\\x0b\\f\\r]+', '', 'g'),
                '\\b[a-zA-Z0-9][a-zA-Z0-9-]*\\.(?:com|org|net|io|xyz|co|app|tech|ai|dev|finance|eth)[ \\t\\n\\x0b\\f\\r,\\.!?;:]', ' ', 'g'),
                '@\\w+', '', 'g'), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))
               AS text_norm,
           CASE WHEN length(regexp_replace(lower(trim(raw_symbol)), '^\\$+', '')) > 0
                THEN '$' || regexp_replace(lower(trim(raw_symbol)), '^\\$+', '')
                ELSE NULL END AS symbol_norm,
           CASE WHEN regexp_matches(
                    regexp_replace(lower(trim(raw_ca)), '^0x', ''),
                    '^[0-9a-f]{40}$')
                THEN '0x' || regexp_replace(lower(trim(raw_ca)), '^0x', '')
                ELSE NULL END AS ca_norm
    FROM base
    """,
    survey_ids="C1 (_normalize_text), C3 (_normalize_token_symbol), F9 (CA normalization)",
)
def c1_c3_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw_text = F.concat(
        F.lit("HTTP://x.co/a www.trk.io/z b spam.com, c@d.org! @user "), F.col("text")
    )
    raw_symbol = F.concat(F.lit("  $$"), F.col("source"), F.lit("  "))
    raw_ca = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("0X"), F.upper(F.substring(F.sha2(F.col("text"), 256), 1, 40))),
        )
        .when(F.col("doc_id") % 3 == 1, F.substring(F.col("text"), 1, 10))
        .otherwise(F.lit(None))
    )
    return docs.select(
        "doc_id",
        normalize_text(raw_text).alias("text_norm"),
        normalize_token_symbol(raw_symbol).alias("symbol_norm"),
        normalize_ca(raw_ca).alias("ca_norm"),
    )


@query(
    "c1_normalize_nfc",
    """
    WITH base AS (
        SELECT doc_id,
               nfc_normalize(
                   'Cafe' || chr(769) || ' A' || chr(778) || 'ngstro' || chr(776)
                   || 'm @user https://x.co/p ' || text || chr(769)
               ) AS composed
        FROM documents
    )
    SELECT doc_id,
           length(composed) AS nfc_len,
           trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                lower(composed),
                'https?://[^ \\t\\n\\x0b\\f\\r]+', '', 'g'),
                'www\\.[^ \\t\\n\\x0b\\f\\r]+', '', 'g'),
                '\\b[a-zA-Z0-9][a-zA-Z0-9-]*\\.(?:com|org|net|io|xyz|co|app|tech|ai|dev|finance|eth)[ \\t\\n\\x0b\\f\\r,\\.!?;:]', ' ', 'g'),
                '@\\w+', '', 'g'), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))
               AS text_norm
    FROM base
    """,
    survey_ids=(
        "C1 full fidelity: in-engine NFC unicode normalization "
        "(api/events.py:388) ahead of the _normalize_text laws — "
        "combining sequences (e+ U+0301, A+U+030A, o+U+0308, and a "
        "data-dependent trailing U+0301) compose before lowercase/strip"
    ),
)
def c1_normalize_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 with the reference's in-line NFC step, certified cross-engine:
    the Spark arm runs the Arrow-batched ``unicodedata.normalize('NFC')``
    UDF (functions/normalize.nfc) then the shared strip laws; the oracle
    runs DuckDB's independent ``nfc_normalize`` then the same laws. The
    emitted length column makes the hash sensitive to composition itself
    (each combining pair must shrink to one codepoint), not just to the
    final stripped text."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("Cafe\u0301 A\u030angstro\u0308m @user https://x.co/p "),
        F.col("text"),
        F.lit("\u0301"),
    )
    composed = nfc(raw)
    return docs.select(
        "doc_id",
        F.length(composed).cast("long").alias("nfc_len"),
        normalize_text(composed).alias("text_norm"),
    )


# The C2 normalization law as staged DuckDB SQL over any relation
# exposing (doc_id, raw_url) — the oracle below instantiates it with the
# synthesized URL shapes; the cross-engine fuzz in
# tests/test_sources_rules.py instantiates it with generated URLs, so
# the SHIPPED law is what gets fuzzed.
URL_NORM_SQL_TEMPLATE = """
    WITH base AS (
        SELECT doc_id, raw_url FROM {src} AS _u
    ), s1 AS (
        SELECT doc_id,
               regexp_replace(regexp_replace(raw_url, '^http://', 'https://'),
                              '#.*$', '') AS pre
        FROM base
    ), s2 AS (
        SELECT doc_id, pre,
               regexp_replace(pre, '[?&](utm_[^=&]*|ref|ref_src)=[^&]*', '', 'g') AS post
        FROM s1
    ), s3 AS (
        SELECT doc_id,
               CASE WHEN contains(pre, '?') AND NOT contains(post, '?')
                    THEN regexp_replace(post, '^([^?&]*)&', '\\1?')
                    ELSE post END AS c
        FROM s2
    ), s4 AS (
        SELECT doc_id,
               CASE WHEN instr(c, '?') > 0 AND length(c) > instr(c, '?')
                    THEN substring(c, 1, instr(c, '?') - 1) || '?' ||
                         array_to_string(list_sort(string_split(
                             substring(c, instr(c, '?') + 1, length(c)), '&')), '&')
                    ELSE c END AS c
        FROM s3
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(c, '\\?$', ''), '/+$', '') AS url_norm
    FROM s4
"""


@query(
    "c2_url_normalize",
    URL_NORM_SQL_TEMPLATE.format(src="""(
        SELECT doc_id,
               CASE doc_id % 3
                 WHEN 0 THEN 'http://example.com/p/' || source || '/?z=9&utm_source=x&a=' ||
                      CAST(doc_id AS VARCHAR) || '&ref=y&ref_src=tw#frag' || CAST(doc_id % 7 AS VARCHAR)
                 WHEN 1 THEN 'http://x.com/a&b/' || source || '/c//'
                 ELSE 'https://example.com/q?utm_medium=' || source
               END AS raw_url
        FROM documents
    )"""),
    survey_ids="C2 (_normalize_url: https, drop fragment/tracking params/trailing slash)",
)
def c2_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Three shapes: tracking params mid-query (repair promotes '&'→'?'),
    # a literal '&' in the path with NO query (must NOT be rewritten —
    # the gated repair), and a tracking-only query (strip + '?' cleanup).
    raw = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("http://example.com/p/"),
                F.col("source"),
                F.lit("/?z=9&utm_source=x&a="),
                F.col("doc_id").cast("string"),
                F.lit("&ref=y&ref_src=tw#frag"),
                (F.col("doc_id") % 7).cast("string"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("http://x.com/a&b/"), F.col("source"), F.lit("/c//")),
        )
        .otherwise(F.concat(F.lit("https://example.com/q?utm_medium="), F.col("source")))
    )
    return docs.select("doc_id", normalize_url(raw).alias("url_norm"))


@query(
    "c2_url_normalize_full",
    """
    SELECT doc_id,
           CASE doc_id % 5
             WHEN 0 THEN 'https://example.com:80/p/' || source || '?a=1&b=2'
             WHEN 1 THEN 'https://x.com/a'
             WHEN 2 THEN 'https://x.com/'
             WHEN 3 THEN 'ftp://files.example.org:21/data/' || source
             ELSE 'https://xn--bcher-kva.example/bücher'
           END AS url_norm
    FROM documents
    """,
    survey_ids=(
        "C2 full fidelity (parser residuals): IDN punycode host, "
        "default-port drop (post-scheme-normalization, the reference's "
        "own quirk), lowercased-key tuple param sort, bare-host root "
        "path — api/events.py:123-173"
    ),
)
def c2_url_normalize_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full C2 law via the Arrow-batched URL-parser UDF
    (functions/normalize.normalize_url_full). The oracle states the
    EXPECTED canonical form per input shape as literals derived from the
    reference law by hand — independent of both implementations, so a
    UDF regression on any shape (mixed-case host, kept :80 after
    http→https, dropped :443, trailing-slash collapse, bare-host '/',
    exotic scheme with non-default port, IDN→punycode) flips the hash.
    """
    docs = load_table(spark, sf_dir, "documents")
    raw = (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit("http://Example.com:80/p/"),
                F.col("source"),
                F.lit("?B=2&a=1&utm_source=x"),
            ),
        )
        .when(F.col("doc_id") % 5 == 1, F.lit("https://x.com:443/a//"))
        .when(F.col("doc_id") % 5 == 2, F.lit("https://x.com"))
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(F.lit("ftp://Files.example.org:21/data/"), F.col("source")),
        )
        .otherwise(F.lit("https://BÜcher.example/bücher/"))
    )
    return docs.select("doc_id", normalize_url_full(raw).alias("url_norm"))


# ---------------------------------------------------------------------------
# C9 / C15: candidate score + 3-dp HALF_UP quantize/clamp
# ---------------------------------------------------------------------------


@query(
    "c9_c15_scores",
    """
    WITH base AS (
        SELECT event_id, value,
               least(greatest(value / 50.0 - 1.0, -1.0), 1.0) AS sent,
               CAST(CAST(json_extract(props, '$.k') AS INTEGER) % 6 AS INTEGER)
                   AS n_keywords
        FROM events
    )
    SELECT event_id,
           ROUND(sent, 6) + 0 AS sentiment,
           ROUND(least(greatest(
               0.6 * ((sent + 1.0) / 2.0)
               + 0.4 * least(CAST(n_keywords AS DOUBLE) / 5.0, 1.0),
               0.0), 1.0), 6) + 0 AS cand_score,
           CAST(CAST(ROUND(CAST(least(greatest(value / 100.0, 0.0), 1.0)
                AS DECIMAL(18,9)), 3) AS DECIMAL(18,3)) AS DOUBLE) AS conf_q3
    FROM base
    """,
    survey_ids="C9 (_compute_candidate_score), C15 (3-dp HALF_UP quantize + clamp_ratio)",
)
def c9_c15_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sent = F.least(F.greatest(F.col("value") / 50.0 - 1.0, F.lit(-1.0)), F.lit(1.0))
    n_kw = (F.get_json_object("props", "$.k").cast("int") % 6).cast("int")
    return ev.select(
        "event_id",
        (F.round(sent, 6) + 0).alias("sentiment"),
        (F.round(candidate_score(sent, n_kw), 6) + 0).alias("cand_score"),
        quantize3(clamp01(F.col("value") / 100.0)).cast("double").alias("conf_q3"),
    )


# ---------------------------------------------------------------------------
# C11: lexicon sentiment (U1 deterministic fallback)
# ---------------------------------------------------------------------------


def _words_sql(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@query(
    "c11_lexicon_sentiment",
    f"""
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
        FROM documents
    ), scored AS (
        SELECT doc_id,
               least(greatest(
                   CAST(len(list_filter(t, x -> list_contains({_words_sql(POSITIVE_WORDS)}, x)))
                        - len(list_filter(t, x -> list_contains({_words_sql(NEGATIVE_WORDS)}, x)))
                        AS DOUBLE)
                   / greatest(len(t), 1) * 3.0, -1.0), 1.0) AS score
        FROM toks
    )
    SELECT doc_id,
           ROUND(score, 6) + 0 AS sentiment_score,
           CASE WHEN score > 0.1 THEN 'pos'
                WHEN score < -0.1 THEN 'neg'
                ELSE 'neu' END AS sentiment_label
    FROM scored
    """,
    survey_ids="C11 (lexicon sentiment score+label), U1 deterministic fallback",
)
def c11_lexicon_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    score = lexicon_sentiment_score(F.col("text"))
    return docs.select(
        "doc_id",
        (F.round(score, 6) + 0).alias("sentiment_score"),
        lexicon_sentiment_label(score).alias("sentiment_label"),
    )


# ---------------------------------------------------------------------------
# C13: rules keyphrase extractor (U2 deterministic fallback)
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "and", "for", "with", "from", "that", "this", "a")


@query(
    "c13_keyphrases",
    f"""
    WITH toks AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '\\$\\w+|[a-z]{{2,}}') AS t
        FROM documents
    ), flat AS (
        SELECT doc_id,
               unnest(t) AS tok,
               unnest(generate_series(1, len(t))) AS ord
        FROM toks
    ), firsts AS (
        SELECT doc_id, tok, MIN(ord) AS first_pos
        FROM flat
        WHERE NOT list_contains({_words_sql(_STOPWORDS)}, tok)
        GROUP BY doc_id, tok
    )
    SELECT doc_id, array_to_string(list(tok ORDER BY first_pos)[:5], '|') AS keyphrases
    FROM firsts
    GROUP BY doc_id
    """,
    survey_ids="C13 (regex keyphrases: tokens, stopword filter, order-preserving dedup, top-5), U2 fallback",
)
def c13_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(w) for w in _STOPWORDS])
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\$\w+|[a-z]{2,}"), 0)
    # array_distinct preserves first occurrence (order-preserving dedup,
    # reference api/keyphrases.py:80-90), then top-5.
    phrases = F.slice(
        F.array_distinct(F.filter(toks, lambda t: ~F.array_contains(stop, t))), 1, 5
    )
    return docs.filter(F.size(phrases) > 0).select(
        "doc_id", F.array_join(phrases, "|").alias("keyphrases")
    )


# ---------------------------------------------------------------------------
# C17 / C18: JSON access + message formatting
# ---------------------------------------------------------------------------


@query(
    "c17_c18_json_format",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           printf('user %d %s k=%d', user_id, event_type,
                  CAST(json_extract(props, '$.k') AS INTEGER)) AS message
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INTEGER) % 5 = 0
    """,
    survey_ids="C17 (JSONB path access), C18 (message format string); jsonb read path",
)
def c17_c18_json_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") % 5 == 0)
        .select(
            "event_id",
            "k",
            F.format_string("user %d %s k=%d", F.col("user_id"), F.col("event_type"), F.col("k")).alias(
                "message"
            ),
        )
    )


# ---------------------------------------------------------------------------
# F6 / F7: entity blacklist/whitelist + synonym normalization
# ---------------------------------------------------------------------------

_BLACKLIST = ("the", "a", "and")
_WHITELIST = ("spark", "stream")
_SYNONYMS = {"big": "large", "fast": "quick"}


@query(
    "f6_f7_entity_filter",
    f"""
    WITH toks AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z]{{2,}}') AS t
        FROM documents
    ), flat AS (
        SELECT doc_id, unnest(t) AS tok, unnest(generate_series(1, len(t))) AS ord
        FROM toks
    ), mapped AS (
        SELECT doc_id,
               CASE tok WHEN 'big' THEN 'large' WHEN 'fast' THEN 'quick'
                        ELSE tok END AS tok,
               ord
        FROM flat
        WHERE NOT list_contains({_words_sql(_BLACKLIST)}, tok)
    ), firsts AS (
        SELECT doc_id, tok, MIN(ord) AS first_pos
        FROM mapped GROUP BY doc_id, tok
    ), ents AS (
        SELECT doc_id, list(tok ORDER BY first_pos)[:8] AS entities
        FROM firsts GROUP BY doc_id
    )
    SELECT doc_id, array_to_string(entities, '|') AS entities,
           ROUND(least(0.5 + CASE WHEN list_has_any(entities, {_words_sql(_WHITELIST)})
                                  THEN 0.05 ELSE 0.0 END, 1.0), 6) AS confidence
    FROM ents
    """,
    survey_ids="F6 (blacklist drop + whitelist boost), F7 (synonym map, stop-term removal, order-preserving dedup)",
)
def f6_f7_entity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    black = F.array(*[F.lit(w) for w in _BLACKLIST])
    white = F.array(*[F.lit(w) for w in _WHITELIST])
    syn_map = F.create_map(
        *[F.lit(x) for kv in _SYNONYMS.items() for x in kv]
    )
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]{2,}"), 0)
    kept = F.filter(toks, lambda t: ~F.array_contains(black, t))
    mapped = F.transform(kept, lambda t: F.coalesce(syn_map[t], t))
    entities = F.slice(F.array_distinct(mapped), 1, 8)
    boost = F.when(F.arrays_overlap(entities, white), F.lit(0.05)).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        F.array_join(entities, "|").alias("entities"),
        F.round(F.least(F.lit(0.5) + boost, F.lit(1.0)), 6).alias("confidence"),
    )


# ---------------------------------------------------------------------------
# F8 / F10 / F11: key-format guard, chain detection, evidence grading
# ---------------------------------------------------------------------------


@query(
    "f8_f10_f11_guards",
    """
    WITH base AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0
                    THEN substring(sha256(text), 1, 40)
                    ELSE substring(text, 1, 12) END AS key_candidate,
               'https://' || CASE CAST(doc_id % 8 AS INTEGER)
                    WHEN 0 THEN 'etherscan.io'
                    WHEN 1 THEN 'bscscan.com'
                    WHEN 2 THEN 'basescan.org'
                    WHEN 3 THEN 'solscan.io'
                    WHEN 4 THEN 'optimistic.etherscan.io'
                    WHEN 5 THEN 'arbiscan.io'
                    WHEN 6 THEN 'dexscreener.com'
                    ELSE 'example.com' END || '/tx/' || CAST(doc_id AS VARCHAR)
                   AS evidence_url
        FROM documents
    )
    SELECT doc_id,
           regexp_matches(key_candidate, '^[0-9a-fA-F]{40}$') AS key_ok,
           CASE WHEN contains(evidence_url, 'etherscan.io')
                  AND NOT contains(evidence_url, 'optimistic.etherscan.io') THEN 'eth'
                WHEN contains(evidence_url, 'bscscan.com') THEN 'bsc'
                WHEN contains(evidence_url, 'arbiscan.io') THEN 'arb'
                WHEN contains(evidence_url, 'optimistic.etherscan.io') THEN 'op'
                WHEN contains(evidence_url, 'basescan.org') THEN 'base'
                WHEN contains(evidence_url, 'solscan.io')
                  OR contains(evidence_url, 'solana.fm')
                  OR contains(evidence_url, 'solana.com') THEN 'sol'
                ELSE NULL END AS chain,
           CASE WHEN contains(evidence_url, 'etherscan.io')
                  OR contains(evidence_url, 'bscscan.com')
                  OR contains(evidence_url, 'arbiscan.io')
                  OR contains(evidence_url, 'basescan.org')
                  OR contains(evidence_url, 'solscan.io') THEN 'strong'
                WHEN contains(evidence_url, 'dexscreener.com')
                  OR contains(evidence_url, 'geckoterminal.com') THEN 'medium'
                ELSE 'weak' END AS evidence_strength
    FROM base
    """,
    survey_ids="F8 (event-key format guard), F10 (chain detection from URLs), F11 (evidence-strength grading)",
)
def f8_f10_f11_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key_cand = F.when(
        F.col("doc_id") % 2 == 0, F.substring(F.sha2(F.col("text"), 256), 1, 40)
    ).otherwise(F.substring(F.col("text"), 1, 12))
    host = (
        F.when(F.col("doc_id") % 8 == 0, F.lit("etherscan.io"))
        .when(F.col("doc_id") % 8 == 1, F.lit("bscscan.com"))
        .when(F.col("doc_id") % 8 == 2, F.lit("basescan.org"))
        .when(F.col("doc_id") % 8 == 3, F.lit("solscan.io"))
        .when(F.col("doc_id") % 8 == 4, F.lit("optimistic.etherscan.io"))
        .when(F.col("doc_id") % 8 == 5, F.lit("arbiscan.io"))
        .when(F.col("doc_id") % 8 == 6, F.lit("dexscreener.com"))
        .otherwise(F.lit("example.com"))
    )
    url = F.concat(F.lit("https://"), host, F.lit("/tx/"), F.col("doc_id").cast("string"))
    # F10 chain map (events_compact.py:26-50): 'optimistic.etherscan.io'
    # contains 'etherscan.io', so the eth arm must exclude it explicitly.
    chain = (
        F.when(
            url.contains("etherscan.io") & ~url.contains("optimistic.etherscan.io"),
            F.lit("eth"),
        )
        .when(url.contains("bscscan.com"), F.lit("bsc"))
        .when(url.contains("arbiscan.io"), F.lit("arb"))
        .when(url.contains("optimistic.etherscan.io"), F.lit("op"))
        .when(url.contains("basescan.org"), F.lit("base"))
        .when(
            url.contains("solscan.io")
            | url.contains("solana.fm")
            | url.contains("solana.com"),
            F.lit("sol"),
        )
        .otherwise(F.lit(None))
    )
    # F11 grading (events_compact.py:74-92): any block explorer → strong;
    # DEX aggregators → medium; everything else → weak.
    strength = (
        F.when(
            url.contains("etherscan.io")
            | url.contains("bscscan.com")
            | url.contains("arbiscan.io")
            | url.contains("basescan.org")
            | url.contains("solscan.io"),
            F.lit("strong"),
        )
        .when(
            url.contains("dexscreener.com") | url.contains("geckoterminal.com"),
            F.lit("medium"),
        )
        .otherwise(F.lit("weak"))
    )
    return docs.select(
        "doc_id",
        key_cand.rlike("^[0-9a-fA-F]{40}$").alias("key_ok"),
        chain.alias("chain"),
        strength.alias("evidence_strength"),
    )


# ---------------------------------------------------------------------------
# W9: time-proximity score
# ---------------------------------------------------------------------------


@query(
    "w9_time_proximity",
    """
    WITH mx AS (SELECT MAX(ts) AS now_ts FROM events)
    SELECT event_id,
           ROUND(least(greatest(
               1.0 - (epoch_us(now_ts) - epoch_us(ts)) / 60000000.0 / 90.0, 0.0), 1.0), 6) + 0
               AS time_score,
           ROUND(0.6 * least(greatest(
                     1.0 - (epoch_us(now_ts) - epoch_us(ts)) / 60000000.0 / 90.0, 0.0), 1.0)
                 + 0.4 * CASE WHEN value >= 10 THEN 1.0 ELSE 0.0 END, 6) + 0
               AS blended
    FROM events, mx
    WHERE ts >= now_ts - INTERVAL 3 HOUR
    """,
    survey_ids="W9 (time-proximity score, lp-gate blend 0.6/0.4)",
)
def w9_time_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    now_ts = ev.select(F.max("ts").alias("now_ts"))
    j = ev.crossJoin(F.broadcast(now_ts))
    minutes = (F.unix_micros("now_ts") - F.unix_micros("ts")) / 60000000.0
    t_score = clamp01(F.lit(1.0) - minutes / 90.0)
    lp_gate = F.when(F.col("value") >= 10, F.lit(1.0)).otherwise(F.lit(0.0))
    return j.filter(
        F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 3 HOUR")
    ).select(
        "event_id",
        (F.round(t_score, 6) + 0).alias("time_score"),
        (F.round(F.lit(0.6) * t_score + F.lit(0.4) * lp_gate, 6) + 0).alias("blended"),
    )


# ---------------------------------------------------------------------------
# U5: memeable-topic detector (deterministic regex core)
# ---------------------------------------------------------------------------


@query(
    "u5_memeable_detector",
    """
    WITH pat AS (
        SELECT doc_id,
               CAST(regexp_matches(text, 'moon|pump') AS INTEGER)
                 + CAST(regexp_matches(text, 'inu|dog|pepe') AS INTEGER)
                 + CAST(regexp_matches(text, '\\$[A-Za-z]{2,10}') AS INTEGER)
                   AS n_patterns
        FROM documents
    )
    SELECT doc_id, n_patterns,
           ROUND(least(0.3 * n_patterns, 1.0), 6) AS confidence,
           n_patterns >= 1 AS is_memeable
    FROM pat
    """,
    survey_ids="U5 (memeable-topic detector: regex patterns, confidence=0.3*n)",
)
def u5_memeable_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = (
        F.col("text").rlike("moon|pump").cast("int")
        + F.col("text").rlike("inu|dog|pepe").cast("int")
        + F.col("text").rlike(r"\$[A-Za-z]{2,10}").cast("int")
    )
    return docs.select(
        "doc_id",
        n.alias("n_patterns"),
        F.round(F.least(F.lit(0.3) * n, F.lit(1.0)), 6).alias("confidence"),
        (n >= 1).alias("is_memeable"),
    )


# ---------------------------------------------------------------------------
# C10: topic-keyword extractor (3-pass priority)
# ---------------------------------------------------------------------------


@query(
    "c10_topic_keywords",
    """
    WITH toks AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '\\$\\w+|[a-z]{2,}') AS t
        FROM documents
    ), flat AS (
        SELECT doc_id, unnest(t) AS kw,
               unnest(generate_series(1, len(t))) AS ord
        FROM toks
    ), firsts AS (
        SELECT doc_id, kw,
               CASE WHEN kw LIKE '$%' THEN 1
                    WHEN length(kw) BETWEEN 2 AND 3 THEN 2
                    ELSE 3 END AS pri,
               MIN(ord) AS first_pos
        FROM flat
        GROUP BY doc_id, kw
    ), ranked AS (
        SELECT doc_id, kw,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pri, first_pos) AS rn
        FROM firsts
    )
    SELECT doc_id, array_to_string(list(kw ORDER BY kw), '|') AS topic_keywords
    FROM ranked WHERE rn <= 5
    GROUP BY doc_id
    """,
    survey_ids=(
        "C10 (_extract_topic_keywords: 3-pass priority $tokens -> 2-3-char "
        "-> rest, order-preserving dedup, sorted top-K)"
    ),
)
def c10_topic_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference api/events.py:244-310: prioritize $token symbols, then
    2-3-char words, then everything else; first-occurrence dedup; stop at
    top-K; emit sorted. The pass-with-break loop is equivalent to
    slice(array_distinct(p1 ++ p2 ++ p3), topk) because priority class is
    a pure function of the keyword."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\$\w+|[a-z]{2,}"), 0)
    p1 = F.filter(toks, lambda k: k.startswith("$"))
    p2 = F.filter(toks, lambda k: (~k.startswith("$")) & F.length(k).between(2, 3))
    p3 = F.filter(toks, lambda k: (~k.startswith("$")) & ~F.length(k).between(2, 3))
    top = F.array_sort(F.slice(F.array_distinct(F.concat(p1, p2, p3)), 1, 5))
    return docs.filter(F.size(top) > 0).select(
        "doc_id", F.array_join(top, "|").alias("topic_keywords")
    )


# ---------------------------------------------------------------------------
# C12: HF sentiment probability normalization (deterministic shape)
# ---------------------------------------------------------------------------


@query(
    "c12_prob_sentiment",
    """
    WITH probs AS (
        SELECT event_id,
               GREATEST((event_id % 100) / 100.0, (event_id % 61) / 100.0) AS pos,
               (user_id % 100) / 100.0 AS neg,
               ((event_id + user_id) % 100) / 100.0 AS neu0
        FROM events
    ), norm AS (
        SELECT event_id, pos, neg,
               CASE WHEN pos = 0 AND neg = 0 AND neu0 = 0
                    THEN 1.0 ELSE neu0 END AS neu
        FROM probs
    )
    SELECT event_id,
           ROUND(pos, 6) AS prob_pos,
           ROUND(neg, 6) AS prob_neg,
           ROUND(neu, 6) AS prob_neu,
           ROUND(GREATEST(-1.0, LEAST(1.0, pos - neg)), 6) AS sentiment_score,
           CASE WHEN pos - neg >= 0.25 THEN 'pos'
                WHEN pos - neg <= -0.25 THEN 'neg'
                ELSE 'neu' END AS sentiment_label
    FROM norm
    """,
    survey_ids=(
        "C12 (HF sentiment prob-norm: max-prob per label, all-zero -> "
        "neutral fallback, score = clamp(pos-neg), +-0.25 thresholds)"
    ),
)
def c12_prob_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference api/hf_sentiment.py:29-62 (_norm_probs/_score_from_probs):
    per-label max over response triples (two pos candidates here), neutral
    fallback when every prob is zero, score = clamp(pos-neg, -1, 1),
    label at +-0.25. Model inference itself is U1's pluggable backend;
    this certifies the deterministic normalization layer."""
    ev = load_table(spark, sf_dir, "events")
    pos = F.greatest(
        (F.col("event_id") % 100) / F.lit(100.0),
        (F.col("event_id") % 61) / F.lit(100.0),
    )
    neg = (F.col("user_id") % 100) / F.lit(100.0)
    neu0 = ((F.col("event_id") + F.col("user_id")) % 100) / F.lit(100.0)
    neu = F.when((pos == 0) & (neg == 0) & (neu0 == 0), F.lit(1.0)).otherwise(neu0)
    score = F.greatest(F.lit(-1.0), F.least(F.lit(1.0), pos - neg))
    label = (
        F.when(pos - neg >= 0.25, "pos")
        .when(pos - neg <= -0.25, "neg")
        .otherwise("neu")
    )
    return ev.select(
        "event_id",
        F.round(pos, 6).alias("prob_pos"),
        F.round(neg, 6).alias("prob_neg"),
        F.round(neu, 6).alias("prob_neu"),
        F.round(score, 6).alias("sentiment_score"),
        label.alias("sentiment_label"),
    )


# ---------------------------------------------------------------------------
# E3 / E4 / E5: entity set algebra (order-preserving union, blacklist
# subtraction, source-domain intersection)
# ---------------------------------------------------------------------------

_E_KEYWORDS = ("spark", "join", "stream", "data")
_E_BLACK = ("the", "and", "data")
_E_ALLOWED_SRC = ("web", "wiki", "news")


@query(
    "e3_e5_entity_setops",
    f"""
    WITH toks AS (
        SELECT doc_id, source,
               regexp_extract_all(lower(text), '[a-z]{{2,}}') AS t
        FROM documents
    ), built AS (
        SELECT doc_id, source,
               list_concat(
                   list_filter(t, x -> list_contains({_words_sql(_E_KEYWORDS)}, x)),
                   t[:6]
               ) AS cat
        FROM toks
    ), merged_t AS (
        SELECT doc_id, source,
               list_filter(cat, (x, i) -> list_position(cat, x) = i) AS merged
        FROM built
    )
    SELECT doc_id, array_to_string(merged, '|') AS merged,
           array_to_string(
               list_filter(merged, x -> NOT list_contains({_words_sql(_E_BLACK)}, x)),
               '|') AS kept,
           array_to_string(
               list_filter([source, 'web', source || '-mirror'],
                           s -> list_contains({_words_sql(_E_ALLOWED_SRC)}, s)),
               '|') AS allowed_sources
    FROM merged_t
    """,
    survey_ids="E3 (keyword ∪ entities order-preserving union), E4 (blacklist subtraction), E5 (source-domain intersection)",
)
def e3_e5_entity_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3-E5 entity set algebra, all JVM array expressions (no shuffle).

    Reference: api/services/topic_analyzer.py:41-69, 375-379 —
    keyword ∪ entities preserving first-seen order (E3: array_distinct
    over concat, which keeps first occurrence), blacklist subtraction
    (E4: array_except, order-preserving on the left arg), and
    source-domain intersection (E5: filter(sources, s IN allowed)).
    Map-side only: at 100TB this is a pure projection pipeline inside
    whole-stage codegen.
    """
    docs = load_table(spark, sf_dir, "documents")
    kw = F.array(*[F.lit(w) for w in _E_KEYWORDS])
    black = F.array(*[F.lit(w) for w in _E_BLACK])
    allowed = F.array(*[F.lit(w) for w in _E_ALLOWED_SRC])
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]{2,}"), 0)
    keywords = F.filter(toks, lambda t: F.array_contains(kw, t))
    entities = F.slice(toks, 1, 6)
    merged = F.array_distinct(F.concat(keywords, entities))
    kept = F.array_except(merged, black)
    sources = F.array(
        F.col("source"), F.lit("web"), F.concat(F.col("source"), F.lit("-mirror"))
    )
    return docs.select(
        "doc_id",
        F.array_join(merged, "|").alias("merged"),
        F.array_join(kept, "|").alias("kept"),
        F.array_join(
            F.filter(sources, lambda s: F.array_contains(allowed, s)), "|"
        ).alias("allowed_sources"),
    )


# ---------------------------------------------------------------------------
# F4: budgeted URL expansion (deterministic variant)
# ---------------------------------------------------------------------------


def _f4_sql(dialect: str) -> str:
    """Deterministic F4 (reference api/normalize/x.py:108-152): the
    reference expands short URLs over live HTTP with a 2s/URL timeout
    (HEAD then GET), a 5s/tweet total budget on a 4-worker pool, and
    fail-open (original URL on any failure; ALL originals when the
    tweet budget trips — the outer `except` returns `urls` wholesale).

    This variant replaces the network with a url-mapping DIMENSION
    (short_id → expanded URL + deterministic resolve cost) so the laws
    are oracle-checkable:
      - cost ≤ 2s → resolves in `cost`; cost > 2s → both HEAD and GET
        time out, consuming 4s, URL falls back to the original;
      - tweet budget model (declared): 4-worker makespan lower bound
        max(max_cost, sum_cost/4) > 5s → budget exceeded → every URL
        of that tweet reverts to the original;
      - mapping miss (20% of ids) → both timeouts burn (4s), then
        fail-open to the original.
    Costs are integer DECISECONDS so the schedule arithmetic is exact
    in both engines (no float-sum order dependence). The mapping join
    is a broadcast (dimension is 400 rows; the S5-S7 posture), URL
    fan-out is a 3-row range join — map-side, no shuffle beyond the
    per-tweet rollup.
    """
    rng = "range(6) t(j)" if dialect == "duckdb" else "(SELECT id AS j FROM range(6)) t"
    rng_dim = (
        "range(400) r(short_id)"
        if dialect == "duckdb"
        else "(SELECT id AS short_id FROM range(400)) r"
    )
    st = "VARCHAR" if dialect == "duckdb" else "STRING"
    # Private temp view on the Spark side — never clobber a catalog
    # view named 'events' (api.register_catalog).
    tbl = "events" if dialect == "duckdb" else "__ess_f4_events"
    return f"""
    WITH mapping AS (
        SELECT short_id,
               'https://example.com/article/' || CAST(short_id AS {st}) AS expanded,
               CAST((short_id * 13) % 50 AS INTEGER) AS cost_ds
        FROM {rng_dim}
        WHERE short_id % 5 <> 0
    ), tweet_urls AS (
        SELECT e.event_id, CAST(t.j AS INTEGER) AS url_pos,
               (e.event_id * 7 + t.j) % 400 AS short_id,
               'https://sho.rt/' || CAST((e.event_id * 7 + t.j) % 400 AS {st})
                   AS short_url
        FROM {tbl} e, {rng}
        WHERE t.j <= e.event_id % 6
    ), attempted AS (
        SELECT u.event_id, u.url_pos, u.short_url, m.expanded,
               m.cost_ds,
               -- timeout path burns HEAD(2s) + GET(2s) = 40 ds; a
               -- mapping MISS is a dead short URL: it still burns both
               -- timeouts before failing open (the reference's resolve()
               -- has no fast-path for unresolvable hosts)
               CASE WHEN m.cost_ds IS NULL THEN 40
                    WHEN m.cost_ds <= 20 THEN m.cost_ds
                    ELSE 40 END AS attempt_ds
        FROM tweet_urls u LEFT JOIN mapping m ON u.short_id = m.short_id
    ), budget AS (
        SELECT event_id,
               MAX(attempt_ds) AS max_ds,
               SUM(attempt_ds) AS sum_ds
        FROM attempted GROUP BY event_id
    )
    SELECT a.event_id, a.url_pos, a.short_url,
           (b.max_ds > 50 OR b.sum_ds > 200) AS budget_exceeded,
           CASE WHEN b.max_ds > 50 OR b.sum_ds > 200 THEN a.short_url
                WHEN a.expanded IS NOT NULL AND a.cost_ds <= 20 THEN a.expanded
                ELSE a.short_url END AS final_url,
           (NOT (b.max_ds > 50 OR b.sum_ds > 200))
               AND a.expanded IS NOT NULL AND a.cost_ds <= 20 AS expanded
    FROM attempted a JOIN budget b ON a.event_id = b.event_id
    """


@query(
    "f4_url_expand_budget",
    _f4_sql("duckdb"),
    survey_ids=(
        "F4 (budgeted URL expansion, deterministic variant: 2s/URL "
        "timeout, 5s/tweet 4-worker budget model, fail-open to the "
        "original URL; mapping dimension instead of live HTTP)"
    ),
)
def f4_url_expand_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("__ess_f4_events")
    return spark.sql(_f4_sql("spark"))
