"""Multimodal pipeline query: binary payload → Arrow-batched feature
extraction (operators/multimodal.py). The payload is the utf-8 encoding
of documents.text, so DuckDB can recompute every byte-level feature for
the oracle check.

Both arms GUARD the ASCII assumption explicitly instead of trusting the
generator: the DuckDB oracles decode via character-position ascii()/
substr() (unsigned, char==byte) while the Spark operators work on raw
utf-8 bytes (and mm_audio_windows decodes SIGNED little-endian int16),
so the two agree only while every payload byte is < 0x80. Each query
filters to all-ASCII payloads — ``length(text) = octet_length(text)``,
which for valid UTF-8 holds iff every code point is single-byte — in
BOTH dialects, so a non-ASCII document entering the corpus drops out of
both arms identically rather than silently diverging engine from
oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.multimodal import (
    audio_windows,
    extract_features,
    media_from_documents,
    sample_frames,
)
from . import query


def _ascii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-null, all-ASCII documents — the module-level guard both
    engines share (length == octet_length iff every byte < 0x80)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter("text IS NOT NULL")
        .filter(F.length("text") == F.octet_length("text"))
    )


@query(
    "mm_media_features",
    """
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           ascii(substring(text, 1, 1)) AS first_byte,
           CAST(octet_length(encode(text)) // 1024 + 1 AS BIGINT) AS n_frames,
           CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c)))
                % 997 AS BIGINT) AS checksum
    FROM documents
    WHERE text IS NOT NULL
      AND length(text) = octet_length(encode(text))
    """,
    survey_ids="multimodal: binary payload column + mapInPandas decode/feature plumbing (stubbed codec)",
)
def mm_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(media_from_documents(_ascii_docs(spark, sf_dir)))


@query(
    "mm_frame_sample",
    """
    WITH m AS (
        -- all-ASCII guard: char ops == byte ops (module docstring)
        SELECT doc_id AS media_id, text, octet_length(encode(text)) AS nb
        FROM documents
        WHERE text IS NOT NULL
          AND length(text) = octet_length(encode(text))
    ), frames AS (
        SELECT media_id, text, nb,
               unnest(generate_series(0, nb // 1024, 2)) AS frame_idx
        FROM m
    )
    SELECT media_id, frame_idx,
           CAST(least(nb - frame_idx * 1024, 1024) AS BIGINT) AS frame_len,
           upper(hex(substring(text, frame_idx * 1024 + 1, 8))) AS frame_hex8
    FROM frames
    """,
    survey_ids="multimodal: frame sampling (row-expanding mapInPandas, 1→N batch shape)",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sample over the synthesized media table; the fake
    codec frames the payload in 1KiB blocks, so DuckDB recomputes every
    output cell from the utf-8 text bytes (full value-hash oracle)."""
    return sample_frames(
        media_from_documents(_ascii_docs(spark, sf_dir)), every=2
    )


@query(
    "mm_audio_windows",
    """
    WITH m AS (
        SELECT doc_id AS media_id, text,
               octet_length(encode(text)) // 2 AS ns
        FROM documents
        WHERE text IS NOT NULL AND octet_length(encode(text)) >= 2
          AND length(text) = octet_length(encode(text))
    ), smp AS (
        SELECT media_id, CAST(u.i AS BIGINT) - 1 AS si,
               (ascii(substr(text, CAST(2*u.i - 1 AS INTEGER), 1))
                + 256 * ascii(substr(text, CAST(2*u.i AS INTEGER), 1))
                - 20000) AS s
        FROM m, unnest(generate_series(1, CAST(ns AS INTEGER))) AS u(i)
    ), wn AS (
        SELECT media_id, si // 256 AS win_idx, si, s,
               lead(s) OVER (PARTITION BY media_id, si // 256
                             ORDER BY si) AS s2
        FROM smp
    )
    SELECT media_id, win_idx,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(s * s) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN s2 IS NOT NULL AND ((s < 0) <> (s2 < 0))
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM wn GROUP BY media_id, win_idx
    """,
    survey_ids=(
        "multimodal: audio feature frames — 16-bit LE PCM window "
        "energy + zero-crossing counts over binary payloads via "
        "Arrow-batched mapInPandas (stub codec = deterministic byte "
        "math, so every BIGINT feature is value-hash-checked; a real "
        "decoder swaps one line behind the same batch protocol)"
    ),
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window audio features over the synthetic media payloads:
    (media_id, win_idx, n_samples, energy, zero_crossings). The payload
    is documents.text's utf-8 bytes, filtered to all-ASCII (module
    docstring) — the Spark decode is SIGNED little-endian int16 while
    the oracle's ascii()-based decode is unsigned, and they coincide
    exactly on the guarded byte range — so the DuckDB oracle re-derives
    the samples byte-for-byte and the whole mapInPandas path is
    hash-checked."""
    media = media_from_documents(_ascii_docs(spark, sf_dir)).filter(
        "n_bytes >= 2"
    )
    return audio_windows(media)
