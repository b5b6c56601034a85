"""Multimodal pipeline query: binary payload → Arrow-batched feature
extraction (operators/multimodal.py). The payload is the utf-8 encoding
of documents.text (ASCII by construction in the driver data), so DuckDB
can recompute every byte-level feature for the oracle check."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..operators.multimodal import extract_features, media_from_documents
from . import query


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
    """,
    survey_ids="multimodal: binary payload column + mapInPandas decode/feature plumbing (stubbed codec)",
)
def mm_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter("text IS NOT NULL")
    return extract_features(media_from_documents(docs))
