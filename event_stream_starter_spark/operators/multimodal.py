"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (image/audio codecs are not available
in this environment): ``decode_image`` raises NotImplementedError unless
PIL is importable, and the default pipeline uses ``fake_decode`` — a
deterministic byte-level feature extractor — so the Spark-side plumbing
(schema, batch iteration, partitioning, UDF signature) is fully real and
fully tested while the codec is pluggable.

Scale notes: mapInPandas streams Arrow record batches — memory per task
is one batch (spark.sql.execution.arrow.maxRecordsPerBatch), not one
partition, so 100TB of media shards safely across executors. Binary
payloads never pass through a Python row loop.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata contract for a media table (reference: the engine treats
# media exactly like the reference treats evidence blobs — opaque payload
# plus typed metadata columns).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("first_byte", IntegerType(), True),
        StructField("n_frames", LongType(), True),
        StructField("checksum", LongType(), True),
    ]
)


def decode_image(payload: bytes) -> Any:
    """Real image decode — requires an image codec library.

    STUB: PIL/pillow is not available in this container; the plumbing
    uses :func:`fake_decode` instead. Swap in this function when a codec
    is present.
    """
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image codec not available in this environment; use fake_decode"
        ) from exc


def fake_decode(payload: bytes) -> dict[str, int]:
    """Deterministic stand-in for media decode: byte-level features only.

    n_frames models frame-sampling (one 'frame' per 1024 bytes); checksum
    is a cheap rolling sum. Both are pure functions of the payload, so
    results are reproducible and oracle-checkable.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "first_byte": payload[0] if n else None,
        "n_frames": n // 1024 + 1,
        "checksum": int(sum(payload) % 997),
    }


def extract_features(media: DataFrame, batch_decode=None) -> DataFrame:
    """Arrow-batched feature extraction over a media DataFrame.

    ``batch_decode(payload_series) -> DataFrame-of-features`` is pluggable
    (a real codec implements exactly that signature: one pandas Series of
    payload bytes in, one feature DataFrame with FEATURE_SCHEMA's feature
    columns out — THIS wrapper owns the mapInPandas iterator protocol and
    the media_id passthrough, so the plugin never sees Arrow chunking).
    The default vectorizes :func:`fake_decode` over each Arrow batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_decode is not None:
                out = batch_decode(pdf["payload"]).reset_index(drop=True)
            else:
                out = pd.DataFrame(
                    [
                        fake_decode(p) if p is not None else
                        {"n_bytes": None, "first_byte": None,
                         "n_frames": None, "checksum": None}
                        for p in pdf["payload"]
                    ]
                )
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents table: the utf-8 bytes
    of ``text`` play the role of an opaque payload (deterministic, so the
    oracle can recompute every feature from the text)."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_len", LongType(), True),
        StructField("frame_hex8", StringType(), True),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("out_w", IntegerType(), False),
        StructField("out_h", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

_FRAME_BYTES = 1024  # fake codec: one 'frame' per 1KiB of payload


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling over video-like payloads: emit one row per SAMPLED
    frame (row-expanding mapInPandas — the 1→N batch shape a real
    frame extractor needs). The fake codec treats each 1KiB block as a
    frame; a real one decodes the container instead — same schema,
    same batch iteration, same partitioning.

    Output: (media_id, frame_idx, frame_len, frame_hex8) where
    frame_hex8 is the hex of the frame's first 8 bytes (cheap,
    deterministic, oracle-checkable).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "frame_len": [], "frame_hex8": []
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                n_frames = len(p) // _FRAME_BYTES + 1
                for idx in range(0, n_frames, every):
                    frame = p[idx * _FRAME_BYTES : (idx + 1) * _FRAME_BYTES]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_len"].append(len(frame))
                    out["frame_hex8"].append(frame[:8].hex().upper())
            yield pd.DataFrame(out, columns=list(FRAME_SCHEMA.fieldNames()))

    return media.mapInPandas(run, FRAME_SCHEMA)


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Image resize plumbing: decode → resample → re-encode, stubbed with
    a deterministic stride resampler (every len/(w*h)-th payload byte) so
    the output is a pure function of the input. A real implementation
    swaps the per-payload function for a codec call (see decode_image);
    batch shape, schema and memory profile are identical.
    """
    target = out_w * out_h

    def one(p: bytes | None) -> bytes | None:
        if p is None:
            return None
        if len(p) <= target:
            return bytes(p)
        stride = len(p) / target
        return bytes(p[int(i * stride)] for i in range(target))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "out_w": out_w,
                    "out_h": out_h,
                    "payload": [one(p) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("win_idx", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("energy", LongType(), False),
        StructField("zero_crossings", LongType(), False),
    ]
)

_AUDIO_WIN = 256  # samples per analysis window
_AUDIO_CENTER = 20000  # fake codec: center the ASCII-synthetic PCM


def audio_windows(media: DataFrame, win: int = _AUDIO_WIN) -> DataFrame:
    """Audio feature-frame plumbing: payload bytes → 16-bit LE PCM
    samples → per-window energy and zero-crossing counts (the standard
    VAD/segmentation primitives).

    The codec is the deterministic stub the container forces (no audio
    libs): consecutive byte pairs decode as little-endian int16 and are
    centered by {_AUDIO_CENTER} so the ASCII-synthetic payloads produce
    sign changes — a real decoder swaps the frombuffer line for a codec
    call and drops the centering; the Arrow batch iteration, the
    1→N-per-payload row expansion, the all-integer feature math and the
    output schema are exactly what the real path runs. Every output is
    an exact BIGINT (sum of squares, strict sign-change count over
    in-window neighbor pairs), so the whole operator is value-hash
    oracle-checkable from the bytes.

    Scale shape: mapInPandas over the media partitioning — embarrassingly
    parallel, O(payload) per row, no shuffle; downstream rollups group on
    (media_id, win_idx).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "win_idx": [],
                "n_samples": [],
                "energy": [],
                "zero_crossings": [],
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None or len(p) < 2:
                    continue
                a = (
                    np.frombuffer(p[: (len(p) // 2) * 2], dtype="<i2")
                    .astype(np.int64)
                    - _AUDIO_CENTER
                )
                n_w = (len(a) + win - 1) // win
                for w in range(n_w):
                    seg = a[w * win : (w + 1) * win]
                    neg = seg < 0
                    out["media_id"].append(mid)
                    out["win_idx"].append(w)
                    out["n_samples"].append(len(seg))
                    out["energy"].append(int((seg * seg).sum()))
                    out["zero_crossings"].append(
                        int((neg[:-1] != neg[1:]).sum())
                    )
            yield pd.DataFrame(
                out, columns=list(AUDIO_WINDOW_SCHEMA.fieldNames())
            )

    return media.mapInPandas(run, AUDIO_WINDOW_SCHEMA)
