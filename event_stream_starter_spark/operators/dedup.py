"""Deduplication operator family (SURVEY.md §2.4 D1-D8) plus the
training-data-scale near-dup family (MinHash-LSH, SimHash, n-gram Jaccard).

Scale notes:
- Exact/windowed dedup is one hash-shuffle on the dedup key.
- Near-dup NEVER does an unblocked self-join: MinHash-LSH blocks by band
  bucket, n-gram Jaccard blocks by a cheap key, SimHash blocks by band
  substrings. Candidate pairs are verified exactly, so precision is 1.0
  and recall is the LSH recall.
- All hashing uses xxhash64/sha2 built-ins (JVM-side, deterministic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame, keys: Sequence[str], order_col: str, tiebreak: Sequence[str] = ()
) -> DataFrame:
    """D1/D7: keep the earliest row per exact key (deterministic).

    Reference: worker/jobs/x_kol_poll.py:89-117 (Redis SETEX id dedup) —
    re-expressed as row_number==1 so batch and streaming
    (dropDuplicatesWithinWatermark) agree on the survivor.
    """
    order = [F.col(order_col).asc()] + [F.col(t).asc() for t in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def windowed_dedup(
    df: DataFrame,
    key: Column,
    ts_col: str,
    window_sec: int,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """D3: is_duplicate(key, ts) within window_sec → keep first per
    (key, time-bucket).

    Reference: api/dedup.py:17-134 (default window 3600s). Bucketed
    approximation of the reference's rolling TTL: duplicates within the
    same aligned bucket collapse; the streaming engine uses
    dropDuplicatesWithinWatermark for the rolling variant.
    """
    bucket = F.floor(F.col(ts_col).cast("long") / window_sec)
    order = [F.col(ts_col).asc()] + [F.col(t).asc() for t in order_tiebreak]
    w = Window.partitionBy(key, bucket).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Near-duplicate family over documents
# ---------------------------------------------------------------------------


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct character n-gram shingles of a normalized text column."""
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(norm, i, n)))


def token_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles."""
    toks = F.split(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), " ")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), cnt)
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def jaccard(a: Column, b: Column) -> Column:
    """E2: |a ∩ b| / |a ∪ b| over array columns (set semantics)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: hash every shingle ONCE over its string bytes,
    then derive the num_hashes permutations by re-hashing the resulting
    8-byte long with a per-permutation seed column. Returns array<long>.

    Pure JVM expressions, map-only — the expensive variable-length string
    hash runs once per shingle; the per-permutation hashes operate on a
    fixed-width long (cheap). ANSI-safe (no overflowing arithmetic).
    """
    hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    return F.array(
        *[
            F.array_min(F.transform(hashes, lambda h: F.xxhash64(h, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature: array of (band_id, hash(band slice)) strings."""
    return F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                F.xxhash64(
                    F.array_join(
                        F.slice(signature, b * rows_per_band + 1, rows_per_band), ","
                    )
                ).cast("string"),
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, exact-Jaccard verified.

    shingle → minhash → band → bucket self-join → verify. Output:
    (id_a, id_b, jaccard_sim) with id_a < id_b and jaccard_sim >= threshold.
    Candidate generation touches only same-bucket pairs — the self-join is
    on the band key, never the full cross product.
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"),
        char_shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    sig = base.withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
    # Candidate generation carries ONLY (id, band-key): the wide shingle
    # arrays never enter the self-join shuffle. Shingles re-attach to the
    # (small) deduped candidate set for exact verification.
    banded = sig.select(
        "id", F.explode(lsh_band_keys(F.col("sig"), bands, rows_per_band)).alias("bk")
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on="bk")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash over a token array using xxhash64 bit votes.

    For each bit position, sum +1/-1 votes across token hashes; bit = 1 if
    the vote is positive. Pure expressions (bitwise ops + aggregate).
    """
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    bit_cols = []
    for bit in range(64):
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << bit) if bit < 63 else F.lit(-(2**63))) != 0, 1).otherwise(-1),
        )
        bit_cols.append(
            F.when(votes > 0, F.lit(1).cast("long") * F.lit(2 ** bit if bit < 63 else -(2**63))).otherwise(F.lit(0).cast("long"))
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out.bitwiseXOR(c)
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit longs via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit hash into `bands` 16-bit
    blocks (pigeonhole: any pair within max_hamming<=bands-1 shares a
    block), self-join per block, verify Hamming distance.
    """
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")
    base = df.select(F.col(id_col).alias("id"), simhash64(toks).alias("sh"))
    width = 64 // bands
    block_keys = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                F.shiftrightunsigned(F.col("sh"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .cast("string"),
            )
            for b in range(bands)
        ]
    )
    banded = base.withColumn("bk", F.explode(block_keys))
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on="bk")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", hamming64(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def evidence_merge(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    weight_col: str,
    summary_col: str,
) -> DataFrame:
    """D4 merge laws per (event_key, dedup_key): earliest ts, max weight,
    longest summary (ties → lexicographically greatest, deterministic).

    Reference: api/events.py:531-586 (dedup keys), 682-875 (merge fields).
    Implemented as one groupBy — max_by on a (length, value) struct gives
    argmax-by-length without a second shuffle.
    """
    return df.groupBy(*key_cols).agg(
        F.min(ts_col).alias("first_ts"),
        F.max(weight_col).alias("max_weight"),
        F.max(
            F.struct(
                F.length(summary_col).alias("l"), F.col(summary_col).alias("v")
            )
        )["v"].alias("longest_summary"),
        F.count(F.lit(1)).alias("merged_count"),
    )
