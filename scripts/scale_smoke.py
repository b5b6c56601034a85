"""Scale smoke: synthesize a 10x events table (1M rows vs sf0.1's 100k)
in a scratch dir and run the core pipeline queries against it.

Purpose: evidence that the plan shapes (partial agg before shuffle,
window partitioning, key-hash dedup, percentiles) hold when the data
outgrows the driver-provided SFs — catch anything that accidentally
depends on a small row count (broadcast of a big side, collect of a
fact table, per-group memory blowups). Not part of CI (runtime ~1 min);
run manually: `python scripts/scale_smoke.py [n_events]`.

The synthetic table matches the driver schema (FIXTURES.md §B) so every
events-table query runs unmodified.

Measured (local[32], 2026-08-14 round 2, 1M events = 10x sf0.1, best
clean run): c4 dedup 4.0s, a1 upsert 3.3s, a2 topics 1.9s, a3/w5 heat
2.4s, w2 growth 2.9s, w7 latest 1.6s, st9 percentiles 1.9s, j6 asof
3.4s, d2 fingerprint 2.0s, flagship 4.3s — ~2-4x the sf0.1 times for
10x the rows (shuffle-parallel sub-linear scaling); numbers drift
run-to-run with the co-resident process, see NOISE CAVEAT.
Round-2 additions at the same 10x (best clean run): d4 source keys
3.2s, forward-asof 2.1s, interval join 1.8s, card render 2.5s, F4
budget 3.0s, cooldown 1.3s, sessionize 1.5s; doc side: pii scrub
1.6s, leakage-safe split 0.5s — all in the same 1-3s band.

Doc corpus (50k docs = 10x sf0.1, every doc in a 10-copy near-dup
clique): text stats 1.2s, exact dedup 0.9s, decontaminate 3.1s,
repetition filter 4.0s, ngram top-k 1.7s, packing 0.8s, split 0.2s.
dd_minhash_lsh is ~30-60s — NOT a regression vs sf0.1: the clique
corpus contains ~250k TRUE >=0.5 pairs (45 per clique x 5k cliques
plus near-threshold word-salad cross pairs), so banding emits ~7.3M
candidates and exact-verifies a quarter million — linear in true-pair
volume, which is 1000x sf0.1's 256 pairs at only 10x the docs.
Corpus-filter additions at the same 50k (best clean run): gopher
rules 1.5s (map-only), ccnet LM buckets 9.5s (~10M exploded grams:
sample-side model agg + broadcast-scored rollup), dsir select 7.4s
(two models, two broadcast joins over the gram stream), bm25 top-k
2.7s, e2e curation 5.3s, u4 refine seam 2.7s (vectorized pandas rules batch; was 18.9s
with the per-row fallback loop).
Embedding family at 10x (5k synthetic 64-dim vectors, 50 planted
clusters): brute cosine 1.1s, ivf 4.0s / lsh 2.8s (fit dominated at
this size — the quantizer is fit-once-reuse in production),
semdedup 5.0s (incl. k-means fit), embed near-dup 1.0s.

50x probe (one-off, `python scripts/scale_smoke.py 5000000`,
2026-08-14): all 17 event queries complete at 5M rows with no plan
collapse — 2-33s each (heaviest: a1 full-outer upsert-merge 33s, c4
key dedup 21s, flagship 20s), aggregate ~31k rows/s/query vs ~21k at
1M — per-row cost FALLS at 5x the data as fixed overheads amortize,
the signature of shuffle-parallel plans with partial aggregation.

Round-7/8 families at the same 10x (50k clique docs / 5k vectors,
2026-08-16 run): KN LM x_kn_trigram_lm 10.2s / buckets 8.2s / approx
buckets 11.4s (~5x the sf0.1 times at 10x docs — the model groupBys
amortize); zipf 1.5s, bigram entropy 1.7s, vocab overlap 1.1s,
readability 0.8s (all ~linear map/agg passes); DoReMi weights 15.5s
and MULTIROUND 17.5s — four extra EG rounds cost +2s at 10x because
the corpus-sized LM chain executes once into the round-0 checkpoint;
unigram Viterbi encode 8.1s (pure map-only linear: 10x docs = 10x the
0.9s sf0.1 time, no shuffle to parallelize away); tokenizer bake-off
30.9s = both codegen encoders over the same scan (the BPE 12-fold
dominates; at production vocab both swap to their Arrow tiers);
datacard v2 39.5s = the sum of its five component families' own
passes. x_semantic_decontaminate_idf 72.3s is ~8x its sf0.1 time —
LINEAR in token volume (the per-(doc,dim) DECIMAL rollup is
arithmetic-bound with no parallel slack to reclaim), the documented
cost of the exact IDF arm; the sketch/screen twins are the 100TB
path. Quantization serving: pq 16.8s / opq 24.4s / ivfopq 13.5s at 5k
vectors are FIT-dominated (codebooks + rotation retrain per run at
smoke scale) — deployed, models freeze in the Streaming*Index
sidecars and queries pay ADC only; sq8 2.4s (no trained model).

Round-9 families at the same scales (2026-08-16 run): HDR percentile
rollup 2.9s @ 1M events (vs 1.9s for the exact st9 percentiles — the
mergeable sketch costs the same as one exact pass while adding the
100TB merge property); published pruned-unigram trainer 3.4s @ 50k
docs (the clique corpus's 30-word vocabulary keeps the word table
tiny — Heaps' law at work); the 3-encoder bake-off 34.3s (+3.4s over
the 2-encoder round-8 number: the BPE 12-fold still dominates);
dd_edit_distance 37.3s over ~22M length-band candidates (see the
in-list caveat: the salad corpus collides lengths ~100x harder than a
real one; cost is linear in candidates x d, no blowup). Bitext at 10x
(5k vectors): exact arm 16.7s (brute pairs + two salted top-k means);
ANN arm 76.4s — SLOWER than exact at this scale and honestly so: with
only 16 coarse lists and the certified n_probe=8, symmetric probing
still scores ~half of all pairs while paying a fresh k-means fit, two
assigns and a union-dedup on top; the tier's win arrives when
n_lists grows with the corpus (4096 lists / probe 64 touches 1/64 of
pairs — the knob a deployment sets; the cert, not the smoke corpus,
is what pins its recall). x_unigram_margin 5.0s @ 50k docs — the
Arrow 2-best DP is map-only linear (10x docs ~= 5.5x the sf0.1 time;
partition-parallel, no shuffle).

NOISE CAVEAT: this script is single-pass (unlike bench.py's best-of-4
passes); the box's co-resident agent process bursts for tens of
seconds and can inflate any one query 5-20x (observed 15-30s readings
on the 1.2s text-stats query). Treat an isolated spike as neighbor
noise and re-run before calling it a regression.
"""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from event_stream_starter_spark.queries import all_queries  # noqa: E402
from event_stream_starter_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

QUERIES = [
    "c4_event_key_dedup",
    "a1_event_upsert_merge",
    "a2_topic_aggregate",
    "a3_w5_heat_slope",
    "w2_growth_ratio",
    "w7_latest_per_key",
    "st9_latency_percentiles",
    "st9_hdr_percentile_rollup",
    "j6_asof_snapshot_enrich",
    "d2_fingerprint_dedup",
    "flagship_heat_rules",
    "d4_source_dedup_keys",
    "j6_asof_forward_tolerance",
    "j9_interval_join",
    "j3_card_render",
    "f4_url_expand_budget",
    "d6_cooldown_emit",
    "x_sessionize",
]

# Text/dedup family on the 10x near-dup-clique corpus (see synthesis
# note in main()).
DOC_QUERIES = [
    "x_text_stats",
    "x_boilerplate_strip",  # ~2-4s @ 50k clique docs (measured 2026-08-14)
    "dd_exact_dedup",
    "dd_minhash_lsh",
    "x_decontaminate",
    "x_repetition_filter",
    "x_ngram_topk",
    "x_pack_sequences",
    "x_split_assign",
    "x_pii_scrub",
    "x_split_leakage_safe",
    "x_gopher_rules",
    "x_ccnet_lm_buckets",
    "x_dsir_select",
    "x_bm25_topk",
    "e2e_curation",
    "u4_refine_seam",
    # The registered 100TB scale paths — the whole point of these is
    # behavior at multiples of the test SFs, so the smoke drives them.
    "x_ccnet_lm_buckets_approx",
    "x_dsir_select_approx",
    "x_quality_bins_approx",
    "x_reservoir_sample_topk",
    "x_epoch_shuffle",
    # Round-7 families (KN LM, IDF screen, corpus datasheets, DoReMi)
    # and round-8 additions (unigram tokenizer, bake-off, datacard v2,
    # multi-round DoReMi): the 10x probe is the empirical check behind
    # their 100TB plan-shape claims.
    "x_kn_trigram_lm",
    "x_kn_lm_buckets",
    "x_kn_lm_buckets_approx",
    "x_semantic_decontaminate_idf",
    "x_zipf_entropy",
    "x_bigram_entropy",
    "x_vocab_overlap",
    "x_readability",
    "x_doremi_weights",
    "x_doremi_weights_multiround",
    "x_unigram_encode_frozen",
    "x_tokenizer_fertility_compare",
    "x_corpus_datacard_v2",
    # Round-9: the published (soft-EM + pruned) unigram trainer at 10x
    # exercises the seed/EM/prune loop over the clique corpus word
    # table; dd_edit_distance's candidate volume here (~22M pairs) is
    # governed by the clique corpus concentrating ALL 50k docs into
    # ~60 length bands — a property of the 30-word salad (real corpora
    # spread lengths ~100x wider), the same caveat as the excluded
    # dd_ngram_jaccard; the thresholded DP keeps it linear in
    # candidates x d.
    "x_unigram_train_pruned",
    "dd_edit_distance",
    "x_unigram_margin",
]

# Embedding family on a 10x synthetic vector table (5k vectors, 64-dim,
# 50 planted direction clusters with per-cluster near-dup structure).
EMB_QUERIES = [
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "dd_semdedup",
    "dd_embed_near_dup",
    # Quantization tiers (build+serve per run at smoke scale; deployed,
    # codes persist in the Streaming*Index sinks and queries pay serve
    # only).
    "ann_pq_topk",
    "ann_opq_topk",
    "ann_ivfopq_topk",
    "ann_sq8_topk",
    "ann_ivfsq8_topk",
    # Round-9 bitext miners: the 10x probe pairs the 5k synthetic
    # vectors with the doc table's lang column (ids 0..4999 align);
    # the exact arm broadcasts the pivot side, the ANN arm probes both
    # directions of the shared coarse quantizer.
    "x_bitext_mine",
    "x_bitext_mine_ann",
]


def main() -> None:
    spark = get_spark("scale-smoke", cpus=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="ess_scale_")

    # Deterministic synthetic events: same columns/types as the driver
    # table, heavier tail on user_id so groupBy sees skew.
    types = F.array(*[F.lit(t) for t in ["view", "click", "purchase", "share"]])
    ev = (
        spark.range(N)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                (F.lit(1700000000) + (F.col("id") % 604800)) * 1_000_000
            ).alias("ts"),
            (F.xxhash64("id") % 20000 + 20000).alias("user_id"),
            types[(F.col("id") % 4).cast("int")].alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit(1)), 10000) / 100.0).alias("value"),
            F.concat(F.lit('{"k":'), (F.col("id") % 97).cast("string"), F.lit("}")).alias(
                "props"
            ),
        )
        .repartition(32)
    )
    ev.write.mode("overwrite").parquet(f"{out}/events.parquet")

    # 10x documents: every sf0.1 doc becomes a 10-copy near-dup clique
    # (copy 0 verbatim, copies 1-9 with one appended salt token, so
    # char/word-gram Jaccard stays ~0.95). Stresses exactly what grows
    # at corpus scale: signature maps, LSH bucket joins (bucket size 10
    # -> 45 pairs per clique, never a cross product), per-doc n-gram
    # aggregation. dd_ngram_jaccard is deliberately absent: the
    # synthetic 30-word vocabulary gives every 3-gram shingle a
    # document frequency ~100x a real corpus's, which explodes ANY
    # prefix-filtered candidate set — that is a property of the word
    # salad, not of the operator (see jaccard_prefix_join docstring on
    # df-ordered prefixes).
    docs = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("copy"),
            F.col("doc_id").alias("orig_id"),
            "text",
            "lang",
            "source",
        )
        .select(
            (F.col("orig_id") * 10 + F.col("copy")).alias("doc_id"),
            F.when(F.col("copy") == 0, F.col("text"))
            .otherwise(
                F.concat(
                    F.col("text"),
                    F.lit(" "),
                    F.substring(F.md5(F.col("copy").cast("string")), 1, 6),
                )
            )
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
        .repartition(32)
    )
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    n_docs = spark.read.parquet(f"{out}/documents.parquet").count()

    # 10x embeddings: 5k 64-dim vectors in 50 planted direction
    # clusters; within a cluster, vectors share a dominant axis with a
    # small deterministic per-vector perturbation, so ANN probes find
    # true neighbors and SemDeDup sees real in-cluster duplicate
    # structure. label = cluster id (the near-dup blocking column).
    dim = 64
    emb = (
        spark.range(5000)
        .select(
            F.col("id").alias("vec_id"),
            (F.col("id") % 50).cast("int").alias("label"),
            F.expr(
                f"transform(sequence(0, {dim - 1}), d -> CAST("
                "  CASE WHEN d = CAST(vec_id % 50 AS INT) THEN 1.0 "
                "       ELSE sin(CAST(vec_id AS DOUBLE) * (d + 1) * 0.7) * 0.08 END"
                "  AS FLOAT))"
            ).alias("embedding"),
        )
        .repartition(32)
    )
    emb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    n_vecs = spark.read.parquet(f"{out}/embeddings.parquet").count()

    specs = all_queries()
    # clearCache OUTSIDE the timed window, between every query: leaked
    # persisted intermediates must not subsidize later queries, and
    # cache teardown must not be charged to the query that created it.
    total = 0.0
    for name in QUERIES:
        t0 = time.perf_counter()
        specs[name].fn(spark, out).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        total += dt
        print(f"{name}: {dt:.2f}s @ {N} events")
    doc_total = 0.0
    for name in DOC_QUERIES:
        t0 = time.perf_counter()
        specs[name].fn(spark, out).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        doc_total += dt
        print(f"{name}: {dt:.2f}s @ {n_docs} docs")
    emb_total = 0.0
    for name in EMB_QUERIES:
        t0 = time.perf_counter()
        specs[name].fn(spark, out).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        emb_total += dt
        print(f"{name}: {dt:.2f}s @ {n_vecs} vectors")
    print(f"TOTAL {total:.1f}s for {len(QUERIES)} queries at {N} rows "
          f"({N / max(total, 1e-9):,.0f} rows/s aggregate); "
          f"{doc_total:.1f}s for {len(DOC_QUERIES)} doc queries at {n_docs} docs; "
          f"{emb_total:.1f}s for {len(EMB_QUERIES)} embedding queries at "
          f"{n_vecs} vectors")


if __name__ == "__main__":
    main()
