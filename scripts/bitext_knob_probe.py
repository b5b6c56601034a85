"""One-off knob probe for the bitext ANN tier (round-10 lead task):
measure pooled recall + wall time of the candidate tier vs the exact
arm across (n_lists, probe_frac) grids at sf0.01 / sf0.1.

Not part of the registry — a measurement harness; results land in the
x_bitext_mine_ann docstring and the committed knobs.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from event_stream_starter_spark.session import get_spark  # noqa: E402
from event_stream_starter_spark.io import load_table  # noqa: E402
from event_stream_starter_spark.operators.similarity import (  # noqa: E402
    _cluster_scores,
    cosine,
    kmeans_centroids,
)
import event_stream_starter_spark.queries.vectors as V  # noqa: E402


def ann_pairs(spark, sf_dir, cents, n_probe):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    e = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id",
        "lang",
        F.expr("transform(embedding, x -> cast(x as double))").alias("emb"),
    )

    def side(df, vec_col, n_probe):
        scored = F.transform(
            _cluster_scores(F.col(vec_col), cents),
            lambda sc, i: F.struct(sc.alias("s"), i.alias("cl")),
        )
        top = F.slice(F.reverse(F.array_sort(scored)), 1, n_probe)
        return df.withColumn(
            "probes",
            F.transform(top, lambda t: t["cl"].cast("long")),
        ).withColumn("cluster", F.coalesce(F.element_at("probes", 1), F.lit(0)))

    a = side(
        e.filter(F.col("lang") != V._BT_PIVOT).select(
            F.col("doc_id").alias("xid"),
            F.col("lang").alias("xlang"),
            F.col("emb").alias("xemb"),
        ),
        "xemb",
        n_probe,
    )
    b = side(
        e.filter(F.col("lang") == V._BT_PIVOT).select(
            F.col("doc_id").alias("yid"), F.col("emb").alias("yemb")
        ),
        "yemb",
        n_probe,
    )
    af = a.select("xid", "xlang", "xemb", "cluster", "probes")
    bf = b.select("yid", "yemb", "cluster", "probes")
    fwd = (
        af.select(
            "xid", "xlang", "xemb", "probes", F.explode("probes").alias("pc")
        )
        .join(bf.select("yid", "yemb", F.col("cluster").alias("pc")), "pc")
        .select("xid", "xlang", "xemb", "yid", "yemb")
    )
    bwd = (
        bf.select(
            "yid", "yemb", F.col("cluster").alias("ycl"), F.explode("probes").alias("pc")
        )
        .join(
            af.select(
                "xid", "xlang", "xemb", "probes", F.col("cluster").alias("pc")
            ),
            "pc",
        )
        .filter(~F.array_contains(F.col("probes"), F.col("ycl")))
        .select("xid", "xlang", "xemb", "yid", "yemb")
    )
    pairs = (
        fwd.unionByName(bwd)
        .withColumn("cs", cosine(F.col("xemb"), F.col("yemb")))
        .select("xid", "xlang", "yid", "cs")
    )
    return V._bitext_margin_tail(pairs)


def main():
    spark = get_spark("bt-knobs", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf in [s for s in sys.argv[1:] if not s.startswith("-")] or ["0.01", "0.1"]:
        sf_dir = f"/root/testdata/sf{sf}"
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        t0 = time.time()
        exact = {
            (r["doc_id_x"], r["doc_id_y"])
            for r in V.x_bitext_mine(spark, sf_dir).collect()
        }
        t_exact = time.time() - t0
        t0 = time.time()
        exact2 = V.x_bitext_mine(spark, sf_dir).count()
        t_exact2 = time.time() - t0
        print(
            f"sf{sf}: N={n} exact={len(exact)} pairs "
            f"({t_exact:.2f}s cold, {t_exact2:.2f}s warm)"
        )
        for n_lists in sorted({round(math.sqrt(n)), round(math.sqrt(n) * 2)}):
            cents = kmeans_centroids(
                emb, "embedding", n_clusters=n_lists, iters=2, id_col="vec_id"
            )
            for frac in (0.25, 0.4):
                n_probe = max(1, round(frac * n_lists))
                t0 = time.time()
                got = {
                    (r["doc_id_x"], r["doc_id_y"])
                    for r in ann_pairs(spark, sf_dir, cents, n_probe).collect()
                }
                t1 = time.time()
                got2 = ann_pairs(spark, sf_dir, cents, n_probe).count()
                t2 = time.time()
                rec = len(got & exact) / max(len(exact), 1)
                print(
                    f"  n_lists={n_lists} n_probe={n_probe} (frac {frac}): "
                    f"recall={rec:.3f} rows={len(got)} "
                    f"({t1 - t0:.2f}s cold, {t2 - t1:.2f}s warm)"
                )


if __name__ == "__main__":
    main()
