"""Freeze the bitext coarse quantizers for the repo's test corpora.

Fits the corpus-scaled IVF coarse quantizer (vectors._fit_bitext_quantizer
— deterministic k-means, n_lists ~ sqrt(N)) for each frozen testdata
corpus and writes the model artifacts into
``event_stream_starter_spark/models/`` (the committed tier of
operators/quantizer_registry). Run once per corpus version; the
provenance test (tests/test_plans.py::test_bitext_quantizer_provenance)
refits at sf0.001 and pins the committed artifact byte-for-byte, the
_FROZEN_MERGES convention.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_stream_starter_spark.operators import quantizer_registry as qreg  # noqa: E402
from event_stream_starter_spark.queries.vectors import _fit_bitext_quantizer  # noqa: E402
from event_stream_starter_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("gen-bitext-quantizer", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for sf in sys.argv[1:] or ["0.001", "0.01", "0.1"]:
        sf_dir = f"/root/testdata/sf{sf}"
        fp = qreg.corpus_fingerprint(sf_dir)
        model = _fit_bitext_quantizer(spark, sf_dir)
        path = qreg.persist_model("bitext_ivf", fp, model, committed=True)
        print(
            f"sf{sf}: n_vectors={model['n_vectors']} "
            f"n_lists={model['n_lists']} -> {path}"
        )


if __name__ == "__main__":
    main()
