"""Publish the driver-replica per-query oracle status as a committed
artifact (PARITY_r11.json) — VERDICT r10 next-round #8: the external
driver samples only 50 queries, so touched-family correctness should be
verifiable from an artifact listing EVERY registered query's MATCH
status, not from test names.

Runs the same dtype-strict DuckDB compare as scripts/drive_driver.py
(plain un-tuned session, sf0.01 by default) over all declared queries
and writes {"sf_dir", "n_queries", "n_match", "n_rows_only",
"n_mismatch", "per_query": {name: "MATCH" | "rows_only:<n>" |
"MISMATCH:<problems>"}}.

Usage: python scripts/parity_r11.py [out=PARITY_r11.json]
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import __spark_entry__ as E  # noqa: E402
from tests.oracle_utils import compare, duck_connection  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PARITY_r11.json",
)

qs = E.queries()
oracles = E.oracle_sql()
con = duck_connection(SF)

per_query = {}
n_match = n_rows_only = n_mismatch = 0
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF)
    if name not in oracles:
        n = sdf.count()
        per_query[name] = f"rows_only:{n}"
        n_rows_only += 1
        continue
    problems = compare(sdf, con, oracles[name])
    if problems:
        per_query[name] = f"MISMATCH:{problems}"
        n_mismatch += 1
    else:
        per_query[name] = "MATCH"
        n_match += 1
    print(name, per_query[name])

doc = {
    "sf_dir": SF,
    "n_queries": len(per_query),
    "n_match": n_match,
    "n_rows_only": n_rows_only,
    "n_mismatch": n_mismatch,
    "per_query": per_query,
}
with open(OUT, "w") as f:
    json.dump(doc, f, indent=1, sort_keys=True)
    f.write("\n")
print(f"wrote {OUT}: {n_match} MATCH / {n_rows_only} rows-only / "
      f"{n_mismatch} MISMATCH over {len(per_query)} queries")
sys.exit(1 if n_mismatch else 0)
