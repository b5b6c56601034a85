"""Simulate the driver: plain SparkSession, import __spark_entry__, run
entry() + every queries() entry vs oracle_sql() on sf0.01."""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# Deliberately UN-tuned session — driver won't set our configs.
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled", "false").getOrCreate())

import __spark_entry__ as E

df = E.entry(spark)
rows = df.collect()
print("ENTRY rows:", len(rows), "schema:", [f.name for f in df.schema])
assert len(rows) > 0

qs = E.queries(); oracles = E.oracle_sql()
print("queries:", len(qs), "oracles:", len(oracles))

import os
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
# One source of truth for the table list and the comparison itself — the
# dtype-strict pandas compare mirrors the driver's hash gate (toPandas vs
# duckdb .df(), canonical sort, dtypes included, lists crash).
from tests.oracle_utils import compare, duck_connection

con = duck_connection(SF)

fails = []
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF)
    if name not in oracles:
        n = sdf.count()
        print(f"{name}: rows-only, {n} rows")
        continue
    problems = compare(sdf, con, oracles[name])
    status = "MATCH" if not problems else "MISMATCH"
    if problems:
        fails.append((name, problems))
    print(f"{name}: {status}" + (f" {problems}" if problems else ""))
print(f"FAILS ({len(fails)}):")
for name, problems in fails:
    print(" ", name, problems)
sys.exit(1 if fails else 0)
