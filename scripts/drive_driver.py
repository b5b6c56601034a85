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
# One source of truth for the table list and value normalization — a new
# testdata table or a norm tweak must not silently diverge between this
# driver replica and the pytest oracle harness.
from tests.oracle_utils import _norm as norm, duck_connection

con = duck_connection(SF)

fails = []
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF)
    srows = sdf.collect()
    if name not in oracles:
        print(f"{name}: rows-only, {len(srows)} rows")
        continue
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]; drows = res.fetchall()
    scols = sdf.columns
    if sorted(scols) != sorted(dcols):
        fails.append((name, "schema", sorted(scols), sorted(dcols))); continue
    si = [scols.index(c) for c in sorted(scols)]; di = [dcols.index(c) for c in sorted(scols)]
    s = sorted(tuple(norm(r[i]) for i in si) for r in srows)
    d = sorted(tuple(norm(r[i]) for i in di) for r in drows)
    status = "MATCH" if s == d else "MISMATCH"
    if s != d: fails.append((name, "values"))
    print(f"{name}: {status} ({len(srows)} rows)")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
