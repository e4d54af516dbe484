"""Simulate the driver: vanilla SparkSession (none of our session.py
config), run entry() + every queries() entry at sf0.01, compare with
oracle_sql() via duckdb exactly like CORRECTNESS does.

The canonicalization + comparison live in tools/oracle_compare.py —
ONE implementation shared with tests/test_oracle_mutation.py, which
certifies that this exact comparison goes red under query
perturbations (r8 VERDICT #1). See that module's docstring for the
list-cell crash semantics the driver shares.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.join("/root/repo", "tools"))
import duckdb
from oracle_compare import canon, compare
from pyspark.sql import SparkSession

import __spark_entry__ as e

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim").config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 1) smoke
df = e.entry(spark)
rows = df.collect()
print("SMOKE entry rows:", len(rows), "schema:", [f.name for f in df.schema.fields])
assert len(rows) > 0

# 2) correctness at sf0.01
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

qs, os_ = e.queries(), e.oracle_sql()
only = set(sys.argv[1:])  # optional: verify just the named queries
# loud on typos: a misspelled slot used to be SILENTLY skipped, so a
# scoped run could print "FAILURES: none" having verified nothing
# (r9 review finding — it bit this session on 'u5_pyccd_segments')
unknown = only - set(qs)
if unknown:
    print(f"UNKNOWN query name(s): {sorted(unknown)}; registry has: {sorted(qs)}")
    sys.exit(2)
fails = []
for name in sorted(qs):
    if only and name not in only:
        continue
    try:
        got = canon(qs[name](spark, sf).toPandas())
    except Exception as ex:
        print(f"{name}: CRASH ({type(ex).__name__}: {ex})")
        fails.append(name)
        continue
    if name not in os_:
        print(f"{name}: rows-only ({len(got)} rows)"); continue
    want = canon(con.execute(os_[name]).fetchdf())
    verdict = compare(got, want)
    ok = all(verdict.values())
    print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(got)} rows)")
    if not ok: fails.append(name)
print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
