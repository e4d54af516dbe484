"""Simulate the driver: vanilla SparkSession (none of our session.py
config), run entry() + every queries() entry at sf0.01, compare with
oracle_sql() via duckdb exactly like CORRECTNESS does.

Canonicalization deliberately mirrors the driver's: EVERY query's
pandas output — rows-only entries included — is sorted with
``pandas.sort_values`` over the RAW cells. List/array/struct cells
make that crash (``TypeError: unhashable type: 'list'``) exactly like
the real driver (rounds 1/2/3 tracebacks in CORRECTNESS_r*.json), so
a list-typed registry output can never pass here and fail there.
"""
import sys, math
sys.path.insert(0, "/root/repo")
import duckdb
import numpy as np, pandas as pd
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


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: sort columns by name, then
    sort_values over the raw cells (NO normalization first — the
    driver doesn't normalize either, and raw-cell sorting is what
    crashes on list cells)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def norm(v):
    if v is None or v is pd.NaT: return None
    if isinstance(v, np.integer): return int(v)
    if isinstance(v, (np.floating, float)):
        f = float(v); return None if math.isnan(f) else f
    if isinstance(v, (np.ndarray, list, tuple)): return tuple(norm(x) for x in v)
    if isinstance(v, pd.Timestamp): return v.to_datetime64().astype("datetime64[us]").item()
    return v

qs, os_ = e.queries(), e.oracle_sql()
only = set(sys.argv[1:])  # optional: verify just the named queries
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
    cols_ok = sorted(got.columns) == sorted(want.columns)
    n_ok = len(got) == len(want)
    g = sorted((tuple(norm(r[c]) for c in sorted(got.columns)) for _, r in got.iterrows()), key=repr)
    w = sorted((tuple(norm(r[c]) for c in sorted(want.columns)) for _, r in want.iterrows()), key=repr)
    ok = cols_ok and n_ok and g == w
    print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(got)} rows)")
    if not ok: fails.append(name)
print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
