"""Driver-mimicking comparison: row count + column names +
order-insensitive exact value comparison between a Spark DataFrame
and a DuckDB result."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.to_datetime64().astype("datetime64[us]").item()
    if isinstance(v, np.datetime64):
        return v.astype("datetime64[us]").item()
    if v is pd.NaT:
        return None
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_value(row[c]) for c in cols)
        for _, row in df.iterrows()
    ]
    rows.sort(key=repr)
    return rows


def assert_parity(spark_df, oracle_con, sql: str, name: str = "query"):
    got = spark_df.toPandas()
    want = oracle_con.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch: spark={sorted(got.columns)} "
        f"oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), (
        f"{name}: row count mismatch: spark={len(got)} oracle={len(want)}"
    )
    g, w = normalize(got), normalize(want)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")


def fuzz_seeds(default, base=8200):
    """Pinned seeds by default; SPARK_GRAFT_FUZZ_SEEDS=n sweeps n
    random seeds starting at `base` (per-suite bases keep swept seed
    sets distinct across fuzz files). Same hook as the combined mix."""
    import os

    n = int(os.environ.get("SPARK_GRAFT_FUZZ_SEEDS", "0"))
    if n:
        return list(range(base, base + n))
    return default
