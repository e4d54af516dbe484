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


def slow_enabled() -> bool:
    """SPARK_GRAFT_SLOW=1 opts into the soak/sweep/fuzz suites."""
    import os

    return os.environ.get("SPARK_GRAFT_SLOW", "").strip().lower() in (
        "1",
        "true",
        "yes",
        "on",
    )


def skip_unless_slow(reason: str) -> None:
    """Module-level gate for soak/sweep/fuzz suites (r12 VERDICT #2:
    the 41-minute default run outgrew the driver's verify window —
    the default `pytest tests/ -q` run must keep full FUNCTIONAL
    coverage and finish inside it; the gated suites re-run locally
    with SPARK_GRAFT_SLOW=1 before query-changing commits)."""
    import pytest

    if not slow_enabled():
        pytest.skip(
            f"slow suite: {reason} — set SPARK_GRAFT_SLOW=1 to run",
            allow_module_level=True,
        )
