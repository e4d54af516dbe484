"""Randomized cross-engine parity for the u5 CCD oracle.

The sf0.001/sf0.01 parity checks prove bit-exactness on the driver's
testdata; this test hammers the same contract on SYNTHETIC corpora —
tiny users (n=1..5 daily points, the no-loop/final-segment-only
paths), break-bearing users (level shifts), near-threshold noise,
multiple events per day (exercising the decimal daily aggregation) —
so a future testdata regen with a different distribution cannot
surface an edge the oracle and kernel disagree on.

Seeded RNG → deterministic corpora → EXACT tuple comparison
(bit-identical doubles, same as the driver's value hash).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from .helpers import slow_enabled, skip_unless_slow

skip_unless_slow("u5 synthetic-corpus oracle sweep (~130 s; u5 parity stays via test_oracle_parity and test_pyccd)")

from lcmap_firebird_spark.queries.timeseries import ORACLES, u5_ccd_segments


def _synth_events(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    eid = 0
    # seed 1969 exercises NEGATIVE epoch-µs: epoch-day derivation
    # must be FLOOR division on both engines (Spark F.floor ↔ DuckDB
    # `//`); cast-truncation would shift pre-1970 days by one
    base_day = pd.Timestamp("1969-11-15" if seed == 1969 else "2024-01-01")
    for user in range(20):
        n_days = int(rng.integers(1, 60))
        has_break = user % 3 == 0 and n_days > 15
        break_at = n_days // 2
        for d in range(n_days):
            level = 1000.0 if not (has_break and d >= break_at) else 4000.0
            # 1-3 events per day: the daily aggregate sums decimals
            for _ in range(int(rng.integers(1, 4))):
                rows.append(
                    {
                        "event_id": eid,
                        "ts": base_day
                        + pd.Timedelta(days=d)
                        + pd.Timedelta(minutes=int(rng.integers(0, 1440))),
                        "user_id": user,
                        "event_type": "purchase",
                        # 2-decimal values like the testdata; noise
                        # scale varied so some users sit near the
                        # chi threshold
                        "value": round(
                            float(level + rng.normal(0, 10.0 * (1 + user % 5))),
                            2,
                        ),
                        "props": "{}",
                    }
                )
                eid += 1
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


# seed 7 stays in the default run (functional coverage); the
# 3-seed sweep is slow-gated (r12 VERDICT #2)
@pytest.mark.parametrize(
    "seed", [7] + ([23, 101, 1969] if slow_enabled() else [])
)
def test_u5_oracle_bit_exact_on_synthetic_corpora(spark, tmp_path, seed):
    pdf = _synth_events(seed)
    sf_dir = str(tmp_path / f"sf_synth_{seed}")
    import os

    os.makedirs(sf_dir)
    pdf.to_parquet(f"{sf_dir}/events.parquet", index=False)

    got = u5_ccd_segments(spark, sf_dir).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = con.execute(ORACLES["u5_ccd_segments"]).fetchdf()

    cols = sorted(got.columns)
    assert cols == sorted(want.columns)

    def rows(frame):
        out = []
        for t in frame[cols].itertuples(index=False):
            out.append(
                tuple(
                    None
                    if (isinstance(x, float) and math.isnan(x)) or x is None
                    else x
                    for x in t
                )
            )
        return sorted(out, key=repr)

    g, w = rows(got), rows(want)
    assert len(g) == len(w)
    # EXACT equality — bit-identical doubles, no tolerance
    assert g == w
