"""The correctness gate, run locally: every queries() entry with an
oracle must hash-match its DuckDB twin (exact values, order- and
column-order-insensitive) — the same comparison the driver records in
CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from lcmap_firebird_spark.queries import merged
from .helpers import assert_parity

QUERIES, ORACLES = merged()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, oracle, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        # rows-only check, like the driver's weaker path
        assert df.count() >= 0
        return
    assert_parity(df, oracle, ORACLES[name], name)
