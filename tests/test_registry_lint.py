"""Registry-wide schema lint.

The driver canonicalizes EVERY query's output — rows-only entries
included — with ``pandas.sort_values`` over raw cells, which raises
``TypeError: unhashable type`` on list/dict cells. Rounds 1–3 each
lost at least one row to this (p5 in r1, u5 in r2+r3), so this lint
makes a complex-typed top-level column a pytest failure long before
the driver runs.

Plan-only: schemas come from the logical plan, no job is executed.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from lcmap_firebird_spark.queries import merged

QUERIES, ORACLES = merged()


def test_registry_pinned_at_50():
    """The driver records at most 50 entries; keep exactly 50 so no
    operator family falls outside the correctness window."""
    assert len(QUERIES) == 50


def test_oracles_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_complex_top_level_columns(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name} exposes complex-typed column(s) {bad}; the driver's "
        "pandas canonicalizer crashes on these — scalarize "
        "(element_at/posexplode/to_json) in the registry projection"
    )
