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


def test_registry_side_effect_exception_is_x5_only():
    """Registry queries are read-only scans of sf_dir — with exactly
    one documented exception: x5_upsert CREATES a LakeTable under a
    tmpdir (atexit-cleaned) because the row certifies the
    transactional ACID MERGE itself, which cannot be expressed as a
    pure read. Do NOT copy that pattern into new consolidations; a
    second writer would make registry runs order-dependent and race
    the driver's parallel query execution. This test pins the
    exception by name so a new side-effecting query must consciously
    edit it (and this docstring's reasoning) to land."""
    import inspect

    from lcmap_firebird_spark.queries import extended

    src = inspect.getsource(extended.x5_upsert)
    assert "mkdtemp" in src or "TemporaryDirectory" in src
    # every other query module must not create lake tables or write
    # outside sf_dir at query-build time — enforced by review + this
    # canary: only extended.py may reference the LakeTable writer.
    from lcmap_firebird_spark import queries as qpkg
    import pathlib

    qdir = pathlib.Path(qpkg.__file__).parent
    offenders = []
    for py in qdir.glob("*.py"):
        text = py.read_text()
        if "LakeTable.create" in text and py.name != "extended.py":
            offenders.append(py.name)
    assert not offenders, (
        f"{offenders} create LakeTables; x5_upsert in extended.py is "
        "the registry's only sanctioned side-effecting query"
    )


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
