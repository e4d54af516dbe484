"""The driver-replica comparison used by tools/driver_sim.py AND the
oracle mutation tests (tests/test_oracle_mutation.py).

One implementation on purpose (r8 VERDICT #1): the mutation tests
certify that THIS comparison — the exact canonicalization +
normalization the round driver applies — goes red when a query is
perturbed; driver_sim importing the same functions means the
certified code is the code that runs.

Canonicalization deliberately mirrors the driver's: EVERY query's
pandas output — rows-only entries included — is sorted with
``pandas.sort_values`` over the RAW cells. List/array/struct cells
make that crash (``TypeError: unhashable type: 'list'``) exactly like
the real driver (rounds 1/2/3 tracebacks in CORRECTNESS_r*.json), so
a list-typed registry output can never pass here and fail there.
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd


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
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.to_datetime64().astype("datetime64[us]").item()
    return v


def compare(got: pd.DataFrame, want: pd.DataFrame) -> dict:
    """The driver's verdict dimensions over two canon() frames:
    row count, schema (column names), dtype KINDS, order-insensitive
    value multiset. Returns {'rows_match', 'schema_match',
    'kinds_match', 'hash_match'}.

    kinds_match (r12): the round driver's schema check is
    dtype-sensitive — DuckDB's SUM(BIGINT) → HUGEINT surfaces as
    float64 and failed a round against Spark's int64 even though the
    VALUES compare equal (5 == 5.0 in Python, so hash_match alone
    cannot see the drift; CLAUDE.md invariant 1). The pre-gate must
    be at least as strict. KIND (i/u/f/O/M/b), not exact dtype:
    int32-vs-int64 and datetime64[ns]-vs-[us] are representation
    details the two engines vary freely (measured: all 50 registry
    slots kind-identical at sf0.01)."""
    got, want = canon(got), canon(want)
    cols_ok = sorted(got.columns) == sorted(want.columns)
    kinds_ok = cols_ok and all(
        got[c].dtype.kind == want[c].dtype.kind for c in got.columns
    )
    n_ok = len(got) == len(want)
    g = sorted(
        (tuple(norm(r[c]) for c in sorted(got.columns)) for _, r in got.iterrows()),
        key=repr,
    )
    w = sorted(
        (tuple(norm(r[c]) for c in sorted(want.columns)) for _, r in want.iterrows()),
        key=repr,
    )
    return {
        "rows_match": n_ok,
        "schema_match": cols_ok,
        "kinds_match": kinds_ok,
        "hash_match": cols_ok and n_ok and g == w,
    }
