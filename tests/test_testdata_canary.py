"""Testdata-contract canary.

The driver regenerates /root/testdata between rounds and has already
changed a physical type once (events.ts: TIMESTAMP(NANOS) -> int64
-> timestamp[us]; that regen silently broke 8 CORRECTNESS rows and
crashed the bench in round 2). The ts family is now
generation-normalized (catalog.read_table + test_ts_generations.py),
but OTHER silent contract changes would still corrupt quietly — the
worst being the embedding dimension: `lsh_buckets`/IVF plane vectors
are built for EMBED_DIM components, and `zip_with` pads a shorter or
longer vector with nulls → null dot products → every vector lands in
a garbage bucket with no error raised.

This module pins the full contract (column names, logical types up
to the normalizations we handle, embedding dim) so any regen fails
pytest IMMEDIATELY with a message naming exactly what moved, before
the driver's correctness run spends its rows. pyarrow-only: no Spark
session needed, runs in milliseconds.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = [d for d in glob.glob("/root/testdata/sf*") if os.path.isdir(d)]

# name -> (columns in order, types we rely on; ts-like columns accept
# any timestamp flavor OR int64 because catalog.read_table normalizes
# those generations)
_TS_OK = ("timestamp", "int64")
EXPECTED: dict[str, list[tuple[str, tuple[str, ...] | str]]] = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int"),
        ("n_name", "string"),
        ("n_regionkey", "int"),
    ],
    "customer": [
        ("c_custkey", "int"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "int"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "int"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "int"),
        ("o_custkey", "int"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", _TS_OK),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "int"),
        ("l_partkey", "int"),
        ("l_suppkey", "int"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", _TS_OK),
    ],
    "events": [
        ("event_id", "int"),
        ("ts", _TS_OK),
        ("user_id", "int"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "int"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "int"),
    ],
    "embeddings": [
        ("vec_id", "int"),
        ("embedding", "list"),
        ("label", "int"),
    ],
}

EMBED_DIM = 64  # lsh_buckets/_ivf plane vectors are built for this


def _type_ok(actual: str, want) -> bool:
    if isinstance(want, tuple):
        return any(actual.startswith(w) for w in want)
    return actual.startswith(want)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_schema_contract(sf_dir, table):
    path = os.path.join(sf_dir, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    schema = pq.read_schema(path)
    got = [(f.name, str(f.type)) for f in schema]
    want = EXPECTED[table]
    assert [g[0] for g in got] == [w[0] for w in want], (
        f"TESTDATA REGEN CHANGED COLUMNS of {table} at {sf_dir}: "
        f"{got} — update catalog/queries before trusting any red "
        "correctness row"
    )
    for (name, typ), (_, wanted) in zip(got, want):
        assert _type_ok(typ, wanted), (
            f"TESTDATA REGEN CHANGED TYPE of {table}.{name} at "
            f"{sf_dir}: {typ} (expected {wanted}) — see "
            "test_ts_generations.py for the ts playbook"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embedding_dim_pinned(sf_dir):
    """zip_with against a fixed-width plane silently null-pads on a
    dim mismatch — this canary turns that into a loud failure."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    col = pq.read_table(path, columns=["embedding"]).column("embedding")
    lens = {len(v) for chunk in col.chunks for v in chunk.to_pylist()[:50]}
    assert lens == {EMBED_DIM}, (
        f"TESTDATA REGEN CHANGED EMBEDDING DIM at {sf_dir}: {lens} "
        f"(operators assume {EMBED_DIM}) — update similarity.py dim "
        "defaults AND the generated oracle SQL together"
    )
