"""Property-based tests for the dedup ladder (hypothesis): the
invariants that make LSH/SimHash trustworthy at scale."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lcmap_firebird_spark.operators import dedup as D

from .helpers import skip_unless_slow

skip_unless_slow("dedup property sweeps (~35 s)")

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=5, max_size=20).map(" ".join),
    min_size=2,
    max_size=8,
)


@_slow
@given(texts=docs_strategy)
def test_identical_docs_always_minhash_collide(spark, texts):
    # duplicate every doc once: exact copies MUST be candidate pairs
    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(100 + i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = D.minhash_signature(df)
    cand = {(r.doc_a, r.doc_b) for r in D.lsh_candidates(sig).collect()}
    for i, t in enumerate(texts):
        if len(t.split()) >= 3:  # needs >= k tokens for shingles
            assert (i, 100 + i) in cand


@_slow
@given(texts=docs_strategy)
def test_jaccard_bounds_and_symmetric_inputs(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    for r in D.jaccard_pairs(df, threshold=0.0).collect():
        assert 0.0 < r.jaccard <= 1.0
        assert r.doc_a < r.doc_b
        assert r.n_common >= 1


@_slow
@given(texts=docs_strategy)
def test_lsh_verified_is_subset_of_exact(spark, texts):
    # the LSH pipeline may MISS pairs (probabilistic recall) but must
    # never invent one: its verified output ⊆ exact jaccard pairs
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.jaccard_pairs(df, threshold=0.3).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.minhash_dedup(df, threshold=0.3).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, j in lsh.items():
        assert j == exact[pair]  # verification is the same exact math


@_slow
@given(texts=docs_strategy)
def test_simhash_identical_zero_distance(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(100 + i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = {r.doc_id: r.simhash for r in D.simhash(df).collect()}
    for i in range(len(texts)):
        assert sh[i] == sh[100 + i]
        assert 0 <= sh[i] < 2**60
