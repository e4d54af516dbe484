"""Incremental dedup invariant: merging batches through the persisted
signature store yields byte-identical pairs to the one-shot batch
pipeline over the union — incremental is an execution strategy, not a
different answer."""

from __future__ import annotations

import pytest

from .helpers import fuzz_seeds, slow_enabled
from pyspark.sql import functions as F

from lcmap_firebird_spark.catalog import read_table
from lcmap_firebird_spark.operators import incremental as I
from lcmap_firebird_spark.operators.dedup import minhash_dedup

THRESH = 0.3


def _pairs_set(df):
    return {
        (r["doc_a"], r["doc_b"], r["n_common"], round(r["jaccard"], 12))
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, "documents", sf_dir).cache()


def test_signature_table_shape(spark, docs):
    sig = I.signature_table(docs)
    names = [f.name for f in sig.schema.fields]
    assert names[:2] == ["doc_id", "fp"]
    assert "h0" in names and "h15" in names and "n_sh" in names
    assert sig.count() == docs.count()
    # short docs keep a fingerprint even with no shingles
    short = sig.filter(F.col("n_sh").isNull())
    assert short.filter(F.col("fp").isNull()).count() == 0


def test_merge_batch_upsert(spark, docs):
    base = I.signature_table(docs.filter(F.col("doc_id") % 2 == 0))
    batch = I.signature_table(docs.filter(F.col("doc_id") % 3 == 0))
    merged = I.merge_batch(base, batch)
    # distinct doc_ids, batch wins collisions, nothing dropped
    want = docs.filter((F.col("doc_id") % 2 == 0) | (F.col("doc_id") % 3 == 0))
    assert merged.count() == want.count()
    assert merged.select("doc_id").distinct().count() == merged.count()


def test_incremental_equals_batch(spark, docs):
    """Base + two successive batch merges == one-shot pipeline."""
    base = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)

    oneshot = minhash_dedup(docs, threshold=THRESH, exact_first=False)

    store0 = I.signature_table(base).cache()
    p0 = minhash_dedup(base, threshold=THRESH, exact_first=False)
    corpus1 = base.unionByName(b1)
    p1 = I.incremental_pairs(corpus1, store0, b1, threshold=THRESH)
    store1 = I.merge_batch(store0, I.signature_table(b1)).cache()
    corpus2 = corpus1.unionByName(b2)
    p2 = I.incremental_pairs(corpus2, store1, b2, threshold=THRESH)

    got = _pairs_set(p0) | _pairs_set(p1) | _pairs_set(p2)
    assert got == _pairs_set(oneshot)


def test_store_roundtrip_bucketed(spark, docs):
    sig = I.signature_table(docs.limit(200))
    I.write_signature_store(sig, table_name="t_sig_store", num_buckets=4)
    try:
        back = spark.table("t_sig_store")
        assert back.count() == sig.count()
        assert {f.name for f in back.schema.fields} == {
            f.name for f in sig.schema.fields
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS t_sig_store")


def test_fp_exact_pairs_for_short_docs(spark):
    """Docs too short to shingle carry NULL signatures and can never
    band-match — include_fp_exact pairs byte-identical ones via the
    store's content fingerprint."""
    import lcmap_firebird_spark.operators.incremental as I

    base = spark.createDataFrame(
        [(1, "hi there"), (2, "some much longer document body here ok")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(3, "hi there"), (4, "unrelated")],
        "doc_id long, text string",
    )
    store = I.signature_table(base)
    corpus = base.unionByName(batch)
    default = I.incremental_pairs(corpus, store, batch, threshold=0.5)
    assert default.filter("doc_a = 1 AND doc_b = 3").count() == 0
    withfp = I.incremental_pairs(
        corpus, store, batch, threshold=0.5, include_fp_exact=True
    )
    got = [
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in withfp.filter("doc_a = 1").collect()
    ]
    assert got == [(1, 3, 1.0)]


@pytest.mark.parametrize(
    "seed",
    fuzz_seeds([11, 47] if slow_enabled() else [11], base=8400),
)
def test_incremental_equals_batch_random_splits(spark, docs, seed):
    """Fuzzed form of the invariant: ANY random partition of the
    corpus into 2-5 arrival batches, folded through the signature
    store, must union to the one-shot pairs byte-identically —
    arrival order is an execution detail, never an answer change."""
    import random

    rng = random.Random(seed)
    n_batches = rng.randint(2, 5)
    salt = rng.randrange(1 << 30)
    assign = (F.xxhash64(F.col("doc_id") + F.lit(salt)) % n_batches
              + n_batches) % n_batches
    batches = [docs.filter(assign == i) for i in range(n_batches)]
    # every doc lands in exactly one batch
    assert sum(b.count() for b in batches) == docs.count()

    oneshot = _pairs_set(minhash_dedup(docs, threshold=THRESH, exact_first=False))

    store = None
    corpus = None
    got = set()
    for b in batches:
        if store is None:
            corpus = b
            store = I.signature_table(b).cache()
            got |= _pairs_set(
                minhash_dedup(b, threshold=THRESH, exact_first=False)
            )
            continue
        corpus = corpus.unionByName(b)
        got |= _pairs_set(I.incremental_pairs(corpus, store, b, threshold=THRESH))
        store = I.merge_batch(store, I.signature_table(b)).cache()
    assert got == oneshot, f"seed {seed} ({n_batches} batches) diverged"
