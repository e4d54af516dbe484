"""Deterministic hash-sampling invariants: stability across runs,
split disjointness/exhaustiveness, salt decorrelation."""

from __future__ import annotations

from lcmap_firebird_spark.catalog import read_table
from lcmap_firebird_spark.operators.sampling import (
    hash_sample,
    train_val_test,
)


def test_hash_sample_is_stable_and_subsets_nest(spark, sf_dir):
    docs = read_table(spark, "documents", sf_dir)
    s10_a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.10).select("doc_id").collect()}
    s10_b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.10).select("doc_id").collect()}
    s20 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.20).select("doc_id").collect()}
    assert s10_a == s10_b  # pure function of key
    assert s10_a <= s20  # larger fraction nests the smaller
    n = docs.count()
    assert 0.05 * n < len(s10_a) < 0.15 * n


def test_split_disjoint_exhaustive_deterministic(spark, sf_dir):
    docs = read_table(spark, "documents", sf_dir)
    a = {r.doc_id: r.split for r in train_val_test(docs, "doc_id").collect()}
    b = {r.doc_id: r.split for r in train_val_test(docs, "doc_id").collect()}
    assert a == b
    assert set(a) == {r.doc_id for r in docs.select("doc_id").collect()}
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    assert 0.7 * n < train < 0.9 * n


def test_salt_decorrelates_splits(spark, sf_dir):
    docs = read_table(spark, "documents", sf_dir)
    s1 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, salt="a").select("doc_id").collect()}
    s2 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, salt="b").select("doc_id").collect()}
    assert s1 != s2
    n = docs.count()
    overlap = len(s1 & s2) / n
    assert 0.15 < overlap < 0.35  # ~25% for independent 50% samples


def test_stratified_hash_sample_deterministic_and_proportional(spark, sf_dir):
    """Membership is a pure key function (identical row sets across
    invocations) and per-stratum rates track the requested fractions;
    unlisted strata are dropped (sampleBy semantics)."""
    from lcmap_firebird_spark.catalog import read_table
    from lcmap_firebird_spark.operators.sampling import stratified_hash_sample

    docs = read_table(spark, "documents", sf_dir)
    fr = {"en": 0.5, "de": 0.2}
    a = stratified_hash_sample(docs, "lang", "doc_id", fr)
    b = stratified_hash_sample(docs, "lang", "doc_id", fr)
    got = sorted(r.doc_id for r in a.select("doc_id").collect())
    assert got == sorted(r.doc_id for r in b.select("doc_id").collect())

    totals = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    kept = {r.lang: r.n for r in a.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert set(kept) <= set(fr)  # unlisted strata dropped
    for lang, frac in fr.items():
        if totals.get(lang, 0) >= 50:
            rate = kept.get(lang, 0) / totals[lang]
            assert abs(rate - frac) < 0.15, (lang, rate, frac)


def test_null_keys_split_consistently(spark):
    """NULL keys hash to one deterministic bucket: hash_sample no
    longer silently drops them and train_val_test no longer dumps
    them all into 'test' by default — both surfaces agree."""
    from lcmap_firebird_spark.operators.sampling import (
        hash_sample,
        train_val_test,
    )

    df = spark.createDataFrame(
        [(1,), (2,), (None,), (None,)], "doc_id long"
    )
    kept = hash_sample(df, "doc_id", 1.0)
    assert kept.count() == 4  # keep-everything keeps NULL keys too
    split = {
        (r["doc_id"], r["split"])
        for r in train_val_test(df, "doc_id").collect()
    }
    null_splits = {s for k, s in split if k is None}
    assert len(null_splits) == 1  # both NULL rows land together
    # and membership in hash_sample matches the split thresholds:
    # fraction 0 keeps nothing, NULLs included
    assert hash_sample(df, "doc_id", 0.0).count() == 0
