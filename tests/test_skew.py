"""Salted join/agg: identical results to plain ops on skewed data,
with the salt actually spreading the hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.operators.skew import salted_agg_count, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows of hot key 1, a few of keys 2..5
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.createDataFrame(
        [(k, 0) for k in range(2, 6)], ["k", "v"]
    )
    return hot.unionByName(cold)


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(1, 6)], ["k", "name"]
    )
    plain = skewed.join(dim, ["k"]).groupBy("k", "name").count()
    salted = salted_join(skewed, dim, ["k"], salt=4).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark, skewed):
    dim = spark.createDataFrame([(1, "one")], ["k", "name"])
    out = salted_join(skewed, dim, ["k"], salt=4, how="left")
    assert out.count() == skewed.count()
    nulls = out.filter(F.col("name").isNull()).select("k").distinct().collect()
    assert {r.k for r in nulls} == {2, 3, 4, 5}


def test_salted_agg_count_matches(spark, skewed):
    got = {r.k: r.n for r in salted_agg_count(skewed, ["k"], salt=4).collect()}
    want = {r.k: r["count"] for r in skewed.groupBy("k").count().collect()}
    assert got == want


# --- BM25 document-frequency salting (VERDICT r6 #5) -----------------------


@pytest.fixture(scope="module")
def hot_term_corpus(spark):
    # every doc contains the Zipf-hot term "the"; each also carries a
    # unique discriminating term and a repeated filler so tf > 1
    rows = [
        (i, f"the the uniq{i} filler{i % 7} the uniq{i}")
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_frequency_salted_row_identical(spark, hot_term_corpus):
    from lcmap_firebird_spark.operators.retrieval import (
        doc_frequency,
        postings,
    )

    post = postings(hot_term_corpus).localCheckpoint(eager=True)
    plain = {r.term: r.df for r in doc_frequency(post).collect()}
    salted = {r.term: r.df for r in doc_frequency(post, salt=8).collect()}
    assert salted == plain
    assert plain["the"] == 400  # the hot term really is hot


def test_doc_frequency_salted_plan_is_two_level(spark, hot_term_corpus):
    """The salted plan must actually spread the hot group: a partial
    aggregate keyed by (term, _salt) under a merge keyed by term —
    i.e. the salt column reaches the first-level grouping and is gone
    from the output."""
    from lcmap_firebird_spark.operators.retrieval import (
        doc_frequency,
        postings,
    )

    post = postings(hot_term_corpus)
    salted = doc_frequency(post, salt=8)
    assert salted.columns == ["term", "df"]
    plan = salted._jdf.queryExecution().executedPlan().toString()
    # first-level grouping carries the salt key...
    assert "_salt" in plan, "salt column never reached the plan"
    # ...and a second level merges the partials per term
    assert "sum(_n" in plan or "partial_sum(_n" in plan


def test_bm25_topk_salted_row_identical(spark, hot_term_corpus):
    """bm25_topk(salt_terms=8) == bm25_topk() exactly. Single-term
    queries keep every per-doc score a one-element sum, so float
    equality is exact (no reassociation surface)."""
    from lcmap_firebird_spark.operators.retrieval import bm25_topk

    queries = spark.createDataFrame(
        [(1, "the"), (2, "uniq3"), (3, "filler2")],
        "query_id long, query string",
    )
    plain = bm25_topk(hot_term_corpus, queries, k=5).collect()
    salted = bm25_topk(hot_term_corpus, queries, k=5, salt_terms=8).collect()
    assert sorted(map(tuple, plain), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, salted), key=lambda t: (t[0], t[3])
    )
    assert len(plain) > 0


def test_salted_join_rejects_small_side_preserving_types(spark, skewed):
    """right/full outer would duplicate an unmatched small row salt
    times (it exists once per salt after the explode) — rejected
    loudly rather than silently wrong (r8 review)."""
    import pytest

    dim = spark.createDataFrame([(1, "one"), (99, "unmatched")], ["k", "name"])
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(skewed, dim, ["k"], salt=4, how=how)
    # big-side-preserving types still pass through
    assert salted_join(skewed, dim, ["k"], salt=4, how="left_anti").count() >= 0


def test_salted_join_accepts_semi_anti_aliases_rejects_cross(spark, skewed):
    """'semi'/'anti' are Spark-valid aliases for the left variants and
    big-side-preserving — they must pass (r8 ADVICE: the whitelist
    wrongly rejected them). 'cross' is rejected: Spark itself refuses
    df.join(on=keys, how='cross'), so allowing it only deferred the
    error to a confusing Spark exception."""
    import pytest

    dim = spark.createDataFrame([(1, "one"), (99, "unmatched")], ["k", "name"])
    plain_semi = skewed.join(dim, ["k"], "semi")
    salted_semi = salted_join(skewed, dim, ["k"], salt=4, how="semi")
    assert sorted(map(tuple, plain_semi.collect())) == sorted(
        map(tuple, salted_semi.collect())
    )
    plain_anti = skewed.join(dim, ["k"], "anti")
    salted_anti = salted_join(skewed, dim, ["k"], salt=4, how="anti")
    assert sorted(map(tuple, plain_anti.collect())) == sorted(
        map(tuple, salted_anti.collect())
    )
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(skewed, dim, ["k"], salt=4, how="cross")
