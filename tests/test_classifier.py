"""Hashed linear quality classifier (operators/classifier.py):
training math vs a pure-Python model, separation on planted corpora,
determinism, and a JVM-only plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.operators import classifier as CL
from lcmap_firebird_spark.operators.dedup import hash60  # noqa: F401

GOOD = [
    "the committee published its findings after careful review",
    "researchers measured the effect with a controlled experiment",
    "the library catalog lists every edition in the archive",
]
BAD = [
    "click here buy now cheap cheap deals click now",
    "winner winner claim your free prize now click",
    "cheap prize deals free free click buy",
]


def _bucket_py(tok: str, n: int) -> int:
    import hashlib

    h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
    return h % n


def _train_py(labeled, n_buckets, alpha=1.0):
    pos, neg = {}, {}
    tp = tn = dp = dn = 0
    for y, text in labeled:
        toks = text.split()
        if y:
            dp += 1
        else:
            dn += 1
        for t in toks:
            b = _bucket_py(t, n_buckets)
            if y:
                pos[b] = pos.get(b, 0) + 1
                tp += 1
            else:
                neg[b] = neg.get(b, 0) + 1
                tn += 1
    ad = alpha * n_buckets
    w = {
        b: math.log((pos.get(b, 0) + alpha) / (tp + ad))
        - math.log((neg.get(b, 0) + alpha) / (tn + ad))
        for b in set(pos) | set(neg)
    }
    bias = math.log((dp + alpha) / (dn + alpha))
    return w, bias


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(i, 1, t) for i, t in enumerate(GOOD)] + [
        (100 + i, 0, t) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(rows, "doc_id long, label int, text string")


def test_training_matches_python_model(spark, labeled):
    n = 256
    weights, bias = CL.train_log_odds(labeled, n_buckets=n)
    got = {r["bucket"]: r["w"] for r in weights.collect()}
    want_w, want_bias = _train_py(
        [(r.label, r.text) for r in labeled.collect()], n
    )
    assert bias == pytest.approx(want_bias, rel=1e-12)
    assert set(got) == set(want_w)
    for b, w in want_w.items():
        assert got[b] == pytest.approx(w, rel=1e-12)


def test_scores_separate_planted_quality(spark, labeled):
    n = 256
    weights, bias = CL.train_log_odds(labeled, n_buckets=n)
    unseen = spark.createDataFrame(
        [
            (1, "the committee measured the archive with careful review"),
            (2, "free prize click now cheap deals buy now"),
        ],
        "doc_id long, text string",
    )
    scored = {
        r.doc_id: r.quality_score
        for r in CL.score_quality(unseen, weights, bias, n_buckets=n).collect()
    }
    assert scored[1] > 0.5 > scored[2]
    kept = CL.quality_gate_model(
        unseen, weights, bias, threshold=0.5, n_buckets=n
    ).collect()
    assert [r.doc_id for r in kept] == [1]


def test_empty_doc_scores_sigmoid_bias(spark, labeled):
    weights, bias = CL.train_log_odds(labeled, n_buckets=256)
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    (row,) = CL.score_quality(df, weights, bias, n_buckets=256).collect()
    assert row.quality_score == pytest.approx(
        1.0 / (1.0 + math.exp(-bias)), rel=1e-12
    )


def test_deterministic_and_jvm_only(spark, labeled):
    n = 256
    w1, b1 = CL.train_log_odds(labeled, n_buckets=n)
    w2, b2 = CL.train_log_odds(labeled, n_buckets=n)
    assert b1 == b2
    assert sorted(map(tuple, w1.collect())) == sorted(map(tuple, w2.collect()))
    df = CL.score_quality(labeled, w1, b1, n_buckets=n)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
