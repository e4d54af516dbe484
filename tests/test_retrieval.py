"""BM25 retrieval (operators/retrieval.py) vs an independent pure-
Python implementation of the same public formula."""

from __future__ import annotations

import math

import pytest

from lcmap_firebird_spark.operators import retrieval as R

DOCS = [
    (1, "spark shuffles data between stages during wide operations"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "spark spark spark tuning shuffle partitions for spark jobs"),
    (4, "a dog and a fox shared a quiet afternoon"),
    (5, "broadcast joins avoid the shuffle for small dimension tables"),
]


def _bm25_py(corpus, query, k1=R.K1, b=R.B):
    toked = {d: t.split() for d, t in corpus}
    n = len(toked)
    avgdl = sum(len(t) for t in toked.values()) / n
    scores = {}
    for term in dict.fromkeys(query.split()):
        df = sum(1 for t in toked.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, t in toked.items():
            tf = t.count(term)
            if tf == 0:
                continue
            w = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            scores[d] = scores.get(d, 0.0) + w
    return scores


@pytest.fixture(scope="module")
def frames(spark):
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(10, "spark shuffle"), (20, "fox dog"), (30, "warehouse")],
        "query_id long, query string",
    )
    return corpus, queries


def test_scores_match_pure_python(spark, frames):
    corpus, queries = frames
    got = R.bm25_topk(corpus, queries, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, {})[r.doc_id] = r.score
    for qid, qtext in [(10, "spark shuffle"), (20, "fox dog")]:
        want = _bm25_py(DOCS, qtext)
        assert set(by_q[qid]) == set(want)
        for d, s in want.items():
            assert by_q[qid][d] == pytest.approx(s, rel=1e-12)
    # no corpus doc contains 'warehouse'
    assert 30 not in by_q


def test_topk_and_rank_deterministic(spark, frames):
    corpus, queries = frames
    got = R.bm25_topk(corpus, queries, k=2).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    for qid, rows in per_q.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        # ranks ordered by descending score
        scores = [r[2] for r in rows]
        assert scores == sorted(scores, reverse=True)
    # query 'spark shuffle': doc 3 (spark x4 + shuffle) must rank 1
    assert per_q[10][0][1] == 3


def test_zero_udf_and_broadcast_query_side(spark, frames):
    corpus, queries = frames
    df = R.bm25_topk(corpus, queries, k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
