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


def _bm25_py_quantized(corpus, terms, scale=1_000_000):
    """Independent per-term-quantized replica: round each contribution
    BEFORE the per-doc sum, exactly the operator's contract."""
    toked = {d: (t.split() if t is not None else None) for d, t in corpus}
    n = len(toked)
    lens = [len(t) for t in toked.values() if t is not None]
    avgdl = sum(lens) / len(lens)
    out = {}
    for term in terms:
        df = sum(1 for t in toked.values() if t and term in t)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, t in toked.items():
            tf = t.count(term) if t else 0
            if tf == 0:
                continue
            w = (
                idf
                * (tf * (R.K1 + 1))
                / (tf + R.K1 * (1 - R.B + R.B * len(t) / avgdl))
            )
            q, h = out.get(d, (0, 0))
            # Python round() is banker's; the engines round half up —
            # never a tie here (w·1e6 is irrational-ish), use floor+.5
            out[d] = (q + math.floor(w * scale + 0.5), h + 1)
    return out


def test_quantized_matches_pure_python_and_nulls(spark):
    docs = DOCS + [(6, None), (7, ""), (8, "nothing relevant here")]
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    terms = ("spark", "fox", "shuffle")
    got = {
        r.doc_id: (r.bm25_q, r.n_hit_terms)
        for r in R.bm25_quantized(corpus, terms).collect()
    }
    want = _bm25_py_quantized(docs, terms)
    assert len(got) == len(docs)  # left join keeps every corpus row
    for d, _ in docs:
        if d in want:
            assert got[d] == want[d], d
        else:  # NULL text / no hits -> NULL score, not zero
            assert got[d] == (None, None), d


def test_quantized_agrees_with_float_topk(spark, frames):
    """bm25_q / 1e6 must approximate the production float score for a
    single-query run over the same corpus (quantization tolerance =
    n_terms · 0.5e-6)."""
    corpus, _ = frames
    queries = corpus.sparkSession.createDataFrame(
        [(1, "spark shuffle")], "query_id long, query string"
    )
    flt = {
        r.doc_id: r.score
        for r in R.bm25_topk(corpus, queries, k=10).collect()
    }
    qnt = {
        r.doc_id: r.bm25_q
        for r in R.bm25_quantized(corpus, ("spark", "shuffle")).collect()
        if r.bm25_q is not None
    }
    assert set(flt) == set(qnt)
    for d, s in flt.items():
        assert qnt[d] / 1e6 == pytest.approx(s, abs=1e-6)


def test_quantized_oracle_twin_parity(spark):
    """The DuckDB twin fragment reproduces bm25_q/n_hit_terms
    bit-for-bit on a corpus with NULL/empty/no-hit rows."""
    duckdb = pytest.importorskip("duckdb")
    docs = DOCS + [(6, None), (7, ""), (8, "unrelated words only")]
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    terms = ("spark", "dog", "shuffle")
    got = {
        r.doc_id: (r.bm25_q, r.n_hit_terms)
        for r in R.bm25_quantized(corpus, terms).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    twin = R.bm25_sql_twin(terms)
    pdf = con.execute(
        f"WITH {twin} SELECT d.doc_id, bm25.bm25_q, bm25.n_hit_terms "
        "FROM documents d LEFT JOIN bm25 USING (doc_id)"
    ).fetchdf()
    want = {
        int(r.doc_id): (
            None if pdf.bm25_q.isna()[i] else int(r.bm25_q),
            None if pdf.n_hit_terms.isna()[i] else int(r.n_hit_terms),
        )
        for i, r in pdf.iterrows()
    }
    assert got == want
