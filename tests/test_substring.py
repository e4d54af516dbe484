"""Exact substring dedup (operators/substring.py) — planted-passage
behavioral tests plus the approx-distinct behavioral check that
replaced the a9 registry row (round 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lcmap_firebird_spark.catalog import read_table
from lcmap_firebird_spark.operators import substring as SUB

PASSAGE = "the quick brown fox jumps over the lazy dog again and again"
# 12 tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _uniq(tag: str, n: int) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


def test_planted_passage_spans(spark):
    """Two docs share a 12-token passage at different offsets; with
    k=8 the flagged grams cover exactly the passage in both docs."""
    a_prefix, a_suffix = _uniq("a", 5), _uniq("b", 4)
    b_prefix = _uniq("c", 9)
    docs = _docs(
        spark,
        [
            (1, f"{a_prefix} {PASSAGE} {a_suffix}"),
            (2, f"{b_prefix} {PASSAGE}"),
            (3, _uniq("z", 30)),
        ],
    )
    spans = SUB.duplicate_spans(docs, k=8).collect()
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans}
    # doc 1: passage occupies tokens [5, 17); doc 2: [9, 21)
    assert got == {(1, 5, 17), (2, 9, 21)}
    # every span of 12 tokens holds 12-8+1 = 5 grams
    assert {r.n_grams for r in spans} == {5}


def test_remove_spans_reconstruction(spark):
    a_prefix, a_suffix = _uniq("a", 5), _uniq("b", 4)
    b_prefix = _uniq("c", 9)
    docs = _docs(
        spark,
        [
            (1, f"{a_prefix} {PASSAGE} {a_suffix}"),
            (2, f"{b_prefix} {PASSAGE}"),
            (3, _uniq("z", 30)),
        ],
    )
    out = {
        r.doc_id: r
        for r in SUB.remove_duplicate_spans(docs, k=8).collect()
    }
    assert out[1].clean_text == f"{a_prefix} {a_suffix}"
    assert out[1].n_dup_tokens == 12
    assert out[2].clean_text == b_prefix
    assert out[2].n_dup_tokens == 12
    # untouched doc round-trips (token-normalized) with zero drops
    assert out[3].clean_text == _uniq("z", 30)
    assert out[3].n_dup_tokens == 0


def test_within_doc_repetition_mode(spark):
    """cross_doc_only=False also flags a gram repeated inside ONE
    document; the default cross-doc mode ignores it."""
    rep = _uniq("r", 8)
    docs = _docs(
        spark,
        [(1, f"{rep} {_uniq('m', 6)} {rep}"), (2, _uniq("q", 25))],
    )
    assert SUB.duplicate_spans(docs, k=8).count() == 0
    spans = SUB.duplicate_spans(docs, k=8, cross_doc_only=False).collect()
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans}
    assert got == {(1, 0, 8), (1, 14, 22)}


def test_overlapping_grams_merge_to_maximal_span(spark):
    """A 20-token shared run yields 13 overlapping flagged 8-grams in
    each doc — they must merge into ONE maximal span, not 13."""
    shared = _uniq("s", 20)
    docs = _docs(
        spark,
        [(1, f"{shared} {_uniq('x', 3)}"), (2, f"{_uniq('y', 4)} {shared}")],
    )
    spans = SUB.duplicate_spans(docs, k=8).collect()
    got = {(r.doc_id, r.span_start, r.span_end, r.n_grams) for r in spans}
    assert got == {(1, 0, 20, 13), (2, 4, 24, 13)}


def test_no_duplicates_no_spans(spark):
    docs = _docs(spark, [(1, _uniq("a", 20)), (2, _uniq("b", 20))])
    assert SUB.duplicate_spans(docs, k=8).count() == 0
    out = SUB.remove_duplicate_spans(docs, k=8).collect()
    assert all(r.n_dup_tokens == 0 for r in out)
    assert {r.clean_text for r in out} == {_uniq("a", 20), _uniq("b", 20)}


def test_zero_udf_plan(spark):
    """The whole pipeline must stay JVM-side: no Python eval node in
    the physical plan of either spans or removal."""
    docs = _docs(spark, [(1, PASSAGE), (2, PASSAGE)])
    for df in (
        SUB.duplicate_spans(docs, k=8),
        SUB.remove_duplicate_spans(docs, k=8),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


def test_approx_distinct_behavioral(spark, sf_dir):
    """approx_count_distinct stays within its stated 1% rsd of the
    exact count — the behavioral coverage for the unregistered a9."""
    li = read_table(spark, "lineitem", sf_dir)
    approx, exact = li.agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("a"),
        F.count_distinct("l_orderkey").alias("e"),
    ).first()
    assert abs(approx - exact) <= max(0.03 * exact, 5)


# --- model-based property: spans == pure-Python reference ------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_token = st.sampled_from(["a", "b", "c", "d"])
_doc = st.lists(_token, min_size=0, max_size=24).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=6)


def _spans_py(texts, k):
    toked = {i: t.split() for i, t in enumerate(texts)}
    occ = {}
    for d, toks in toked.items():
        for p in range(len(toks) - k + 1):
            occ.setdefault(" ".join(toks[p : p + k]), []).append((d, p))
    flagged = {
        g: ps for g, ps in occ.items() if len({d for d, _ in ps}) >= 2
    }
    per_doc = {}
    for ps in flagged.values():
        for d, p in ps:
            per_doc.setdefault(d, []).append(p)
    out = set()
    for d, positions in per_doc.items():
        positions.sort()
        start, end, n = positions[0], positions[0] + k, 1
        for p in positions[1:]:
            if p > end:
                out.add((d, start, end, n))
                start, end, n = p, p + k, 1
            else:
                end, n = max(end, p + k), n + 1
        out.add((d, start, end, n))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_spans_match_python_model(spark, texts):
    k = 3
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in SUB.duplicate_spans(docs, k=k).collect()
    }
    assert got == _spans_py(texts, k)
