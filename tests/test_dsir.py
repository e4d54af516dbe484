"""DSIR importance resampling (operators/dsir.py) vs an independent
pure-Python implementation of the paper's recipe with the same
md5-derived hashing."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.operators.dsir import (
    DSIR_BUCKETS,
    DSIR_QUANT,
    dsir_sample,
    feature_counts,
    importance_weights,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text: str) -> list[str]:
    t = [w for w in re.split(r"\s+", text) if w]
    return t + [" ".join(p) for p in zip(t, t[1:])]


def _buckets(text: str, B: int) -> Counter:
    return Counter(_h60(g) % B for g in _grams(text))


def _counts(texts: list[str], B: int) -> Counter:
    c = Counter()
    for t in texts:
        c.update(_buckets(t, B))
    return c


def _log_w(text: str, tc: Counter, rc: Counter, B: int, k: float = 1.0):
    tt, tr = sum(tc.values()), sum(rc.values())
    w = 0.0
    for b, n in _buckets(text, B).items():
        lp_t = math.log((tc.get(b, 0) + k) / (tt + k * B))
        lp_r = math.log((rc.get(b, 0) + k) / (tr + k * B))
        w += n * (lp_t - lp_r)
    return w


def _gumbel(doc_id: int, salt: str = "dsir") -> float:
    u = (_h60(f"{salt}{doc_id}") + 0.5) / float(1 << 60)
    return -math.log(-math.log(u))


@pytest.fixture(scope="module")
def corpora(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target = docs.filter("lang = 'en'").limit(60)
    raw = docs
    return docs, target, raw


def test_weights_match_pure_python(spark, corpora):
    docs, target, raw = corpora
    tc = feature_counts(target)
    rc = feature_counts(raw)
    got = {
        r["doc_id"]: r["log_w"]
        for r in importance_weights(docs.limit(80), tc, rc).collect()
    }
    t_texts = [r["text"] for r in target.collect()]
    r_texts = [r["text"] for r in raw.collect()]
    tpy = _counts(t_texts, DSIR_BUCKETS)
    rpy = _counts(r_texts, DSIR_BUCKETS)
    want = {
        r["doc_id"]: _log_w(r["text"], tpy, rpy, DSIR_BUCKETS)
        for r in docs.limit(80).collect()
    }
    assert set(got) == set(want)
    for i in got:
        assert got[i] == pytest.approx(want[i], rel=1e-9, abs=1e-9)


def test_sample_is_gumbel_topk_and_deterministic(spark, corpora):
    docs, target, raw = corpora
    tc = feature_counts(target)
    rc = feature_counts(raw)
    sel = dsir_sample(docs, tc, rc, k=50)
    ids = {r["doc_id"] for r in sel.collect()}
    assert len(ids) == 50
    # pure-Python Gumbel top-k with the same deterministic noise
    t_texts = [r["text"] for r in target.collect()]
    r_texts = [r["text"] for r in raw.collect()]
    tpy = _counts(t_texts, DSIR_BUCKETS)
    rpy = _counts(r_texts, DSIR_BUCKETS)
    keys = {
        r["doc_id"]: _log_w(r["text"], tpy, rpy, DSIR_BUCKETS)
        + _gumbel(r["doc_id"])
        for r in docs.collect()
    }
    want = set(sorted(keys, key=lambda i: (-keys[i], i))[:50])
    assert ids == want
    # rerun: identical selection (no RNG state anywhere)
    again = {r["doc_id"] for r in dsir_sample(docs, tc, rc, k=50).collect()}
    assert again == ids


def test_self_raw_model_shared_explode_equals_explicit(spark, corpora):
    docs, target, raw = corpora
    tc = feature_counts(target)
    explicit = {
        r["doc_id"]: r["log_w"]
        for r in importance_weights(docs, tc, feature_counts(docs)).collect()
    }
    shared = {
        r["doc_id"]: r["log_w"]
        for r in importance_weights(docs, tc, None).collect()
    }
    assert explicit == shared
    a = {r["doc_id"] for r in dsir_sample(docs, tc, None, k=30).collect()}
    b = {
        r["doc_id"]
        for r in dsir_sample(docs, tc, feature_counts(docs), k=30).collect()
    }
    assert a == b


def test_selection_is_biased_toward_target(spark, corpora):
    docs, target, raw = corpora
    tc = feature_counts(target)
    rc = feature_counts(raw)
    w = importance_weights(docs, tc, rc)
    means = {
        r["lang"]: r["m"]
        for r in w.groupBy("lang").agg(F.avg("log_w").alias("m")).collect()
    }
    # the en-target model should weight en docs above every other lang
    assert means["en"] == max(means.values())


def _round_half_up(x: float) -> int:
    """Spark's ROUND (HALF_UP, away from zero) — Python round() is
    banker's and would diverge at exact .5 boundaries."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _log_w_q(text, tc, rc, B, scale=DSIR_QUANT, k: float = 1.0) -> int:
    tt, tr = sum(tc.values()), sum(rc.values())
    w = 0
    for b, n in _buckets(text, B).items():
        lp_t = math.log((tc.get(b, 0) + k) / (tt + k * B))
        lp_r = math.log((rc.get(b, 0) + k) / (tr + k * B))
        w += n * _round_half_up((lp_t - lp_r) * scale)
    return w


def test_quantized_mode_matches_pure_python(spark, corpora):
    """quantize_scale: log_w becomes an exact integer sum of rounded
    per-bucket ratios and the Gumbel top-k ranks integers — the
    oracle-exact mode x4_dsir_stratified registers (the DuckDB twin
    is the cross-engine half of this check)."""
    docs, target, raw = corpora
    tc, rc = feature_counts(target), feature_counts(raw)
    w = importance_weights(docs, tc, rc, quantize_scale=DSIR_QUANT)
    assert dict(w.dtypes)["log_w"] == "bigint"
    t_texts = [r["text"] for r in target.collect()]
    r_texts = [r["text"] for r in raw.collect()]
    tpy, rpy = _counts(t_texts, DSIR_BUCKETS), _counts(r_texts, DSIR_BUCKETS)
    got = {r["doc_id"]: r["log_w"] for r in w.collect()}
    want = {
        r["doc_id"]: _log_w_q(r["text"], tpy, rpy, DSIR_BUCKETS)
        for r in docs.collect()
    }
    assert got == want
    # quantized selection == pure-Python integer Gumbel top-k
    sel = dsir_sample(docs, tc, rc, k=40, quantize_scale=DSIR_QUANT)
    ids = {r["doc_id"] for r in sel.collect()}
    keys = {
        i: lw + _round_half_up(_gumbel(i) * DSIR_QUANT)
        for i, lw in want.items()
    }
    assert ids == set(sorted(keys, key=lambda i: (-keys[i], i))[:40])


def test_target_pred_equals_explicit_models(spark, corpora):
    """target_pred (target = subset of the raw corpus, one shared
    explode) is row-identical to passing explicit feature_counts
    frames for the same slice — in both double and quantized modes."""
    docs, target, raw = corpora
    pred = F.col("lang") == "en"
    en = docs.filter(pred)
    for q in (None, DSIR_QUANT):
        explicit = {
            r["doc_id"]: r["log_w"]
            for r in importance_weights(
                docs, feature_counts(en), feature_counts(docs),
                quantize_scale=q,
            ).collect()
        }
        pred_mode = {
            r["doc_id"]: r["log_w"]
            for r in importance_weights(
                docs, None, None, quantize_scale=q, target_pred=pred
            ).collect()
        }
        assert explicit == pred_mode
    with pytest.raises(ValueError):
        importance_weights(docs, feature_counts(en), target_pred=pred)
    with pytest.raises(ValueError):
        importance_weights(docs, None, None)


def test_plan_no_udf_no_cartesian_and_topk_not_full_sort(spark, corpora):
    docs, target, raw = corpora
    tc = feature_counts(target)
    rc = feature_counts(raw)
    sel = dsir_sample(docs, tc, rc, k=10)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    # limit+orderBy compiles to TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan
