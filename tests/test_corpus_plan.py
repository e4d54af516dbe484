"""End-to-end corpus-preparation plan: gates hold, both dedup rungs
hold (no surviving exact or near duplicates), the split is disjoint/
exhaustive/deterministic, and the partitioned write round-trips."""

from __future__ import annotations

import pytest

from .helpers import slow_enabled
from pyspark.sql import functions as F

from lcmap_firebird_spark.catalog import read_table
from lcmap_firebird_spark.operators import text as T
from lcmap_firebird_spark.operators.dedup import minhash_dedup
from lcmap_firebird_spark.plans import corpus as C

THRESH = 0.3
LANGS = ("en", "fr")


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, "documents", sf_dir).cache()


@pytest.fixture(scope="module")
def prepared(docs):
    return C.prepare_corpus(
        docs, languages=LANGS, jaccard_threshold=THRESH
    ).cache()


def test_gates_hold(docs, prepared):
    assert 0 < prepared.count() < docs.count()
    # every survivor satisfies the gates (re-derive the signals)
    bad = prepared.filter(
        (T.token_count("text") < 5)
        | ~T.language_id("text").isin(*LANGS)
        | (T.repeated_ngram_fraction("text", 2) > 0.5)
    )
    assert bad.count() == 0


def test_no_surviving_duplicates(prepared):
    # exact rung: fingerprints unique among survivors
    n = prepared.count()
    assert prepared.select(T.fingerprint("text").alias("fp")).distinct().count() == n
    # near rung: re-running near-dup detection on the output finds nothing
    assert minhash_dedup(prepared, threshold=THRESH, exact_first=False).count() == 0


def test_split_disjoint_exhaustive_deterministic(docs, prepared):
    counts = {r["split"]: r["n"] for r in
              prepared.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == prepared.count()
    assert counts.get("train", 0) > counts.get("val", 0)
    # deterministic: a fresh run assigns every doc the same split
    again = C.prepare_corpus(docs, languages=LANGS, jaccard_threshold=THRESH)
    diff = (
        prepared.select("doc_id", "split")
        .join(again.select("doc_id", F.col("split").alias("s2")), "doc_id")
        .filter(F.col("split") != F.col("s2"))
    )
    assert diff.count() == 0


def test_partitioned_write_roundtrip(spark, prepared, tmp_path):
    path = str(tmp_path / "corpus")
    C.write_corpus(prepared, path)
    back = spark.read.parquet(path)
    assert back.count() == prepared.count()
    # split is a partition column -> scanning one split prunes to its dir
    assert (
        back.filter(F.col("split") == "train").count()
        == prepared.filter(F.col("split") == "train").count()
    )


def test_decontamination_and_redaction_stages(spark, docs, prepared):
    """benchmark= drops exactly the survivor docs sharing 8-grams
    with a benchmark item; redact=True scrubs PII in the output text
    without changing which documents survive."""
    kept_ids = [r.doc_id for r in prepared.select("doc_id").limit(3).collect()]
    bench = docs.filter(F.col("doc_id").isin(kept_ids)).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    out = C.prepare_corpus(
        docs, languages=LANGS, jaccard_threshold=THRESH, benchmark=bench
    )
    out_ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert not (set(kept_ids) & out_ids)
    assert out_ids < {r.doc_id for r in prepared.select("doc_id").collect()}

    red = C.prepare_corpus(
        docs, languages=LANGS, jaccard_threshold=THRESH, redact=True
    )
    assert {r.doc_id for r in red.select("doc_id").collect()} == {
        r.doc_id for r in prepared.select("doc_id").collect()
    }


def test_substring_stage_cuts_cross_doc_spans(docs):
    """With substring_k set, no >=k-token run survives verbatim in
    two different output documents (the spans were cut)."""
    from lcmap_firebird_spark.operators.substring import duplicate_spans

    out = C.prepare_corpus(
        docs, languages=LANGS, jaccard_threshold=THRESH, substring_k=8
    ).cache()
    # re-running span detection on the cleaned output finds nothing
    assert duplicate_spans(out, k=8).count() == 0
    out.unpersist()


def test_mixture_stage_budgets_and_epochs(docs, prepared):
    toks = {
        r["source"]: r["t"]
        for r in prepared.groupBy("source")
        .agg(F.sum(T.token_count("text")).alias("t"))
        .collect()
    }
    dom = max(toks, key=toks.get)
    budget = int(toks[dom] * 2.5)  # force upsampling: 2 epochs + rest
    out = C.prepare_corpus(
        docs,
        languages=LANGS,
        jaccard_threshold=THRESH,
        mixture={dom: 1.0},
        mixture_tokens=budget,
    ).cache()
    assert "epoch" in out.columns
    got = out.agg(F.sum(T.token_count("text"))).first()[0]
    assert got <= budget
    assert got >= 2 * toks[dom]  # at least the two full epochs
    # split assignment is constant per doc across epochs
    per_doc = out.groupBy("doc_id").agg(
        F.countDistinct("split").alias("ns")
    )
    assert per_doc.filter(F.col("ns") > 1).count() == 0
    out.unpersist()


def test_semdedup_stage_drops_semantic_twins(spark, docs, prepared):
    # give two lexically-distinct survivors near-identical embeddings
    # (scaled copies: cosine exactly 1) and every other survivor an
    # orthogonal-ish distinct direction
    base_ids = sorted(
        r.doc_id for r in prepared.select("doc_id").collect()
    )
    # the twins must not be default IVF seeds (ids < num_cells seed
    # their own cells and would never meet) — use the two HIGHEST ids
    # with identical vectors, so they tie to the same cell everywhere
    a, b = base_ids[-1], base_ids[-2]
    rows = []
    for i, did in enumerate(base_ids):
        if did in (a, b):
            v = [1.0, 0.0, 0.0, 2.0]
        else:
            v = [0.0, 1.0, float(i % 7), 0.0]
        rows.append((did, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = C.prepare_corpus(
        docs,
        languages=LANGS,
        jaccard_threshold=THRESH,
        embeddings=emb,
        semdedup_eps=0.01,
    )
    out_ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert len(out_ids & {a, b}) == 1  # one of the semantic twins left
    assert out_ids <= set(base_ids)


@pytest.mark.skipif(
    not slow_enabled(),
    reason="stage sweep — operator-level coverage stays default "
    "(test_dsir/test_perplexity/test_classifier) plus the composed "
    "end-to-end pipeline; SPARK_GRAFT_SLOW=1",
)
def test_dsir_stage_selects_k_toward_target(spark, docs, prepared):
    n_before = prepared.count()
    k = max(5, n_before // 3)
    target = docs.filter("lang = 'en'").limit(40)
    out = C.prepare_corpus(
        docs,
        languages=LANGS,
        jaccard_threshold=THRESH,
        dsir_target=target,
        dsir_k=k,
    )
    assert out.count() == k
    # deterministic selection
    again = C.prepare_corpus(
        docs,
        languages=LANGS,
        jaccard_threshold=THRESH,
        dsir_target=target,
        dsir_k=k,
    )
    assert {r.doc_id for r in out.collect()} == {
        r.doc_id for r in again.collect()
    }
    with pytest.raises(ValueError, match="dsir_target and dsir_k"):
        C.prepare_corpus(docs, dsir_k=5)


def test_manifest_counts_and_checksum(spark, prepared, tmp_path):
    import json
    import os

    path = str(tmp_path / "corpus_m")
    m = C.write_corpus(prepared, path)
    assert os.path.exists(os.path.join(path, "_MANIFEST.json"))
    disk = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert disk["n_docs"] == m["n_docs"] == prepared.count()
    want_tokens = prepared.agg(F.sum(T.token_count("text"))).first()[0]
    assert m["n_tokens"] == want_tokens
    # checksum is layout-independent: recompute after a repartition
    m2 = C.corpus_manifest(prepared.repartition(7))
    assert m2["checksum"] == m["checksum"]
    assert m2["n_docs"] == m["n_docs"]
    # and content-sensitive: dropping one doc changes it
    one = prepared.limit(1).select("doc_id")
    m3 = C.corpus_manifest(prepared.join(one, "doc_id", "left_anti"))
    assert m3["checksum"] != m["checksum"]


@pytest.mark.skipif(
    not slow_enabled(),
    reason="stage sweep — operator-level coverage stays default "
    "(test_dsir/test_perplexity/test_classifier) plus the composed "
    "end-to-end pipeline; SPARK_GRAFT_SLOW=1",
)
def test_quality_model_stage_filters(spark, docs, prepared):
    from lcmap_firebird_spark.operators.classifier import (
        score_quality,
        train_log_odds,
    )

    # self-train a throwaway model: long docs positive, short negative
    labeled = docs.withColumn(
        "label", (T.token_count("text") >= 40).cast("int")
    )
    weights, bias = train_log_odds(labeled, n_buckets=512)
    out = C.prepare_corpus(
        docs,
        languages=LANGS,
        jaccard_threshold=THRESH,
        quality_model=(weights, bias, 0.5),
    )
    # the stage is a strict filter of the unmodeled pipeline
    base_ids = {r.doc_id for r in prepared.select("doc_id").collect()}
    got_ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert got_ids
    # every kept doc actually scores >= threshold
    kept_docs = docs.join(out.select("doc_id"), "doc_id", "left_semi")
    low = score_quality(kept_docs, weights, bias, n_buckets=512).filter(
        F.col("quality_score") < 0.5
    )
    assert low.count() == 0


@pytest.mark.skipif(
    not slow_enabled(),
    reason="stage sweep — operator-level coverage stays default "
    "(test_dsir/test_perplexity/test_classifier) plus the composed "
    "end-to-end pipeline; SPARK_GRAFT_SLOW=1",
)
def test_perplexity_stage_filters(spark, docs):
    from lcmap_firebird_spark.operators.perplexity import (
        score_perplexity,
        train_bigram_lm,
    )

    # self-referential model: the corpus itself is the reference, so
    # typical docs score low and the gate keeps a strict subset
    uni, bi, v = train_bigram_lm(docs)
    scored = score_perplexity(docs, uni, bi, v)
    cut = scored.agg(F.expr("percentile(perplexity, 0.6)")).first()[0]
    out = C.prepare_corpus(
        docs,
        languages=LANGS,
        jaccard_threshold=THRESH,
        perplexity_model=(uni, bi, v, float(cut)),
    )
    kept = docs.join(out.select("doc_id"), "doc_id", "left_semi")
    high = score_perplexity(kept, uni, bi, v).filter(
        F.col("perplexity") > cut
    )
    assert out.count() > 0
    assert high.count() == 0
