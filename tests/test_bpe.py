"""BPE training/encoding (operators/bpe.py) vs an independent naive
reference implementation (recount-everything-per-round, different
data structures than the incremental trainer) plus the Sennrich
paper's canonical example."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.operators import bpe as B

SF = "/root/testdata/sf0.001"


def _train_naive(texts, num_merges, min_pair_count=2):
    """Reference trainer: full pair recount every round (O(V) per
    round, no inverted index) — deliberately different machinery."""
    wc = Counter(w for t in texts for w in t.split())
    vocab = {tuple(w) + (B.END,): c for w, c in wc.items()}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc:
            break
        best_n = max(pc.values())
        if best_n < min_pair_count:
            break
        best = min(p for p, n in pc.items() if n == best_n)
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges, vocab


def test_sennrich_paper_example(spark):
    # the worked example from arXiv:1508.07909 §3.2: vocabulary
    # {low:5, lower:2, newest:6, widest:3}; first merges pick up
    # ('e','s') then ('es','t') from 'newest'/'widest'
    texts = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = B.train_bpe(df, num_merges=4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    # after est</w> forms, 'newest'/'widest' end in one symbol
    assert merges[2] == ("est", B.END)
    assert B.encode_word("newest", merges)[-1] == "est" + B.END
    assert B.encode_word("lowest", merges)[-1] == "est" + B.END  # OOV


def test_trainer_matches_naive_reference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    texts = [r["text"] for r in docs.collect()]
    got = B.train_bpe(docs, num_merges=60, max_words=100_000)
    want, final_vocab = _train_naive(texts, num_merges=60)
    assert got == want
    # encode∘train consistency: re-encoding each training word with
    # the learned merges reproduces training's final segmentation
    for syms, _ in list(final_vocab.items())[:200]:
        word = "".join(syms).removesuffix(B.END)
        assert tuple(B.encode_word(word, got)) == syms


def test_max_words_truncation_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    m1 = B.train_bpe(docs, num_merges=30, max_words=500)
    m2 = B.train_bpe(docs, num_merges=30, max_words=500)
    assert m1 == m2  # TakeOrdered + lexicographic ties: reproducible


def test_encode_docs_distributed_matches_driver(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    merges = B.train_bpe(docs, num_merges=40, max_words=100_000)
    out = {
        r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe"])
        for r in B.encode_docs(docs, merges).collect()
    }
    for r in docs.collect():
        want = []
        for w in r["text"].split():
            want.extend(B.encode_word(w, merges))
        toks, n = out[r["doc_id"]]
        assert toks == want
        assert n == len(want)


from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=8),
    min_size=1,
    max_size=40,
)


@settings(max_examples=50, deadline=None)
@given(corpus=_WORDS, probe=st.text(alphabet="abcdef", min_size=1, max_size=12))
def test_property_encode_lossless_for_any_merges(corpus, probe):
    # train on a random corpus (naive reference trainer — no Spark in
    # the hypothesis loop); ANY word, in-vocab or OOV (incl. the
    # unseen letter 'f'), must reassemble exactly
    merges, _ = _train_naive([" ".join(corpus)], num_merges=30)
    toks = B.encode_word(probe, merges)
    assert "".join(toks) == probe + B.END
    # merges are distinct ordered pairs
    assert len(set(merges)) == len(merges)


@settings(max_examples=50, deadline=None)
@given(corpus=_WORDS)
def test_property_encode_train_consistency_random_corpora(corpus):
    # the algebraic BPE property: greedily re-encoding each training
    # word with the learned merges reproduces the trainer's final
    # segmentation of that word, for ANY corpus
    texts = [" ".join(corpus)]
    merges, vocab = _train_naive(texts, num_merges=20)
    for syms, _ in vocab.items():
        word = "".join(syms).removesuffix(B.END)
        assert tuple(B.encode_word(word, merges)) == syms


def test_encoding_roundtrip_lossless(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(30)
    merges = B.train_bpe(docs, num_merges=50)
    enc = B.encode_docs(docs, merges)
    back = enc.select(
        "doc_id",
        F.array_join("bpe_tokens", "").alias("j"),
    )
    got = {r["doc_id"]: r["j"] for r in back.collect()}
    for r in docs.collect():
        want = "".join(w + B.END for w in r["text"].split())
        assert got[r["doc_id"]] == want
