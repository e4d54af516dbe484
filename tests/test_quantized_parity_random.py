"""Randomized oracle-parity tripwire for the round-5 quantized
queries (x4's DSIR selection, t3's LM NLL): synthesize random corpora
— random small-vocab tokens, unicode words, skewed repetition, mixed
langs, degenerate rows — and require EXACT Spark↔DuckDB agreement.

The quantized recipes' only cross-engine float risk is a 1-ulp ln()
difference landing exactly on a round() boundary; these seeds probe
thousands of quantizations per run, deterministically, so a boundary
flip would surface here as a stable failure instead of a driver
surprise."""

from __future__ import annotations

import math
import random

from .helpers import skip_unless_slow

skip_unless_slow("randomized quantized-parity sweep (~30 s; the pinned-corpus parity stays default)")

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

QUERIES = [
    "x4_dsir_stratified",
    "t3_quality_fingerprint",
    # r6: t1 carries the quantized BM25 score — its pinned terms
    # (spark/query/vector/merge) are seeded into VOCAB below so the
    # tripwire exercises real tf/df/idf quantizations, not all-NULLs
    "t1_token_stats",
]

VOCAB = (
    "the a of and to is in cat dog mat rug sat on über straße "
    "naïve café 数据 引擎 zzz qqq x1 y2 z3 lorem ipsum dolor "
    "spark query vector merge"
).split()


def _mk_corpus(seed: int):
    rng = random.Random(seed)
    rows = []
    for i in range(150):
        lang = rng.choice(["en", "en", "de", "fr", "zh", None])
        n = rng.randint(0, 60)
        if rng.random() < 0.1:
            # skew: heavy repetition of one phrase
            words = ["dup phrase body"] * rng.randint(3, 10)
        else:
            words = [rng.choice(VOCAB) for _ in range(n)]
        text = " ".join(words)
        if rng.random() < 0.05:
            text = None
        elif rng.random() < 0.05:
            text = "   "
        rows.append(
            (i, text, lang, rng.choice(["web", "book", None]),
             len(text) if text else 0)
        )
    return rows


@pytest.fixture(scope="module", params=[7, 1031])
def rand_dir(spark, request, tmp_path_factory):
    out = str(tmp_path_factory.mktemp(f"rand{request.param}"))
    spark.createDataFrame(
        _mk_corpus(request.param),
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def _norm(v):
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    return v


@pytest.mark.parametrize("name", QUERIES)
def test_random_corpus_exact_parity(spark, rand_dir, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    got = qs[name](spark, rand_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{rand_dir}/documents.parquet/*.parquet')"
    )
    want = con.execute(oracles[name]).fetchdf()
    g, w = _canon(got), _canon(want)
    assert list(g.columns) == list(w.columns), name
    assert len(g) == len(w), f"{name}: {len(g)} vs {len(w)} rows"
    for i in range(len(g)):
        for c in g.columns:
            gv, wv = _norm(g.iloc[i][c]), _norm(w.iloc[i][c])
            assert gv == wv, f"{name} row {i} col {c}: {gv!r} != {wv!r}"
