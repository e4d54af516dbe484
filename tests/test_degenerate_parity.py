"""Degenerate-data oracle parity: the round driver REGENERATES
testdata between rounds (CLAUDE.md invariant 3) and has shipped
shape changes before — this suite runs the NULL/empty-sensitive
registry queries against a synthesized dataset containing exactly
the degenerate rows the current testdata lacks (NULL text, empty
text, whitespace-only text, NULL event_type/value, all-zero and
quantize-to-zero embeddings) and compares Spark vs the DuckDB
oracle with the driver's exact-value semantics.

Green today does NOT imply these paths agree: before the round-5
hardening, t1 crashed under ANSI on empty text, u3/x2/f6 diverged on
NULL events, and the cosine oracles emitted NaN for zero vectors."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from .helpers import skip_unless_slow

skip_unless_slow("degenerate-corpus parity sweep (~45 s; operator unit tests keep the edge coverage default)")
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

QUERIES = [
    "t1_token_stats",
    "t2_lang_id_nb",
    "t3_quality_fingerprint",
    "u3_sessionize_threshold",
    "x2_assemble_series",
    "f6_semistructured",
    "s1_knn_bruteforce",
    # r5: the DSIR leg tokenizes text and groups by lang — NULL text,
    # whitespace-only text (zero grams -> log_w = 0), and NULL lang
    # must fold identically on both engines
    "x4_dsir_stratified",
]


@pytest.fixture(scope="module")
def degen_dir(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("degen")
    out = str(base)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    extra_docs = spark.createDataFrame(
        [
            (900001, None, "en", "web", 0),
            (900002, "", "en", "web", 0),
            (900003, "   ", "de", "web", 3),
            (900004, "short", None, None, 5),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    docs.unionByName(
        extra_docs.select(*docs.columns)
    ).coalesce(1).write.parquet(f"{out}/documents.parquet")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(200)
    ts_type = dict(ev.dtypes)["ts"]
    some_ts = ev.select("ts").first()["ts"]
    extra_ev = spark.createDataFrame(
        [
            (900001, some_ts, 1, None, None, None),
            (900002, some_ts, 1, "click", None, '{"k": "notanint"}'),
            (900003, some_ts, 1, None, 5.0, '{"k": 3.5}'),
        ],
        f"event_id long, ts {ts_type}, user_id long, event_type string,"
        " value double, props string",
    )
    ev.unionByName(extra_ev.select(*ev.columns)).coalesce(1).write.parquet(
        f"{out}/events.parquet"
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(40)
    dim = emb.select(F.size("embedding").alias("d")).first()["d"]
    el_type = "float" if "float" in dict(emb.dtypes)["embedding"] else "double"
    extra_emb = spark.createDataFrame(
        [
            (900001, [0.0] * dim, 0),
            (900002, [1e-6] * dim, 0),  # quantizes to the zero vector
        ],
        f"vec_id long, embedding array<{el_type}>, label int",
    )
    emb.unionByName(extra_emb.select(*emb.columns)).coalesce(1).write.parquet(
        f"{out}/embeddings.parquet"
    )
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
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.to_datetime64().astype("datetime64[us]").item()
    return v


@pytest.mark.parametrize("name", QUERIES)
def test_degenerate_rows_keep_oracle_parity(spark, degen_dir, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    got = qs[name](spark, degen_dir).toPandas()
    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        # Spark wrote each table as a directory of part files
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{degen_dir}/{t}.parquet/*.parquet')"
        )
    want = con.execute(oracles[name]).fetchdf()
    g, w = _canon(got), _canon(want)
    assert list(g.columns) == list(w.columns), name
    assert len(g) == len(w), f"{name}: {len(g)} vs {len(w)} rows"
    for i in range(len(g)):
        for c in g.columns:
            gv, wv = _norm(g.iloc[i][c]), _norm(w.iloc[i][c])
            assert gv == wv, f"{name} row {i} col {c}: {gv!r} != {wv!r}"
