"""SemDeDup (operators/semdedup.py) vs an independent pure-Python
implementation of the paper's greedy rule, plus structural and
monotonicity properties on the real embeddings table."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.operators.semdedup import semdedup, semdedup_gate

SF = "/root/testdata/sf0.001"


def _semdedup_py(vecs: dict[int, list[float]], num_cells: int, eps: float):
    """The same arithmetic as the Spark plan: quantized ints, exact
    integer L2/dot, double sqrt norms; seeds = ids < num_cells."""
    q = {i: [round(float(x) * 10_000) for x in v] for i, v in vecs.items()}
    seeds = {i: q[i] for i in q if i < num_cells}

    def l2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    assign, dist = {}, {}
    for i, v in q.items():
        sid, d = min(
            ((s, l2(v, sv)) for s, sv in seeds.items()),
            key=lambda t: (t[1], t[0]),
        )
        assign[i], dist[i] = sid, d

    cells = defaultdict(list)
    for i in assign:
        cells[assign[i]].append(i)
    nrm = {i: math.sqrt(sum(x * x for x in q[i])) for i in q}
    keep = {}
    for ids in cells.values():
        order = sorted(ids, key=lambda i: (-dist[i], i))
        for idx, i in enumerate(order):
            dropped = False
            for j in order[:idx]:
                dot = sum(x * y for x, y in zip(q[j], q[i]))
                if dot / (nrm[j] * nrm[i]) >= 1.0 - eps:
                    dropped = True
                    break
            keep[i] = not dropped
    return keep


def test_matches_pure_python_on_synthetic_clusters(spark):
    # three directions; each with near-identical copies (semantic
    # dups) and one genuinely distinct member
    # ids 0..2 are the three unit directions (they double as the
    # deterministic cell seeds); ids 3k+d are scaled copies of
    # direction d (cosine exactly 1 — semantic dups); ids 12..14 are
    # mixed vectors near each direction but below the 1-eps line
    base = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
    ]
    rows, vecs = [], {}
    for k in range(4):  # k=0 is the base itself
        for d, b in enumerate(base):
            vid = 3 * k + d
            v = [x * (1.0 + 0.1 * k) for x in b]
            rows.append((vid, v))
            vecs[vid] = v
    for d, b in enumerate(base):
        vid = 12 + d
        mixed = [x + 0.35 for x in b]
        rows.append((vid, mixed))
        vecs[vid] = mixed
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["is_keeper"]
        for r in semdedup(df, eps=0.05, num_cells=3).collect()
    }
    want = _semdedup_py(vecs, num_cells=3, eps=0.05)
    assert got == want
    # exactly one keeper among each scaled-copy family; the mixed
    # member survives (cosine to the axis is well below 1 - eps)
    keepers = {i for i, k in got.items() if k}
    for d in range(3):
        fam = {3 * k + d for k in range(4)}
        assert len(fam & keepers) == 1
        assert 12 + d in keepers


def test_matches_pure_python_on_real_embeddings(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vecs = {
        r["vec_id"]: list(r["embedding"]) for r in emb.collect()
    }
    for eps in (0.02, 0.2):
        got = {
            r["vec_id"]: r["is_keeper"]
            for r in semdedup(emb, eps=eps, num_cells=8).collect()
        }
        want = _semdedup_py(vecs, num_cells=8, eps=eps)
        assert got == want, f"eps={eps}"


def test_rank1_always_kept_and_eps_monotone(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = semdedup(emb, eps=0.1, num_cells=8).cache()
    assert out.filter("rk = 1 AND NOT is_keeper").count() == 0
    k_tight = {
        r["vec_id"]
        for r in semdedup(emb, eps=0.02, num_cells=8)
        .filter("is_keeper")
        .collect()
    }
    k_loose = {
        r["vec_id"]
        for r in out.filter("is_keeper").collect()
    }
    # larger eps ⇒ more pairs qualify ⇒ keepers shrink monotonically
    assert k_loose <= k_tight
    out.unpersist()


def test_gate_passes_docs_without_embeddings(spark):
    docs = spark.createDataFrame(
        [(0, "a"), (1, "b"), (99, "no-embedding")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),  # the id-0 seed
            (1, [2.0, 0.0]),  # scaled copy of 0: one of them drops
        ],
        "vec_id long, embedding array<float>",
    )
    kept = {
        r.doc_id
        for r in semdedup_gate(docs, emb, eps=0.05, num_cells=1).collect()
    }
    assert 99 in kept  # no geometry ⇒ passes
    assert len(kept & {0, 1}) == 1  # one of the dup pair survives


def test_plan_shape_no_cartesian_no_python(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = (
        semdedup(emb, eps=0.05, num_cells=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
