"""RF ensemble-replay certification (ml1's new oracle path).

The checked-in artifact (models/ml1_rf.json, from a seeded MLlib fit
— tools/train_ml1_model.py) is replayed three ways and must agree
row-for-row: Catalyst CASE expressions (the registry query), the
generated DuckDB twin (the driver oracle), and a pure-Python
traversal. Mirrors the reference's classify leg, which loads a
previously-trained model (/root/reference/ccdc/randomforest.py:90-103).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lcmap_firebird_spark.operators.rf_replay import (
    classify,
    load_model,
    predict_row,
    rf_sql_twin,
)


def test_artifact_sane():
    m = load_model()
    assert m["n_features"] == 64
    assert len(m["trees"]) == 20
    assert sorted(m["labels"]) == list(range(10))

    def leaves(n):
        if "pred" in n:
            yield n["pred"]
        else:
            assert 0 <= n["feat"] < m["n_features"]
            yield from leaves(n["left"])
            yield from leaves(n["right"])

    for t in m["trees"]:
        for p in leaves(t):
            # every leaf's class index maps into the labels array
            assert 0 <= p < len(m["labels"])


def test_spark_replay_matches_python_replica(spark, sf_dir):
    m = load_model()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        r["vec_id"]: (r["predicted_label"], r["votes_top"])
        for r in classify(emb, m).select("vec_id", "predicted_label", "votes_top").collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    assert len(got) == len(rows) > 0
    for r in rows:
        assert got[r["vec_id"]] == predict_row(m, r["embedding"])


def test_duckdb_twin_matches_python_replica(oracle):
    import duckdb  # noqa: F401 — twin runs on the session-scoped con

    m = load_model()
    want = {
        row[0]: (row[1], row[2])
        for row in oracle.execute(rf_sql_twin(m)).fetchall()
    }
    rows = oracle.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    assert len(want) == len(rows) > 0
    for vid, emb in rows:
        assert want[vid] == predict_row(m, emb)


def test_tie_break_is_smallest_class_index(spark):
    """Force a tie: a 2-tree model voting classes 1 and 0 — the
    winner must be class index 0 (first max), i.e. labels[0]."""
    model = {
        "n_features": 1,
        "labels": [7, 5],
        "trees": [{"pred": 1}, {"pred": 0}],
    }
    df = spark.createDataFrame([(1, [0.0])], "vec_id long, embedding array<float>")
    row = classify(df, model).select("predicted_label", "votes_top").collect()[0]
    assert (row["predicted_label"], row["votes_top"]) == (7, 1)
    assert predict_row(model, [0.0]) == (7, 1)


def test_replay_plan_is_map_only_codegen(spark, sf_dir):
    """Scale contract: inference is a shuffle-free scan+project with
    zero Python nodes — the ensemble is baked into the plan."""
    m = load_model()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = classify(emb, m)._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "EvalPython", "InPandas", "Join", "Sort"):
        assert bad not in plan, f"{bad} in ml1 replay plan"


def test_split_rule_matches_mllib_boundary(spark):
    """ContinuousSplit sends feature == threshold LEFT; certify the
    boundary on a 1-node tree on both engines and the replica."""
    thr = 0.25  # exactly representable in float32 AND double
    model = {
        "n_features": 1,
        "labels": [4, 9],
        "trees": [{"feat": 0, "thr": thr, "left": {"pred": 0}, "right": {"pred": 1}}],
    }
    df = spark.createDataFrame(
        [(1, [0.25]), (2, [0.2500001])], "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: r["predicted_label"]
        for r in classify(df, model).select("vec_id", "predicted_label").collect()
    }
    assert got == {1: 4, 2: 9}
    assert predict_row(model, [0.25])[0] == 4
    assert predict_row(model, [0.2500001])[0] == 9
