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
    classify_soft,
    export_ensemble,
    load_model,
    predict_row,
    predict_row_soft,
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


# --------------------------------------------- soft-vote (MLlib semantics)


def test_soft_vote_replay_matches_python_replica(spark, sf_dir):
    m = load_model()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        r["vec_id"]: (r["predicted_label"], r["score_top"])
        for r in classify_soft(emb, m)
        .select("vec_id", "predicted_label", "score_top")
        .collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    assert len(got) == len(rows) > 0
    for r in rows:
        assert got[r["vec_id"]] == predict_row_soft(m, r["embedding"])


def test_soft_vote_plan_is_map_only(spark, sf_dir):
    m = load_model()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = classify_soft(emb, m)._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "EvalPython", "InPandas", "Join", "Sort"):
        assert bad not in plan, f"{bad} in soft-vote replay plan"


def test_soft_vote_tie_break_is_first_max(spark):
    """Exact tie in summed quantized mass: class index 0 must win
    (Vector.argmax returns the FIRST maximal index)."""
    model = {
        "n_features": 1,
        "labels": [7, 5],
        "trees": [{"pred": 1, "q": [0, 1000000]}, {"pred": 0, "q": [1000000, 0]}],
    }
    df = spark.createDataFrame([(1, [0.0])], "vec_id long, embedding array<float>")
    row = classify_soft(df, model).select("predicted_label", "score_top").collect()[0]
    assert (row["predicted_label"], row["score_top"]) == (7, 1000000)
    assert predict_row_soft(model, [0.0]) == (7, 1000000)


def test_soft_vote_certifies_mllib_transform(spark):
    """THE certification (r7 VERDICT #2): refit the seeded M1-M3
    pipeline exactly as tools/train_ml1_model.py does, and prove

    1. the refit reproduces the checked-in artifact (tree structure,
       labels, AND quantized leaf distributions) — so the certificate
       transfers to models/ml1_rf.json;
    2. `classify_soft` over the exported artifact equals MLlib
       `model.transform`'s predictions ROW-FOR-ROW on the sf0.01
       embeddings — the quantized probability-averaged replay IS
       MLlib's soft-vote semantic on real data.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import StringIndexer
    from pyspark.ml.functions import array_to_vector

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    fdf = (
        emb.select(
            "vec_id",
            "label",
            array_to_vector(F.col("embedding").cast("array<double>")).alias(
                "features"
            ),
        )
        .coalesce(1)
        .sortWithinPartitions("vec_id")
    )
    pipe = Pipeline(
        stages=[
            StringIndexer(
                inputCol="label", outputCol="label_index", handleInvalid="keep"
            ),
            RandomForestClassifier(
                labelCol="label_index",
                featuresCol="features",
                numTrees=20,
                maxDepth=5,
                seed=42,
            ),
        ]
    )
    model = pipe.fit(fdf)
    si, rf = model.stages
    artifact = export_ensemble(si, rf)
    assert artifact == load_model(), (
        "seeded refit no longer reproduces models/ml1_rf.json — "
        "regenerate via tools/train_ml1_model.py and re-verify ml1"
    )
    labels = artifact["labels"]
    want = {
        r["vec_id"]: labels[int(r["prediction"])]
        for r in model.transform(fdf).select("vec_id", "prediction").collect()
    }
    got = {
        r["vec_id"]: r["predicted_label"]
        for r in classify_soft(
            spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"),
            artifact,
        )
        .select("vec_id", "predicted_label")
        .collect()
    }
    assert len(got) == len(want) > 0
    mismatches = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatches, f"soft-vote replay != MLlib transform: {mismatches}"


def test_randomized_models_triple_engine_parity(spark, oracle):
    """Seeded random ensembles (varying depth/feature/threshold,
    including negative zeros, denormal-ish and non-representable
    decimals) replayed over random float32 vectors: Spark CASE ==
    DuckDB twin == pure Python on every row. Guards the dialect
    seams (literal round-trip, float->double promotion, 1-based
    indexing, tie-breaks) against model shapes the checked-in
    artifact doesn't happen to exercise."""
    import random

    import duckdb

    rng = random.Random(20250815)
    weird = [0.0, -0.0, 0.1 + 0.2, 1e-300, -1e-300, 0.25, -1.5, 3e38]

    def gen_tree(depth, n_feat, n_cls):
        if depth == 0 or rng.random() < 0.3:
            return {"pred": rng.randrange(n_cls)}
        thr = rng.choice(weird) if rng.random() < 0.4 else rng.uniform(-1, 1)
        return {
            "feat": rng.randrange(n_feat),
            "thr": float(thr),
            "left": gen_tree(depth - 1, n_feat, n_cls),
            "right": gen_tree(depth - 1, n_feat, n_cls),
        }

    for trial in range(8):
        n_feat = rng.randint(1, 6)
        n_cls = rng.randint(2, 5)
        labels = rng.sample(range(100), n_cls)
        model = {
            "n_features": n_feat,
            "labels": labels,
            "trees": [gen_tree(3, n_feat, n_cls) for _ in range(rng.randint(1, 7))],
        }
        import numpy as np

        vrng = np.random.default_rng(trial)
        vecs = [
            [float(np.float32(x)) for x in vrng.normal(scale=0.5, size=n_feat)]
            for _ in range(25)
        ]
        # a few vectors that sit exactly ON thresholds
        for w in weird[:4]:
            vecs.append([float(np.float32(w))] * n_feat)
        rows = [(i, v) for i, v in enumerate(vecs)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r["vec_id"]: (r["predicted_label"], r["votes_top"])
            for r in classify(df, model).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])"
        )
        con.executemany(
            "INSERT INTO embeddings VALUES (?, ?)", rows
        )
        want = {
            r[0]: (r[1], r[2]) for r in con.execute(rf_sql_twin(model)).fetchall()
        }
        for vid, emb in rows:
            py = predict_row(model, emb)
            assert got[vid] == py, f"trial {trial} vec {vid}: spark {got[vid]} != py {py}"
            assert want[vid] == py, f"trial {trial} vec {vid}: duck {want[vid]} != py {py}"


def test_categorical_splits_triple_parity(spark, oracle):
    """Category-mapped replay (r9): a pipeline whose VectorIndexer
    declares features CATEGORICAL produces trees with
    CategoricalSplit nodes and an indexed feature space — export must
    capture both, and all four replay surfaces must agree with MLlib:
    Spark hard-vote, Spark soft-vote, the DuckDB twin, and the
    pure-Python replicas."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import StringIndexer, VectorIndexer
    from pyspark.ml.functions import array_to_vector

    from lcmap_firebird_spark.operators.rf_replay import (
        classify_soft,
        export_pipeline,
        predict_row_soft,
        rf_sql_twin,
    )

    # 3 features, each with <= 4 distinct values -> all categorical
    rows = [
        (i, [float(i % 3), float((i // 3) % 4), float(i % 2) * 10.0], i % 2)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    fdf = df.select(
        "vec_id", "label", array_to_vector("embedding").alias("raw")
    )
    pipe = Pipeline(
        stages=[
            StringIndexer(inputCol="label", outputCol="li", handleInvalid="keep"),
            VectorIndexer(inputCol="raw", outputCol="features", maxCategories=8),
            RandomForestClassifier(
                labelCol="li", featuresCol="features", numTrees=7, maxDepth=4,
                seed=7,
            ),
        ]
    )
    model = pipe.fit(fdf)
    art = export_pipeline(model)
    assert art.get("category_maps"), "VectorIndexer produced no category maps"

    def has_cats(node):
        if "pred" in node:
            return False
        return "cats" in node or has_cats(node["left"]) or has_cats(node["right"])

    assert any(has_cats(t) for t in art["trees"]), "no CategoricalSplit exported"

    si_labels = [int(x) for x in model.stages[0].labels]
    want = {
        r["vec_id"]: si_labels[int(r["prediction"])]
        for r in model.transform(fdf).collect()
    }
    # Spark soft-vote == transform
    soft = {
        r["vec_id"]: r["predicted_label"]
        for r in classify_soft(df, art).collect()
    }
    assert soft == want
    # Spark hard-vote == pure-Python hard replica (rule differs from
    # transform by design on tie-adjacent rows; here we pin engine
    # parity, not semantic equality)
    hard = {
        r["vec_id"]: (r["predicted_label"], r["votes_top"])
        for r in classify(df, art).collect()
    }
    for vid, emb, _ in rows:
        assert hard[vid] == predict_row(art, emb), vid
        assert predict_row_soft(art, emb)[0] == soft[vid], vid
    # DuckDB twin over the same rows
    oracle.execute("CREATE OR REPLACE TABLE _cat_rows (vec_id BIGINT, embedding DOUBLE[])")
    oracle.executemany(
        "INSERT INTO _cat_rows VALUES (?, ?)", [(i, e) for i, e, _ in rows]
    )
    duck = {
        r[0]: (r[1], r[2])
        for r in oracle.execute(rf_sql_twin(art, table="_cat_rows")).fetchall()
    }
    assert duck == hard
    oracle.execute("DROP TABLE _cat_rows")
