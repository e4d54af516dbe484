"""One-off trainer for the checked-in ml1 RF model artifact.

Fits the seeded M1-M3 pipeline (StringIndexer -> seeded
RandomForestClassifier, the reference's train leg,
/root/reference/ccdc/randomforest.py:36-63) on the sf0.01
``embeddings`` table and exports the fitted ensemble to
``lcmap_firebird_spark/models/ml1_rf.json``:

    {"n_features": 64, "labels": [...], "trees": [tree, ...]}
    tree := {"feat": i, "thr": t, "left": tree, "right": tree}
          | {"pred": class_index}

The registry's ml1_rf_classify replays this artifact (the reference's
classify leg loads a previously-trained model the same way —
randomforest.py:90-103); training at query time is kept out of the
registry so the oracle twin can be generated without a fit. Re-running
this script regenerates the artifact; the replay parity tests and the
oracle twin are generated FROM the artifact, so regeneration is safe.

Usage: python tools/train_ml1_model.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.ml import Pipeline
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.feature import StringIndexer
from pyspark.ml.functions import array_to_vector
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lcmap_firebird_spark",
    "models",
    "ml1_rf.json",
)


from lcmap_firebird_spark.operators.rf_replay import export_ensemble


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ml1-train")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # coalesce(1) + sortWithinPartitions pins the bootstrap-sample row
    # order so the seeded fit is reproducible across session configs.
    fdf = (
        emb.select(
            "vec_id",
            "label",
            array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        )
        .coalesce(1)
        .sortWithinPartitions("vec_id")
    )
    pipe = Pipeline(
        stages=[
            StringIndexer(inputCol="label", outputCol="label_index", handleInvalid="keep"),
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
    # shared exporter (operators/rf_replay.export_ensemble): tree
    # structure for BOTH replay rules + quantized leaf distributions
    # for the soft-vote (MLlib-semantics) replay
    artifact = export_ensemble(si, rf)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(artifact, f)
    n_nodes = json.dumps(artifact).count('"feat"')
    print(f"wrote {OUT}: {len(artifact['trees'])} trees, {n_nodes} internal nodes")


if __name__ == "__main__":
    main()
