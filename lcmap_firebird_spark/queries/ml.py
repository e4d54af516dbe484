"""ML-pipeline query registry.

The densify/dedensify round-trip (U1/U2) is oracle-checked inside
p5_array_ops (queries/extended.py) — folded there in the round-2
registry consolidation. The RF train/classify pipeline (M1-M5) is
seeded-deterministic but has no SQL equivalent — declared rows-only;
its behavioral guarantees are covered by tests/test_plans.py goldens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..operators.vectors import densify


def ml1_rf_classify(spark: SparkSession, sf: str) -> DataFrame:
    """Seeded RF over embedding features (M1-M5 composition on the
    driver tables; numTrees scaled down from the reference's 500 for
    the per-round harness)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import StringIndexer

    emb = read_table(spark, "embeddings", sf)
    fdf = densify(
        emb.select(
            "vec_id",
            F.col("label"),
            *[F.element_at("embedding", i + 1).alias(f"e{i}") for i in range(8)],
        ),
        [f"e{i}" for i in range(8)],
        "features",
        compat=False,
    )
    pipe = Pipeline(
        stages=[
            StringIndexer(inputCol="label", outputCol="label_index", handleInvalid="keep"),
            RandomForestClassifier(
                labelCol="label_index", featuresCol="features", numTrees=20, seed=42
            ),
        ]
    )
    model = pipe.fit(fdf)
    return model.transform(fdf).select(
        "vec_id", F.col("prediction").cast("int").alias("predicted_index")
    )


QUERIES = {
    "ml1_rf_classify": ml1_rf_classify,
}

# ml1_rf_classify: MLlib pipeline — no SQL oracle, rows-only.
ORACLES: dict[str, str] = {}
