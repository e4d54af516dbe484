"""ML-pipeline query registry.

The densify/dedensify round-trip (U1/U2) is oracle-checked inside
p5_array_ops (queries/extended.py) — folded there in the round-2
registry consolidation.

ml1_rf_classify is the classify leg (M4-M5): it replays the
checked-in seeded-MLlib ensemble (lcmap_firebird_spark/models/
ml1_rf.json, produced by tools/train_ml1_model.py) as pure Catalyst
CASE expressions with integer hard-voting — see operators/rf_replay
for the design and the reference pointer
(/root/reference/ccdc/randomforest.py:90-103 loads a previously-
trained model the same way). The DuckDB oracle is generated from the
same artifact, so the slot certifies distributed tree traversal +
vote exactly (rounds 4-6 carried it rows-only; the train leg M1-M3
stays in plans/classification.py under test_plans goldens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import read_table
from ..operators.rf_replay import classify, load_model, rf_sql_twin


def ml1_rf_classify(spark: SparkSession, sf: str) -> DataFrame:
    """Zero-UDF RF inference over the embeddings table: map-only scan,
    ensemble baked into the plan as ~500 literal CASE nodes."""
    emb = read_table(spark, "embeddings", sf)
    return classify(emb, load_model()).select("vec_id", "predicted_label", "votes_top")


QUERIES = {
    "ml1_rf_classify": ml1_rf_classify,
}

ORACLES: dict[str, str] = {
    "ml1_rf_classify": rf_sql_twin(load_model()),
}
