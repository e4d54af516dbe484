"""CLI classification subcommand, end-to-end: train from parquet aux
+ segments, persist model + predictions, and the empty-window
failure path (reference: test_cli.py exit-code smoke)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.cli import main
from lcmap_firebird_spark.plans import changedetection as CD


@pytest.fixture(scope="module")
def paths(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_cls")
    rng = np.random.default_rng(42)
    obs = spark.createDataFrame(
        [
            (0, 0, px, py, 100 + i * 10, 100.0 + float(rng.normal(0, 1)))
            for px, py in [(1, 1), (2, 2), (3, 3)]
            for i in range(30)
        ],
        ["cx", "cy", "px", "py", "t", "value"],
    )
    seg_path = str(tmp / "segments")
    CD.detect(obs).write.parquet(seg_path)
    aux = spark.createDataFrame(
        [
            (0, 0, 1, 1, [100], [250.0], [4], [1], [0.5], [3.0], [0]),
            (0, 0, 2, 2, [100], [260.0], [5], [2], [0.4], [2.0], [1]),
            (0, 0, 3, 3, [100], [270.0], [3], [3], [0.3], [1.0], [0]),
        ],
        ["cx", "cy", "px", "py", "dates", "dem", "trends", "aspect",
         "posidex", "slope", "mpw"],
    )
    aux_path = str(tmp / "aux")
    aux.write.parquet(aux_path)
    return {
        "aux": aux_path,
        "segments": seg_path,
        "model": str(tmp / "model"),
        "preds": str(tmp / "preds"),
    }


def test_cli_classification_trains_and_predicts(spark, paths):
    rc = main(
        [
            "classification",
            "--aux", paths["aux"],
            "--segments", paths["segments"],
            "--msday", "0", "--meday", "100000",
            "--trees", "5",
            "--model-out", paths["model"],
            "--predictions-out", paths["preds"],
        ]
    )
    assert rc == 0
    preds = spark.read.parquet(paths["preds"])
    assert preds.count() >= 3
    assert "rfrawp" in preds.columns
    # persisted model reloads and predicts identically (seeded RF)
    from pyspark.ml import PipelineModel

    model = PipelineModel.load(paths["model"])
    assert model.stages[-1].getNumTrees == 5


def test_cli_classification_empty_window_fails_cleanly(paths):
    rc = main(
        [
            "classification",
            "--aux", paths["aux"],
            "--segments", paths["segments"],
            "--msday", "999000", "--meday", "999001",
            "--trees", "5",
        ]
    )
    assert rc == 1  # 'No features found to train model' guard
