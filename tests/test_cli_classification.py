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


def test_cli_classification_replay_method(spark, paths, tmp_path):
    """--method replay serves predictions through the zero-UDF
    Catalyst replay and --export-model-out writes the JSON artifact a
    serving job can load without MLlib (r9)."""
    import json

    preds2 = str(tmp_path / "preds_replay")
    art_path = str(tmp_path / "model.json")
    rc = main(
        [
            "classification",
            "--aux", paths["aux"],
            "--segments", paths["segments"],
            "--msday", "0", "--meday", "100000",
            "--trees", "5",
            "--method", "replay",
            "--export-model-out", art_path,
            "--predictions-out", preds2,
        ]
    )
    assert rc == 0
    with open(art_path) as f:
        art = json.load(f)
    assert art["trees"] and art["labels"] and art["n_raw"] >= len(art["labels"])
    out = spark.read.parquet(preds2)
    rows = out.collect()
    assert rows and all(r.rfrawp is not None for r in rows)
    # replay rfrawp is a plain array<double>, parquet-native
    assert dict(out.dtypes)["rfrawp"] == "array<double>"
    # argmax agrees with the mllib leg written by the sibling test
    mllib = {
        (r.cx, r.cy, r.px, r.py, r.sday, r.eday): list(r.rfrawp.toArray())
        for r in spark.read.parquet(paths["preds"]).collect()
    }
    for r in rows:
        k = (r.cx, r.cy, r.px, r.py, r.sday, r.eday)
        got, want = list(r.rfrawp), mllib[k]
        assert len(got) == len(want)
        assert got.index(max(got)) == want.index(max(want))


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
