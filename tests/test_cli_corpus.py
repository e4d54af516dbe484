"""`python -m lcmap_firebird_spark.cli corpus` — the corpus-prep
CLI wires prepare_corpus + write_corpus end to end."""

from __future__ import annotations

import json

from lcmap_firebird_spark.cli import main


def test_cli_corpus_prepares_and_writes(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "corpus")
    rc = main(
        [
            "corpus",
            "--documents", f"{sf_dir}/documents.parquet",
            "--output", out,
            "--languages", "en,fr",
            "--jaccard-threshold", "0.3",
            "--mixture", "src0=0.2,src1=0.2,src2=0.2,src3=0.2,src4=0.2",
            "--mixture-tokens", "20000",
        ]
    )
    assert rc == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert manifest["strata"]  # per-split counts recorded
    back = spark.read.parquet(out)
    assert back.count() > 0
    assert set(back.select("split").distinct().toPandas()["split"]) <= {
        "train", "val", "test"
    }
    # the mixture stage ran: epoch column present
    assert "epoch" in back.columns
