"""JSON row goldens — the reference's second test technique
(test/test_chip.py:17-25, test_pixel.py:17-26, test_tile.py:25-32):
build a tiny DF from literal rows WITH an extra column, conform it,
and assert the exact JSON serialization (proves both value fidelity
and the drop-extra-columns contract)."""

from __future__ import annotations

from pyspark.sql import Row

from lcmap_firebird_spark import schemas
from lcmap_firebird_spark.operators.relational import conform


def test_chip_json_golden(spark):
    rows = [
        Row(cx=0, cy=0, dates=["2024-01-01", "2024-02-01"], extra="DROPPED"),
    ]
    df = conform(spark.createDataFrame(rows), schemas.chip_schema())
    assert df.toJSON().collect() == [
        '{"cx":0,"cy":0,"dates":["2024-01-01","2024-02-01"]}'
    ]


def test_pixel_json_golden(spark):
    rows = [Row(cx=3000, cy=-3000, px=1, py=2, mask=[0, 1, 1], extra=9)]
    df = conform(spark.createDataFrame(rows), schemas.pixel_schema())
    assert df.toJSON().collect() == [
        '{"cx":3000,"cy":-3000,"px":1,"py":2,"mask":[0,1,1]}'
    ]


def test_tile_json_golden(spark):
    rows = [
        Row(
            tx=150000,
            ty=-150000,
            name="rf-2024",
            model="<blob>",
            updated="2024-06-15",
            extra="DROPPED",
        )
    ]
    df = conform(spark.createDataFrame(rows), schemas.tile_schema())
    assert df.toJSON().collect() == [
        '{"tx":150000,"ty":-150000,"name":"rf-2024",'
        '"model":"<blob>","updated":"2024-06-15"}'
    ]


def test_parquet_roundtrip_preserves_golden(spark, tmp_path):
    # the reference's live-Cassandra round-trip (test_chip.py:28-41)
    # re-expressed as a tmp parquet round-trip (SURVEY §5 adopt note)
    rows = [Row(cx=0, cy=0, dates=["2024-01-01"])]
    df = spark.createDataFrame(rows, schemas.chip_schema())
    path = str(tmp_path / "chip")
    df.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.toJSON().collect() == df.toJSON().collect()
    assert back.schema.simpleString() == schemas.chip_schema().simpleString()
