"""Custom Python data source: chip-id filter pushdown must prune
input partitions (the source-boundary equivalent of the J1
selective read)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, In

from lcmap_firebird_spark.sources import ardgen

CHIPS = "0:0;3000:0;6000:0;0:3000"


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    ardgen.register(spark)


def _read(spark):
    return (
        spark.read.format("ardgen")
        .option("chips", CHIPS)
        .option("n_pixels", "2")
        .option("n_obs", "5")
        .load()
    )


def test_full_scan_reads_all_chips(spark):
    df = _read(spark)
    chips = {(r.cx, r.cy) for r in df.select("cx", "cy").distinct().collect()}
    assert chips == {(0, 0), (3000, 0), (6000, 0), (0, 3000)}
    assert df.count() == 4 * 2 * 2 * 5


def test_equality_filter_prunes_partitions(spark):
    df = _read(spark).filter((F.col("cx") == 0) & (F.col("cy") == 0))
    # partition-level proof: only 1 of 4 chip partitions is planned
    assert df.rdd.getNumPartitions() == 1
    assert {(r.cx, r.cy) for r in df.select("cx", "cy").distinct().collect()} == {
        (0, 0)
    }


def test_in_filter_prunes_partitions(spark):
    df = _read(spark).filter(F.col("cx").isin(0, 3000))
    assert df.rdd.getNumPartitions() == 3  # (0,0), (3000,0), (0,3000)


def test_unsupported_filters_still_applied(spark):
    # value predicate isn't pushable → Spark must post-filter correctly
    df = _read(spark).filter((F.col("cx") == 0) & (F.col("t") > 120))
    rows = df.collect()
    assert rows and all(r.t > 120 and r.cx == 0 for r in rows)


def test_reader_pushdown_unit():
    # driver-side contract: supported filters consumed, others returned
    r = ardgen.ArdReader({"chips": CHIPS, "n_pixels": "2", "n_obs": "5"})
    leftover = list(
        r.pushFilters([EqualTo(("cx",), 0), EqualTo(("t",), 120)])
    )
    assert [type(f).__name__ for f in leftover] == ["EqualTo"]
    assert leftover[0].attribute == ("t",)
    assert len(r.partitions()) == 2  # (0,0) and (0,3000)
    inr = ardgen.ArdReader({"chips": CHIPS})
    list(inr.pushFilters([In(("cy",), (0,))]))  # In.value is the tuple
    assert len(inr.partitions()) == 3


def test_deterministic_generation(spark):
    a = sorted(map(tuple, _read(spark).collect()))
    b = sorted(map(tuple, _read(spark).collect()))
    assert a == b
