"""events.ts physical-type robustness: the driver regenerated the
testdata between rounds and changed ts from TIMESTAMP(NANOS) to
timestamp[us]-no-tz, breaking five batch queries and silently
collapsing streaming event times 1000×. These tests pin
catalog.read_table's normalization for every generation so the next
regen is a no-op."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.catalog import read_table
from lcmap_firebird_spark.functions.dates import micros
from lcmap_firebird_spark.streaming import events as SE

# one instant: 2024-01-01 00:09:58.778549 UTC
US = 1_704_067_798_778_549


def _write_events(path, ts_array):
    t = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"]),
            "value": pa.array([1.5], pa.float64()),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(t, path)


GENERATIONS = {
    # round-3 data: µs, no timezone → Spark TIMESTAMP_NTZ
    "us_ntz": pa.array([US], pa.timestamp("us")),
    # µs adjusted-to-UTC → Spark TIMESTAMP (LTZ)
    "us_utc": pa.array([US], pa.timestamp("us", tz="UTC")),
    # round-1/2 data: TIMESTAMP(NANOS) → bigint under nanosAsLong
    "ns": pa.array([US * 1000], pa.timestamp("ns")),
}


@pytest.mark.parametrize("gen", list(GENERATIONS))
def test_read_table_normalizes_every_generation(spark, tmp_path, gen):
    d = tmp_path / gen
    d.mkdir()
    _write_events(str(d / "events.parquet"), GENERATIONS[gen])
    df = read_table(spark, "events", str(d))
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    row = df.select(micros("ts").alias("us")).first()
    assert row.us == US


@pytest.mark.parametrize("gen", ["us_ntz", "ns"])
def test_stream_source_sniffs_every_generation(spark, tmp_path, gen):
    """The stream source reads the raw int64 under a declared long
    schema; the magnitude sniff must recover epoch µs for both the ns
    and µs generations (the µs→÷1000 bug collapsed all event times to
    1970)."""
    d = tmp_path / f"s_{gen}"
    d.mkdir()
    _write_events(str(d / "events.parquet"), GENERATIONS[gen])
    stream = SE.stream_events(spark, str(d), glob="*.parquet")
    out = SE.run_available_now(
        stream.select(F.unix_micros("ts").alias("us")), spark, mode="append"
    )
    assert [r.us for r in out.collect()] == [US]


@pytest.mark.parametrize(
    "gen,arr",
    [
        # hypothetical future generations — regen insurance
        ("ms_ntz", lambda: pa.array([US // 1000], pa.timestamp("ms"))),
        ("s_ntz", lambda: pa.array([US // 1_000_000], pa.timestamp("s"))),
        ("raw_us", lambda: pa.array([US], pa.int64())),
        ("raw_ms", lambda: pa.array([US // 1000], pa.int64())),
        ("raw_s", lambda: pa.array([US // 1_000_000], pa.int64())),
    ],
)
def test_read_table_handles_future_generations(spark, tmp_path, gen, arr):
    """ms/s logical annotations and UNANNOTATED int64 in any unit:
    `catalog.ts_unit` decides once per dataset from the footer
    (annotation, else row-group stats), so a future regen to any of
    these shapes reads correctly with no code change. Sub-µs detail
    is truncated by construction for ms/s units."""
    d = tmp_path / gen
    d.mkdir()
    _write_events(str(d / "events.parquet"), arr())
    df = read_table(spark, "events", str(d))
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    us = df.select(micros("ts").alias("us")).first().us
    expected = {
        "ms_ntz": US // 1000 * 1000,
        "s_ntz": US // 1_000_000 * 1_000_000,
        "raw_us": US,
        "raw_ms": US // 1000 * 1000,
        "raw_s": US // 1_000_000 * 1_000_000,
    }[gen]
    assert us == expected
