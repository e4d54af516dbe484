"""Shared fixtures: one local SparkSession + a DuckDB oracle
connection with the driver's table views pre-registered (mimics the
driver's CORRECTNESS harness so parity failures surface in pytest
before the driver ever runs)."""

from __future__ import annotations

import os

import duckdb
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from lcmap_firebird_spark import TABLES  # noqa: E402
from lcmap_firebird_spark.session import session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spk = session(
        "firebird-tests",
        overrides={
            "spark.sql.shuffle.partitions": "4",
            "spark.driver.memory": "4g",
        },
    )
    yield spk


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
