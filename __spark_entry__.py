"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``lcmap_firebird_spark``; this module is the
thin driver-facing adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lcmap_firebird_spark.queries import merged  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue-by-nation: the reference's J2-style multi-key attach join
    (ccdc/features.py:6-17) + groupBy aggregation, end to end.
    """
    from lcmap_firebird_spark.queries.relational import j2_revenue_by_nation

    return j2_revenue_by_nation(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = merged()
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for each query (omitted for non-SQL ops)."""
    _, o = merged()
    return o
