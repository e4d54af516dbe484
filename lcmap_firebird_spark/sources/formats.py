"""File-format and stream connectors — the [absent] S-row of
SURVEY §2.1 (the reference only speaks Cassandra + HTTP;
a general engine needs the standard format surface).

All readers take explicit schemas where inference would be a
scale hazard (CSV/JSON inference scans the data twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.options(**options).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | None = None, **options
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).json(path)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).orc(path)


def read_parquet(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).parquet(path)


def write_format(
    df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite", **options
) -> None:
    df.write.mode(mode).options(**options).format(fmt).save(path)


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka stream source (untestable in this container — no broker
    and no kafka connector jar; the call shape is the standard
    spark-sql-kafka contract and fails fast with a clear error when
    the package is absent)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
