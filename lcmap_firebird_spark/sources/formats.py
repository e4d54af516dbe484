"""File-format and stream connectors — the [absent] S-row of
SURVEY §2.1 (the reference only speaks Cassandra + HTTP;
a general engine needs the standard format surface).

All readers take explicit schemas where inference would be a
scale hazard (CSV/JSON inference scans the data twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


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


# The record schema the kafka connector emits (Structured Streaming
# Kafka integration guide). Everything downstream of the connector is
# written against THIS shape, so the parse path is testable on a
# static DataFrame with no broker: the jar only supplies rows.
KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def parse_kafka_events(
    kafka_df: DataFrame, value_schema: StructType
) -> DataFrame:
    """Decode kafka records into typed event rows.

    `value` is UTF-8 JSON → `from_json` under the caller's declared
    schema (inference is impossible on a stream and a scale hazard
    anyway); kafka ingestion metadata is kept as `_topic/_partition/
    _offset/_ts` so downstream dedup can build an idempotence key
    without re-reading the broker. Works identically on a static
    DataFrame (tests) and a readStream source (production) — the plan
    is the same Catalyst tree.

    A value-schema field named like one of the reserved metadata
    columns is rejected HERE: the select itself would succeed with
    two identically-named columns, and every downstream reference
    would die with AMBIGUOUS_REFERENCE far from the cause (r8 glue
    review finding).
    """
    reserved = {"_topic", "_partition", "_offset", "_ts"}
    clash = reserved & {f.name for f in value_schema.fields}
    if clash:
        raise ValueError(
            f"value_schema field(s) {sorted(clash)} collide with the "
            "reserved kafka metadata columns (_topic/_partition/"
            "_offset/_ts); rename them in the declared schema"
        )
    return kafka_df.select(
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        F.col("topic").alias("_topic"),
        F.col("partition").alias("_partition"),
        F.col("offset").alias("_offset"),
        F.col("timestamp").alias("_ts"),
    ).select("v.*", "_topic", "_partition", "_offset", "_ts")
