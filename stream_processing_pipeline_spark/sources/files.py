"""File sources: parquet / csv / json, batch and streaming.

Generalizes the reference's static CSV read
(``spark.read.csv(path, header=True, inferSchema=True)``,
``/root/reference/src/spark_streaming.py:302-304``) and adds streaming file
sources so every batch query in this engine can also run incrementally
(Structured Streaming treats a directory as an unbounded table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["read_batch", "read_stream", "read_static_csv"]


def read_static_csv(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Static dimension-table CSV (header row; inferSchema when no schema)."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.read.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Streaming file source. Schema is required by Structured Streaming.

    ``max_files_per_trigger`` bounds micro-batch size — the file-source analog
    of Kafka's ``maxOffsetsPerTrigger`` for backpressure at scale.
    """
    reader = spark.readStream.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
