"""Interchange formats beyond CSV/Parquet: JSONL and ORC.

JSONL (one JSON object per line) is the lingua franca of training-data
exchange — every tokenizer/trainer ingests it, and it's the natural
export target after the curation funnel. Spark's ``json`` writer IS
line-delimited JSON, so the export shards across executors like any
write: no driver involvement, one file per partition. The reader needs
an explicit schema in production (schema inference reads the data
twice and types drift per-shard — exactly the CSV lesson from the
reference's infer-then-pin lifecycle, 1_Landing_to_Bronze.py:41-46).

ORC is the columnar alternative to Parquet (predicate pushdown, column
pruning, and vectorized reads all work the same through the DataSource
API) — supported so a user on an ORC-standardized lake can switch
formats without touching query code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str, n_shards: int | None = None) -> None:
    """Export as line-delimited JSON. ``n_shards`` repartitions to an
    exact file count for downstream consumers that want bounded,
    evenly-sized shards (tokenizer jobs usually do) — an explicit
    round-robin shuffle, the price of exact sharding; default keeps the
    upstream partitioning, which at 100 TB is usually right."""
    if n_shards is not None:
        df = df.repartition(n_shards)
    df.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Read line-delimited JSON. Pass the schema in production — omitted
    means Spark samples the data for inference (an extra scan, and a
    per-run type-drift hazard)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_avro(df: DataFrame, path: str) -> None:
    """Avro export (row-oriented — the streaming/Kafka interchange
    format). spark-avro is an external module since Spark 2.4 and is
    not deployed in this container: the call raises a clear error
    unless the package is on the classpath (same gating policy as the
    Delta storage backend)."""
    try:
        df.write.mode("overwrite").format("avro").save(path)
    except Exception as e:  # noqa: BLE001
        if "Failed to find data source: avro" in str(e):
            raise RuntimeError(
                "spark-avro is not on the classpath; deploy with "
                "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
            ) from e
        raise


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # noqa: BLE001
        if "Failed to find data source: avro" in str(e):
            raise RuntimeError(
                "spark-avro is not on the classpath; deploy with "
                "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
            ) from e
        raise
