"""Parquet sinks (SURVEY.md S5-S8) including the mergeSchema shim.

The reference writes Delta with ``mergeSchema=true`` appends
(1_Landing_to_Bronze.py:59-62). Plain parquet appends don't evolve the
table schema, so the engine unions-by-name against the existing schema
before appending: new columns arrive null-backfilled on old rows at
READ time (mergeSchema on read), old columns missing from the batch are
null-filled at write.

Staged overwrite: the SCD2 rewrite and any full refresh write to a
staging dir then swap, so readers never observe a half-written table —
this closes the reference's two-commit vulnerability window noted in
SURVEY.md §3 (expire and append are separate Delta commits there).
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table_exists


def create_table(df: DataFrame, path: str) -> None:
    """First materialization (S6): fail if the table already exists."""
    df.write.mode("errorifexists").parquet(path)


def overwrite_table(df: DataFrame, path: str) -> None:
    """Full refresh (S7) with staged swap — never a torn table."""
    p = Path(path)
    tmp = Path(tempfile.mkdtemp(dir=str(p.parent) if p.parent.exists() else None, prefix=".stage_"))
    stage = tmp / "data"
    df.write.mode("overwrite").parquet(str(stage))
    if p.exists():
        shutil.rmtree(p)
    p.parent.mkdir(parents=True, exist_ok=True)
    shutil.move(str(stage), str(p))
    shutil.rmtree(tmp, ignore_errors=True)


def append_evolve(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Append with schema evolution (S5): union-by-name against the
    existing table schema. New batch columns are appended to the table
    schema (old files backfill null via mergeSchema-on-read); table
    columns missing from the batch are written as typed nulls."""
    if not table_exists(path):
        create_table(df, path)
        return
    existing = spark.read.parquet(path).schema
    batch_cols = {f.name for f in df.schema.fields}
    aligned = df
    for field in existing.fields:
        if field.name not in batch_cols:
            aligned = aligned.withColumn(field.name, F.lit(None).cast(field.dataType))
    aligned.write.mode("append").parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read an engine-managed table with schema merge across appends."""
    return spark.read.option("mergeSchema", "true").parquet(path)
