"""Landing→Bronze CSV ingestion
(/root/reference/databricks_notebooks/1_Landing_to_Bronze.py re-expressed).

Lifecycle per table (faithful to the reference):
- discover per-table files under the landing root, skipping `_`-prefixed
  entries (S10; 1_Landing_to_Bronze.py:12,17-21)
- FIRST load: header + inferSchema (S1; :44-46). Note the reference
  accepts the inferSchema DECIMAL→double degradation (SURVEY §1.2) —
  so does the engine.
- SUBSEQUENT loads: pin the reader to the existing Bronze schema minus
  the engine-added audit columns (S2; :41-42) so types never drift.
- enrich with audit columns: ingestion_timestamp (injectable clock, F1)
  and source_file lineage (F2; :54-55)
- append with schema evolution (S5 shim in operators.writer; :59-62),
  create on first write (S6; :65-67)
- empty input short-circuits (P12; :49) with df.isEmpty(), not .rdd

Scale: CSV read parallelism is per-file/per-split; the audit columns are
pure map. The append itself writes without shuffle. At 100 TB you'd
land compressed CSV in many files — the loop is per-table, the files
within a table load as one distributed job.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..catalog import table_exists
from ..functions import utcnow_naive
from ..operators.writer import append_evolve, read_table

AUDIT_COLS = ("ingestion_timestamp", "source_file")


def discover_sources(landing_root: str) -> dict[str, str]:
    """Per-table landing dirs/files, `_`-prefixed entries skipped."""
    root = Path(landing_root)
    out: dict[str, str] = {}
    if not root.exists():
        return out
    for entry in sorted(root.iterdir()):
        if entry.name.startswith("_"):
            continue
        name = entry.stem if entry.is_file() else entry.name
        out[name] = str(entry)
    return out


class CsvIngestor:
    """Landing→Bronze for one layer root pair."""

    def __init__(
        self,
        spark: SparkSession,
        bronze_root: str,
        clock: Callable[[], dt.datetime] | None = None,
    ):
        self.spark = spark
        self.bronze_root = Path(bronze_root)
        self.clock = clock or utcnow_naive

    def bronze_path(self, table: str) -> str:
        return str(self.bronze_root / table)

    def _pinned_schema(self, table: str) -> StructType | None:
        """Existing Bronze schema minus audit columns — the reader pin
        (reference reads the Delta schema and imposes it, :41-42)."""
        path = self.bronze_path(table)
        if not table_exists(path):
            return None
        full = read_table(self.spark, path).schema
        return StructType([f for f in full.fields if f.name not in AUDIT_COLS])

    def ingest(self, table: str, csv_path: str) -> int:
        """Load one table's landing CSV into Bronze. Returns rows ingested
        (0 = empty short-circuit, nothing written).

        Divergence from the reference, deliberate: imposing the pinned
        StructType on the CSV reader (1_Landing_to_Bronze.py:41-42)
        silently DROPS columns the batch added, so mergeSchema-on-write
        never sees them. The engine instead infers, then casts the
        already-known columns back to their pinned types — type drift is
        still impossible, but new columns survive to evolve the table.
        """
        pinned = self._pinned_schema(table)
        df = self.spark.read.option("header", "true").option("inferSchema", "true").csv(csv_path)
        # Capture lineage BEFORE any projection: the _metadata pseudo-column
        # only resolves against the file-source relation (F2).
        df = df.withColumn("source_file", F.col("_metadata.file_path"))
        if pinned is not None:
            types = {f.name: f.dataType for f in pinned.fields}
            df = df.select(
                *[
                    F.col(c).cast(types[c]).alias(c) if c in types else F.col(c)
                    for c in df.columns
                ]
            )
        if df.isEmpty():
            return 0
        # The ingested-rows count rides the WRITE job via the Observation
        # API instead of a second count() pass — at 100 TB that second
        # pass re-reads the whole landing batch for one log number.
        obs = Observation()
        enriched = df.withColumn(
            "ingestion_timestamp", F.lit(self.clock()).cast("timestamp")
        ).observe(obs, F.count(F.lit(1)).alias("n"))
        append_evolve(self.spark, enriched, self.bronze_path(table))
        return int(obs.get["n"])

    def run(self, landing_root: str) -> dict[str, int | None]:
        """The per-table loop with error isolation (C3; the reference
        skips missing-path tables and raises on real errors,
        1_Landing_to_Bronze.py:71-73). Returns per-table row counts,
        None for tables that failed."""
        results: dict[str, int | None] = {}
        for table, path in discover_sources(landing_root).items():
            try:
                results[table] = self.ingest(table, path)
            except Exception:  # noqa: BLE001 — per-table isolation
                results[table] = None
        return results


def land_batch(
    df: DataFrame,
    landing_root: str,
    table: str,
    clock: Callable[[], dt.datetime] | None = None,
    quote_all: bool = True,
) -> str:
    """ADF Copy-sink parity for the LANDING side: write one extracted
    batch as ``<landing_root>/<table>/<table>_<yyyyMMddHHmmss>.csv`` —
    the reference's timestamped landing-file naming convention
    (README.MD:89) with quoteAll text (S12, adf/pipeline.json:135-145).
    Spark writers name their own part files, so the batch stages
    through a temp dir and the single part renames to the convention;
    returns the final path. Batches accumulate (one file per extract
    window) and ``CsvIngestor.run`` reads the whole per-table dir."""
    import glob as _glob
    import shutil
    import tempfile

    ts = (clock or utcnow_naive)()
    dest_dir = Path(landing_root) / table
    dest_dir.mkdir(parents=True, exist_ok=True)
    stage = tempfile.mkdtemp(prefix=f"land_{table}_")
    try:
        writer = df.coalesce(1).write.option("header", True)
        if quote_all:
            writer = writer.option("quoteAll", True)
        writer.csv(f"{stage}/out")
        (part,) = _glob.glob(f"{stage}/out/part-*.csv")
        final = dest_dir / f"{table}_{ts:%Y%m%d%H%M%S}.csv"
        shutil.move(part, final)
        return str(final)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
