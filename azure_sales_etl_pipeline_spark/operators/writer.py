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

Atomicity boundary: the swap uses local-filesystem rename (shutil),
which is atomic on POSIX but NOT on object stores (S3 rename = copy +
delete) and needs the Hadoop FileSystem API on HDFS. At cluster scale,
route overwrites through a storage layer with an atomic commit — the
``backend="delta"`` seam below is exactly that (the transaction log
makes overwrite/append atomic natively); the staged-swap code is the
local-FS/parquet implementation of the same contract.
"""

from __future__ import annotations

import importlib.util
import shutil
import tempfile
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table_exists

#: Storage backends behind the engine's sinks. ``parquet`` is fully
#: implemented; ``delta`` is the drop-in seam for environments with
#: delta-spark installed (the reference's native format,
#: 1_Landing_to_Bronze.py:60) — selecting it without the package raises
#: immediately instead of failing mid-write.
BACKENDS = ("parquet", "delta")


def resolve_backend(backend: str) -> str:
    """Validate a storage-backend choice and return its writer format.

    Delta gives native MERGE/mergeSchema/time-travel; everything in this
    module then delegates to ``format("delta")`` and the staged-swap /
    union-by-name shims become unnecessary. The seam is explicit so a
    user with delta-spark can switch per-table, not per-fork.
    """
    if backend not in BACKENDS:
        raise ValueError(f"unknown storage backend {backend!r}; expected one of {BACKENDS}")
    if backend == "delta" and importlib.util.find_spec("delta") is None:
        raise RuntimeError(
            "storage backend 'delta' requested but delta-spark is not "
            "installed; install delta-spark or use backend='parquet'"
        )
    return backend


def create_table(df: DataFrame, path: str, backend: str = "parquet") -> None:
    """First materialization (S6): fail if the table already exists."""
    df.write.format(resolve_backend(backend)).mode("errorifexists").save(path)


#: Name of the commit-metadata file ``overwrite_table`` stages inside the
#: table directory. Underscore-prefixed so Spark's hidden-file filter
#: keeps it out of scans.
COMMIT_META_NAME = "_commit.json"


def overwrite_table(
    df: DataFrame,
    path: str,
    backend: str = "parquet",
    commit_meta: dict | Callable[[], dict] | None = None,
) -> None:
    """Full refresh (S7) with staged swap — never a torn table.

    ``commit_meta`` (optional) is a JSON-able dict written to
    ``_commit.json`` INSIDE the staged directory before the swap, so the
    new table version and its metadata become visible in the SAME atomic
    rename. This is the transactional seam replay guards need: a sink
    that records "batch N is folded in" anywhere outside the swapped
    directory has a crash window between data commit and marker commit
    (the round-3 streaming_mart bug). It may also be a CALLABLE
    returning that dict, invoked after the staging write completes and
    before the swap — the seam that lets callers stamp metrics the
    write itself produced (``observe()`` counts) without a second pass
    over the data, still inside the same atomic rename.

    Delta backend: the transaction log makes overwrite atomic natively,
    so no staging dance is needed. ``commit_meta`` is refused there —
    Delta's own ``txnAppId``/``txnVersion`` is the native form of the
    same idea and a loose side file would reintroduce the torn window.
    """
    if resolve_backend(backend) == "delta":
        if commit_meta is not None:
            raise ValueError(
                "commit_meta is parquet-backend only; on Delta use the "
                "transaction log's txnAppId/txnVersion for idempotent commits"
            )
        df.write.format("delta").mode("overwrite").option(
            "overwriteSchema", "true"
        ).save(path)
        return
    p = Path(path)
    tmp = Path(tempfile.mkdtemp(dir=str(p.parent) if p.parent.exists() else None, prefix=".stage_"))
    stage = tmp / "data"
    df.write.mode("overwrite").parquet(str(stage))
    if commit_meta is not None:
        import json

        meta = commit_meta() if callable(commit_meta) else commit_meta
        (stage / COMMIT_META_NAME).write_text(json.dumps(meta))
    if p.exists():
        shutil.rmtree(p)
    p.parent.mkdir(parents=True, exist_ok=True)
    shutil.move(str(stage), str(p))
    shutil.rmtree(tmp, ignore_errors=True)


def read_commit_meta(path: str) -> dict | None:
    """Read the ``commit_meta`` dict the last ``overwrite_table`` staged
    into ``path``, or None if the table has none (or doesn't exist)."""
    f = Path(path) / COMMIT_META_NAME
    if not f.exists():
        return None
    import json

    return json.loads(f.read_text())


def append_evolve(
    spark: SparkSession, df: DataFrame, path: str, backend: str = "parquet"
) -> None:
    """Append with schema evolution (S5): union-by-name against the
    existing table schema. New batch columns are appended to the table
    schema (old files backfill null via mergeSchema-on-read); table
    columns missing from the batch are written as typed nulls.

    Delta backend: ``mergeSchema=true`` append is the native form of this
    whole function (the reference's exact write, 1_Landing_to_Bronze.py:60).
    """
    if resolve_backend(backend) == "delta":
        df.write.format("delta").mode("append").option("mergeSchema", "true").save(path)
        return
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


def read_table(spark: SparkSession, path: str, backend: str = "parquet") -> DataFrame:
    """Read an engine-managed table with schema merge across appends.
    Under the delta backend the log supplies the (already-evolved)
    schema, so the mergeSchema read option is parquet-path-only."""
    if resolve_backend(backend) == "delta":
        return spark.read.format("delta").load(path)
    return spark.read.option("mergeSchema", "true").parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    quote_all: bool = True,
    header: bool = True,
    sep: str = ",",
    mode: str = "overwrite",
) -> None:
    """CSV landing sink (S12) with ADF DelimitedTextSink parity: the
    reference's Copy activity writes every text field quoted
    (adf/pipeline.json:135-145, ``quoteAllText: true``), so values with
    embedded delimiters/newlines round-trip safely. ``quote_all=True``
    mirrors that default; Spark's own default quotes only when needed,
    which is also available (``quote_all=False``) since either form
    re-parses identically."""
    (
        df.write.option("header", str(header).lower())
        .option("quoteAll", str(quote_all).lower())
        .option("sep", sep)
        # Spark's CSV WRITER trims leading/trailing whitespace by default
        # (ignore*WhiteSpace=true) — silent data mutation in a landing
        # file. The quoted form preserves spacing exactly, as ADF does.
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .mode(mode)
        .csv(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    keys: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet sink (``key=value`` directory layout):
    the physical layout that makes partition PRUNING work — a query
    filtering on a partition key lists and reads ONLY the matching
    directories (PartitionFilters in the scan, asserted in
    tests/test_plans_explain.py), which at 100 TB is the difference
    between scanning a day and scanning a decade.

    With ``mode="overwrite"`` the write REPLACES only the partitions
    present in ``df`` (dynamic partition overwrite, set per-write via
    the DataFrameWriter option rather than mutating session conf) —
    the idempotent daily-reload idiom: re-running a day's load rewrites
    that day's directory and leaves history untouched. Choose partition
    keys with bounded cardinality (date, region, status — not user_id):
    every distinct value is a directory, and millions of tiny
    directories destroy listing performance.
    """
    (
        df.write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(*keys)
        .mode(mode)
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Metastore-backed (managed) tables — S14 + S8.
# The reference creates per-layer databases and writes its side-output as
# a managed table queryable BY NAME:
#   spark.sql("CREATE DATABASE IF NOT EXISTS silver")   (2_Bronze_to_Silver.py:11)
#   df.write.saveAsTable("default.new_customers_for_emailing", mode="overwrite")
#                                                       (2_Bronze_to_Silver.py:114-116)
# Plain Spark's in-memory/Derby catalog supports both — no Databricks
# dependency. Path tables (LayerCatalog) and managed tables coexist; the
# managed form is what a SQL user hits first.
# ---------------------------------------------------------------------------


def create_database(spark: SparkSession, name: str) -> None:
    """``CREATE DATABASE IF NOT EXISTS`` (S14) — one namespace per
    medallion layer, as the reference does for silver/gold."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def save_managed_table(
    df: DataFrame, qualified_name: str, mode: str = "overwrite", backend: str = "parquet"
) -> None:
    """Managed-table sink (S8): ``db.table`` lands in the session
    metastore and is queryable via ``spark.table(name)`` / SQL. The
    database part must already exist (``create_database``)."""
    df.write.format(resolve_backend(backend)).mode(mode).saveAsTable(qualified_name)


# ---------------------------------------------------------------------------
# versioned snapshots (parquet-native time travel)
# ---------------------------------------------------------------------------

_VERSION_PTR = "_current_version.json"


def write_snapshot(
    df: DataFrame,
    path: str,
    retain: int = 5,
    commit_meta: dict | None = None,
) -> int:
    """Versioned table write with TIME TRAVEL — the parquet-native half
    of what a Delta/Iceberg log provides. Each call writes a new
    IMMUTABLE snapshot directory ``v=N`` under ``path`` (invisible to
    readers while being written — nothing references it yet), then
    flips the current-version POINTER file via write-then-``os.replace``
    (atomic on POSIX): a reader always resolves to a complete version,
    never a torn table, and concurrent readers of version N−1 keep a
    consistent view while N lands, because old snapshot files are never
    mutated — unlike ``overwrite_table``'s swap, which deletes the old
    directory out from under a slow reader. Old versions stay readable
    (``read_snapshot(..., version=k)``) until pruned past ``retain``.

    What this does NOT give: multi-writer arbitration — two concurrent
    writers can both stage v=N+1 and the second pointer flip silently
    wins. That needs a real table-format log (the ``backend="delta"``
    seam); single-writer pipelines (this engine's orchestrator model,
    like the reference's ADF trigger) are the supported contract.

    Returns the committed version number."""
    import json
    import os

    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    cur = snapshot_current_version(path)
    new = 1 if cur is None else cur + 1
    df.write.mode("overwrite").parquet(str(p / f"v={new}"))
    tmp = p / f".ptr_tmp_{new}"
    tmp.write_text(
        json.dumps({"version": new, "meta": commit_meta})
    )
    os.replace(tmp, p / _VERSION_PTR)
    # max(1, retain): the just-committed version must never prune
    # itself (retain<=0 would delete v=new and leave the pointer
    # dangling) — same guard vacuum_snapshots applies.
    for old in snapshot_versions(path):
        if old <= new - max(1, retain):
            shutil.rmtree(p / f"v={old}", ignore_errors=True)
    return new


def snapshot_current_version(path: str) -> int | None:
    """Version the pointer currently commits to, or None (no table)."""
    import json

    f = Path(path) / _VERSION_PTR
    if not f.exists():
        return None
    return int(json.loads(f.read_text())["version"])


def snapshot_versions(path: str) -> list[int]:
    """All snapshot versions present on disk (committed pointer target,
    retained history, and any staged-but-unreferenced directory — the
    crash leftovers a vacuum would prune), ascending."""
    p = Path(path)
    if not p.exists():
        return []
    return sorted(
        int(d.name.split("=", 1)[1])
        for d in p.iterdir()
        if d.is_dir() and d.name.startswith("v=")
    )


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot table — the committed version by default, or a
    pinned historical ``version`` (time travel). Raises KeyError for a
    version that was pruned or never committed... a staged directory
    abandoned by a crash has no pointer and is invisible here unless
    pinned explicitly (mirroring Delta's rule that uncommitted files
    are not part of any version)."""
    cur = snapshot_current_version(path)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot table at {path}")
    v = cur if version is None else version
    d = Path(path) / f"v={v}"
    if version is not None and not d.exists():
        raise KeyError(f"version {version} not present under {path}")
    return spark.read.parquet(str(d))


def vacuum_snapshots(path: str, retain: int = 5) -> list[int]:
    """Prune a snapshot table: drop versions older than the last
    ``retain`` committed ones AND any staged-but-never-committed
    leftover directories ABOVE the pointer (crash debris from a writer
    that died between staging and the pointer flip). The committed
    version itself is never dropped regardless of ``retain``. Returns
    the pruned version numbers. Safe to run any time — it only deletes
    directories no reader can resolve through the pointer (modulo
    time-travel pins older than the retention window, same caveat as
    Delta's VACUUM)."""
    cur = snapshot_current_version(path)
    if cur is None:
        return []
    pruned = []
    for v in snapshot_versions(path):
        if v == cur:
            continue
        if v <= cur - max(1, retain) or v > cur:
            shutil.rmtree(Path(path) / f"v={v}", ignore_errors=True)
            pruned.append(v)
    return pruned
