"""Bucket-partitioned SCD2: surgical partition rewrite must produce the
same logical state as the full-rewrite mode, while leaving untouched
bucket files physically untouched on disk."""

from __future__ import annotations

import datetime as dt
import os
from pathlib import Path

from azure_sales_etl_pipeline_spark.operators.scd2 import SCD2Table


def snapshot_files(root: str) -> dict[str, float]:
    out = {}
    for p in Path(root).rglob("*.parquet"):
        out[str(p)] = p.stat().st_mtime_ns
    return out


def rows_of(dim):
    return sorted(
        (r["id"], r["segment"], r["is_current"], r["effective_date"], r["end_date"])
        for r in dim.history().collect()
    )


def test_bucketed_equals_full_rewrite(spark, tmp_path):
    state = {"now": dt.datetime(2024, 1, 1)}
    b1 = [(i, f"n{i}", "V1") for i in range(40)]
    b2 = [(i, f"n{i}", "V2" if i % 10 == 0 else "V1") for i in range(40)] + [
        (100, "new", "V1")
    ]
    schema = "id int, name string, segment string"

    full = SCD2Table(spark, str(tmp_path / "full"), "id", clock=lambda: state["now"])
    bucketed = SCD2Table(
        spark, str(tmp_path / "bucketed"), "id", clock=lambda: state["now"], n_buckets=8
    )
    for dim in (full, bucketed):
        state["now"] = dt.datetime(2024, 1, 1)
        s1 = dim.upsert(spark.createDataFrame(b1, schema))
        state["now"] = dt.datetime(2024, 2, 1)
        s2 = dim.upsert(spark.createDataFrame(b2, schema))
        assert s1 == {"insert": 40, "update": 0, "no_change": 0}
        assert s2 == {"insert": 1, "update": 4, "no_change": 36}

    assert rows_of(full) == rows_of(bucketed)
    assert bucketed.current().count() == 41


def test_bucketed_rewrites_only_touched_buckets(spark, tmp_path):
    state = {"now": dt.datetime(2024, 1, 1)}
    schema = "id int, name string, segment string"
    dim = SCD2Table(
        spark, str(tmp_path / "dim"), "id", clock=lambda: state["now"], n_buckets=16
    )
    dim.upsert(spark.createDataFrame([(i, f"n{i}", "V1") for i in range(200)], schema))
    before = snapshot_files(str(tmp_path / "dim"))
    n_parts_before = len({os.path.dirname(p) for p in before})

    # change exactly ONE key → at most one bucket rewritten
    state["now"] = dt.datetime(2024, 2, 1)
    stats = dim.upsert(spark.createDataFrame([(7, "n7", "V2")], schema))
    assert stats["update"] == 1
    after = snapshot_files(str(tmp_path / "dim"))

    changed_dirs = {
        os.path.dirname(p)
        for p in set(before) ^ set(after)
        | {p for p in before.keys() & after.keys() if before[p] != after[p]}
    }
    assert len(changed_dirs) == 1, f"buckets rewritten: {changed_dirs}"
    assert len({os.path.dirname(p) for p in after}) == n_parts_before
    # logical state correct: key 7 has two versions, one current
    hist7 = [r for r in dim.history().collect() if r["id"] == 7]
    assert sorted((r["segment"], r["is_current"]) for r in hist7) == [
        ("V1", False),
        ("V2", True),
    ]
    assert dim.current().count() == 200


def test_bucketed_delete_expiry_equals_full_rewrite(spark, tmp_path):
    """on_delete='expire' must produce identical logical state through
    the surgical bucket path and the full staged-swap path, including
    tombstones whose buckets contain no source rows this batch."""
    state = {"now": dt.datetime(2024, 1, 1)}
    schema = "id int, name string, segment string"
    b1 = [(i, f"n{i}", "V1") for i in range(60)]
    # drop every 7th key (deletes), change every 10th of the kept ones
    b2 = [
        (i, f"n{i}", "V2" if i % 10 == 0 else "V1")
        for i in range(60)
        if i % 7 != 0
    ]

    full = SCD2Table(
        spark, str(tmp_path / "full"), "id", clock=lambda: state["now"],
        on_delete="expire",
    )
    bucketed = SCD2Table(
        spark, str(tmp_path / "bucketed"), "id", clock=lambda: state["now"],
        n_buckets=8, on_delete="expire",
    )
    for dim in (full, bucketed):
        state["now"] = dt.datetime(2024, 1, 1)
        dim.upsert(spark.createDataFrame(b1, schema))
        state["now"] = dt.datetime(2024, 2, 1)
        stats = dim.upsert(spark.createDataFrame(b2, schema))
        assert stats["deleted"] == 9  # 0,7,...,56
        assert stats["insert"] == 0

    assert rows_of(full) == rows_of(bucketed)
    # tombstones: expired rows with no current successor
    cur_ids = {r["id"] for r in full.current().collect()}
    assert cur_ids == {i for i in range(60) if i % 7 != 0}
