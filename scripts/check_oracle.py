"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir and compares against
its ``oracle_sql()`` DuckDB result: row count, column names, and an
order-insensitive value hash (rows sorted, columns sorted by name,
floats rounded). Usage:  python scripts/check_oracle.py [sf_dir] [name...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

from __spark_entry__ import oracle_sql, queries
from azure_sales_etl_pipeline_spark.catalog import TESTDATA_TABLES, table_path
from azure_sales_etl_pipeline_spark.session import get_spark


def norm_cell(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    # --vanilla replicates the DRIVER'S environment: a bare SparkSession
    # with none of the engine session defaults. Round 2 shipped a bug
    # invisible to every in-repo check precisely because only the driver
    # used a vanilla session (events nanos crash) — run this mode before
    # relying on a green sweep.
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    if vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")

    qs, os_ = queries(), oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in os_:
            print(f"OK?  {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            res = con.execute(os_[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            failures += 1
            continue
        a, b = canon(srows, scols), canon(orows, ocols)
        if a != b:
            diff = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            print(f"FAIL {name}: value mismatch at sorted row {diff}:")
            print(f"  spark : {a[diff]}")
            print(f"  oracle: {b[diff]}")
            failures += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
