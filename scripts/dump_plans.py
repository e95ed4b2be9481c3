#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named registry queries to files.

Produces the per-round plan evidence the optimization deliverables
require (``plans/r<N>/<query>_{before,after}.txt``): run it once from a
worktree at the round-start commit with ``--suffix _before``, and once
at HEAD with ``--suffix _after``.

Usage::

    python scripts/dump_plans.py --out plans/r15 --suffix _after \
        [--sf /root/testdata/sf0.001] name1 name2 ...

Building a query may execute control-plane work (eager localCheckpoint,
memo builds), so plans reflect what a fresh session would execute.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from azure_sales_etl_pipeline_spark.session import get_spark
    from __spark_entry__ import queries

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    qs = queries()
    missing = [n for n in args.names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")
    for name in args.names:
        df = qs[name](spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = out / f"{name}{args.suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
