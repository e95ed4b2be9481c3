"""Fast-subset run of scripts/plan_audit.py's structural invariants:
no unpartitioned WindowExec, no CartesianProduct, no row-at-a-time
Python. The full registry audit (169 queries, several minutes — stream
drains and demo pipelines execute during construction) is the
per-round `python scripts/plan_audit.py --write` run that regenerates
PLANS.md; this test keeps the invariant checker itself honest on a
representative lazy subset."""

from __future__ import annotations

import importlib.util
from pathlib import Path

from tests.conftest import SF_DIR

REPO = Path(__file__).resolve().parents[1]
spec = importlib.util.spec_from_file_location(
    "plan_audit", REPO / "scripts" / "plan_audit.py"
)
plan_audit = importlib.util.module_from_spec(spec)
spec.loader.exec_module(plan_audit)

SUBSET = [
    "seller_performance_daily",
    "fact_order_details",
    "seller_segmentation",
    "supplier_revenue_gini",
    "token_budget_shards",
    "global_shuffle_export",
    "vocab_coverage",
    "bpe_pair_counts",
    "part_affinity_triangles",
    "part_affinity_lift",
    "cms_join_size_estimate",
    "user_event_gaps",
    "asof_join_cogroup",
    "media_decode_features",
    "sql_product_margin",
    "top_parts_per_supplier",
    "customer_running_revenue",
    "exact_dedup",
    "embedding_norms",
    "revenue_7d_window",
]


def test_subset_plans_hold_structural_invariants(spark):
    results = plan_audit.audit(spark, SF_DIR, SUBSET)
    assert len(results) == len(SUBSET)
    problems = {
        n: (f.get("error") or plan_audit.violations(f)) for n, f in results.items()
    }
    assert not {n: p for n, p in problems.items() if p}, problems


def test_detector_actually_detects(spark):
    """The invariant regex must flag a genuine global window and pass a
    partitioned one — guards against the pattern silently rotting."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    df = spark.range(100).withColumn("g", F.col("id") % 5)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    bad = df.withColumn("r", F.row_number().over(Window.orderBy("id")))
    plan = bad._jdf.queryExecution().explainString(mode)
    assert plan_audit.plan_features(plan)["global_window"] > 0

    good = df.withColumn(
        "r", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    plan = good._jdf.queryExecution().explainString(mode)
    assert plan_audit.plan_features(plan)["global_window"] == 0
