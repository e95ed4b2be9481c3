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


# Both live-plan tests share ONE audit() pass over SUBSET ∪
# EXPECTATIONS (plan construction executes stream drains / demo
# pipelines for some queries, so auditing a query twice pays twice —
# merging measured ~6 s off the suite). Keyed by id(spark) so a fresh
# session never reuses a stale audit.
_AUDIT_CACHE: dict[int, dict] = {}


def _shared_audit(spark) -> dict:
    cached = _AUDIT_CACHE.get(id(spark))
    if cached is None:
        names = sorted(set(SUBSET) | set(plan_audit.EXPECTATIONS))
        cached = plan_audit.audit(spark, SF_DIR, names)
        _AUDIT_CACHE[id(spark)] = cached
    return cached


def test_subset_plans_hold_structural_invariants(spark):
    full = _shared_audit(spark)
    results = {n: full[n] for n in SUBSET}
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


def test_expectations_hold_on_live_plans(spark):
    """Every EXPECTATIONS entry (r8 verdict item 7) must pass against
    the live plan — a dropped pushdown / lost broadcast / extra shuffle
    in any scan/join-critical query fails here (and in the per-round
    audit script, which exits non-zero)."""
    full = _shared_audit(spark)
    results = {n: full[n] for n in plan_audit.EXPECTATIONS}
    problems = {
        n: (f.get("error") or plan_audit.expectation_violations(n, f))
        for n, f in results.items()
    }
    assert not {n: p for n, p in problems.items() if p}, problems


def test_expectations_detect_planted_regressions():
    """Positive control: the checker must actually FLAG a plan that
    lost its pushdown, lost a broadcast, or grew an extra shuffle."""
    good = {
        "error": None,
        "pushed": True,
        "partition_pruned": False,
        "bhj": 10,
        "exchanges": 0,
    }
    assert plan_audit.expectation_violations("fact_order_details", good) == []

    no_push = dict(good, pushed=False)
    assert "expected-pushdown-missing" in plan_audit.expectation_violations(
        "fact_order_details", no_push
    )
    lost_bcast = dict(good, bhj=2)
    assert any(
        v.startswith("expected>=") for v in
        plan_audit.expectation_violations("fact_order_details", lost_bcast)
    )
    extra_shuffle = dict(good, exchanges=4)
    assert any(
        v.startswith("exchange-budget") for v in
        plan_audit.expectation_violations("fact_order_details", extra_shuffle)
    )


def test_ledger_covers_full_registry():
    """PLANS.md must hold exactly one row per registered query — the
    r10 accident (a one-query subset --write replaced the whole
    255-row ledger) stays impossible: subset runs merge via
    ``existing_rows`` and this pin fails the suite if the committed
    ledger ever loses rows again."""
    from azure_sales_etl_pipeline_spark.plans import registry

    queries, _ = registry()
    rows = plan_audit.existing_rows(REPO / "PLANS.md")
    missing = sorted(set(queries) - set(rows))
    extra = sorted(set(rows) - set(queries))
    assert not missing, f"PLANS.md missing {len(missing)} rows: {missing[:5]}"
    assert not extra, f"PLANS.md has stale rows: {extra[:5]}"


def test_subset_write_merges_not_overwrites(tmp_path):
    """A subset render must KEEP prior rows for un-audited queries."""
    ledger = tmp_path / "PLANS.md"
    full = plan_audit.render(
        {"q_a": {"error": "boom"}, "q_b": {"error": "boom"}}, "sf"
    )
    ledger.write_text(full)
    prior = plan_audit.existing_rows(ledger)
    assert set(prior) == {"q_a", "q_b"}
    merged = plan_audit.render({"q_b": {"error": "new"}}, "sf", keep=prior)
    rows = {
        m.group(1)
        for line in merged.splitlines()
        if (m := __import__("re").match(r"\| (q_[ab]) \| ", line))
    }
    assert rows == {"q_a", "q_b"}
    assert "ERROR: new" in merged and "| q_a | — | — | — | — | — | — | ERROR: boom |" in merged


def test_formatted_exchange_counter_counts_nodes(spark):
    """The exchanges feature must count real Exchange nodes in
    formatted explain (the pre-r9 substring match always returned 0)."""
    import pyspark.sql.functions as F

    df = (
        spark.range(100)
        .groupBy((F.col("id") % 7).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert plan_audit.plan_features(plan)["exchanges"] >= 1
