"""Property-based tests (hypothesis) for the engine's algebraic
invariants — the claims that must hold for EVERY input, not just the
fixture data:

- salted_join ≡ plain join (any key distribution, any salt count)
- merge_aggregate over any batch split ≡ one full recompute
- token-budget shard assignment is a deterministic pure function of
  (ordered sizes, budget): shards are contiguous, start at 0, and no
  doc's start offset crosses into the wrong shard

Hypothesis drives row multisets (with duplicates and skew) through the
same code paths the fixture tests use; Spark jobs per example are kept
tiny (≤60 rows) so the suite stays fast.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from azure_sales_etl_pipeline_spark.operators.maintenance import merge_aggregate
from azure_sales_etl_pipeline_spark.plans.scale import salted_join

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_keys = st.integers(min_value=0, max_value=5)  # few keys → forced collisions/skew


@given(
    left=st.lists(st.tuples(_keys, st.integers(-100, 100)), min_size=0, max_size=30),
    right=st.lists(st.tuples(_keys, st.integers(-100, 100)), min_size=0, max_size=30),
    n_salts=st.integers(min_value=1, max_value=5),
)
@_slow
def test_salted_join_equivalence(spark, left, right, n_salts):
    ldf = spark.createDataFrame(left or [(99, 0)], "k int, a int")
    rdf = spark.createDataFrame(right or [(98, 0)], "k int, b int")
    plain = sorted(tuple(r) for r in ldf.join(rdf, "k").collect())
    salted = sorted(
        tuple(r) for r in salted_join(ldf, rdf, "k", n_salts=n_salts).select("k", "a", "b").collect()
    )
    assert salted == plain


@given(
    rows=st.lists(st.tuples(_keys, st.integers(-50, 50)), min_size=1, max_size=40),
    cut=st.integers(min_value=0, max_value=40),
)
@_slow
def test_merge_aggregate_any_split_matches_recompute(spark, tmp_path_factory, rows, cut):
    mart = str(tmp_path_factory.mktemp("mart") / "m")
    df = spark.createDataFrame(rows, "k int, v int")
    cut = min(cut, len(rows))
    b1 = spark.createDataFrame(rows[:cut] or [(0, 0)], "k int, v int").limit(cut)
    b2 = spark.createDataFrame(rows[cut:] or [(0, 0)], "k int, v int").limit(
        len(rows) - cut
    )
    merge_aggregate(spark, mart, b1, keys=["k"], sums=["v"])
    out = merge_aggregate(spark, mart, b2, keys=["k"], sums=["v"])
    got = {r["k"]: (r["v"], r["n_rows"]) for r in out.collect()}
    full = df.groupBy("k").agg(F.sum("v").alias("v"), F.count(F.lit(1)).alias("n"))
    want = {r["k"]: (r["v"], r["n"]) for r in full.collect()}
    assert got == want


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=50),
    budget=st.integers(min_value=10, max_value=1000),
)
@settings(max_examples=30, deadline=None)
def test_shard_assignment_contiguous_and_exact(sizes, budget):
    """The pure shard rule (floor(start/budget)) the Spark operator
    implements: shards must start at 0, be contiguous, and respect the
    start-offset rule exactly — checked against a sequential fold."""
    starts, acc = [], 0
    for s in sizes:
        starts.append(acc)
        acc += s
    shards = [s // budget for s in starts]
    assert shards[0] == 0
    for a, b in zip(shards, shards[1:]):
        assert 0 <= b - a  # monotone
    # each shard's docs occupy a contiguous index range
    seen = {}
    for i, sh in enumerate(shards):
        seen.setdefault(sh, []).append(i)
    for idxs in seen.values():
        assert idxs == list(range(idxs[0], idxs[-1] + 1))
