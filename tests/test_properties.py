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
    max_examples=6,
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


@given(
    texts=st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=12), min_size=1, max_size=16
    ),
    cut=st.integers(min_value=0, max_value=16),
)
@_slow
def test_fingerprint_index_any_split_matches_one_shot(
    spark, tmp_path_factory, texts, cut
):
    """Folding ANY two-batch split of a corpus (ids monotone across the
    split) into the fingerprint index converges to the one-shot exact
    dedup: same keepers, same dup counts; survivors across both batches
    are exactly the keepers."""
    from azure_sales_etl_pipeline_spark.operators.maintenance import (
        merge_fingerprint_index,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    cut = min(cut, len(rows))
    idx_path = str(tmp_path_factory.mktemp("fpidx") / "i")
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    survivors = []
    for lo, hi in ((0, cut), (cut, len(rows))):
        batch = rows[lo:hi]
        if not batch:
            continue
        s, _ = merge_fingerprint_index(
            spark, idx_path, spark.createDataFrame(batch, "doc_id bigint, text string")
        )
        survivors += [r["doc_id"] for r in s.collect()]
    from pyspark.sql import functions as F2
    from azure_sales_etl_pipeline_spark.operators.writer import read_table

    got = {
        r["keeper_doc_id"]: r["dup_count"]
        for r in read_table(spark, idx_path).collect()
    }
    norm = F2.sha2(
        F2.lower(F2.regexp_replace(F2.trim(F2.col("text")), r"\s+", " ")), 256
    )
    want = {
        r["k"]: r["n"]
        for r in docs.select("doc_id", norm.alias("fp"))
        .groupBy("fp")
        .agg(F2.min("doc_id").alias("k"), F2.count(F2.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    assert sorted(survivors) == sorted(want)


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=900), min_size=1, max_size=60),
    context=st.integers(min_value=8, max_value=700),
)
@settings(max_examples=30, deadline=None)
def test_concat_chunk_packing_pure_rule(sizes, context):
    """The pure concat-and-chunk rule pack_sequences implements:
    segments tile every sequence exactly (full except the last), and
    each doc's segments cover it contiguously — checked against a
    sequential fold, independent of Spark."""
    segs = []
    g = 0
    for doc, n in enumerate(sizes):
        start, end = g, g + n
        g = end
        s = start
        while s < end:
            seq = s // context
            e = min(end, (seq + 1) * context)
            segs.append((seq, doc, s - start, s - seq * context, e - s))
            s = e
    total = sum(sizes)
    last_seq = (total - 1) // context
    by_seq = {}
    for seq, doc, d_off, s_off, n in segs:
        by_seq.setdefault(seq, []).append((s_off, n))
    for seq, ss in by_seq.items():
        ss.sort()
        pos = 0
        for s_off, n in ss:
            assert s_off == pos
            pos += n
        assert pos == (context if seq != last_seq else total - last_seq * context)
    by_doc = {}
    for seq, doc, d_off, s_off, n in segs:
        by_doc.setdefault(doc, []).append((d_off, n))
    for doc, ss in by_doc.items():
        ss.sort()
        pos = 0
        for d_off, n in ss:
            assert d_off == pos
            pos += n
        assert pos == sizes[doc]


@given(
    samples=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),  # sample key
            st.binary(min_size=0, max_size=64),          # payload incl. empty/NULs
            st.integers(min_value=0, max_value=3),       # shard
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
@_slow
def test_wds_roundtrip_any_bytes(spark, samples, tmp_path_factory):
    """write_wds_shards → read_wds_shards is the identity on (key,
    payload, shard) for ANY payload bytes — empty payloads, NUL bytes,
    non-UTF8 — and any shard assignment including singleton shards."""
    from azure_sales_etl_pipeline_spark.sources.formats import (
        read_wds_shards,
        write_wds_shards,
    )

    out = str(tmp_path_factory.mktemp("wds_prop"))
    df = spark.createDataFrame(
        samples, "doc_id bigint, payload binary, shard_id bigint"
    )
    write_wds_shards(df, out)
    back = read_wds_shards(spark, out).collect()
    got = {(r["sample_key"], bytes(r["payload"]), r["shard_id"]) for r in back}
    want = {(k, p, s) for k, p, s in samples}
    assert got == want


# ---------------------------------------------------------------------------
# r14 Arrow-kernel exactness: the vectorized assign/encode kernels must
# reproduce the interpreted integer semantics bit-for-bit — including
# first-index argmin ties — on ARBITRARY integer inputs, not just the
# benign testdata distributions.
# ---------------------------------------------------------------------------

_coord = st.integers(min_value=-(10**6), max_value=10**6)


def _ref_assign(vecs, cents):
    """Reference semantics: exact squared-L2, first index on ties —
    the ``array_position(array_min)`` contract the oracles replay."""
    out = []
    for v in vecs:
        dists = [sum((x - c) ** 2 for x, c in zip(v, cent)) for cent in cents]
        out.append(dists.index(min(dists)))
    return out


@_slow
@given(
    data=st.data(),
    dim=st.integers(min_value=1, max_value=6),
    k=st.integers(min_value=1, max_value=5),
    n=st.integers(min_value=1, max_value=25),
)
def test_coarse_assign_kernel_matches_reference(spark, data, dim, k, n):
    from azure_sales_etl_pipeline_spark.plans.similarity import (
        _coarse_assign_np,
    )

    vec = st.lists(_coord, min_size=dim, max_size=dim)
    # draw centroids and vectors from the same tiny grid so duplicate
    # distances (tie-breaks) actually occur
    cents = data.draw(st.lists(vec, min_size=k, max_size=k))
    vecs = data.draw(st.lists(st.sampled_from(cents + [data.draw(vec)]), min_size=n, max_size=n))
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id bigint, q array<bigint>"
    )
    got = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in _coarse_assign_np(
            df, cents, keep=["vec_id bigint"], emit=("cluster", "d2")
        ).collect()
    }
    want_cluster = _ref_assign(vecs, cents)
    for i, v in enumerate(vecs):
        wc = want_cluster[i]
        wd = sum((x - c) ** 2 for x, c in zip(v, cents[wc]))
        assert got[i] == (wc, wd), (i, v, cents)


@_slow
@given(
    data=st.data(),
    k=st.integers(min_value=1, max_value=4),
    n=st.integers(min_value=1, max_value=15),
)
def test_pq_encode_kernel_matches_reference(spark, data, k, n):
    """Per-subspace codes from the Arrow kernel == per-subspace
    reference argmin over the sliced subvectors (codes and the
    d2-stats variant agree with each other too)."""
    from azure_sales_etl_pipeline_spark.plans.similarity import (
        _PQ_M,
        _PQ_SUBDIM,
        _pq_encode_np,
        _pq_encode_stats_np,
    )

    dim = _PQ_M * _PQ_SUBDIM
    vec = st.lists(_coord, min_size=dim, max_size=dim)
    vecs = data.draw(st.lists(vec, min_size=n, max_size=n))
    subvec = st.lists(_coord, min_size=_PQ_SUBDIM, max_size=_PQ_SUBDIM)
    books = data.draw(
        st.lists(
            st.lists(subvec, min_size=k, max_size=k),
            min_size=_PQ_M,
            max_size=_PQ_M,
        )
    )
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id bigint, qfull array<bigint>"
    )
    got = {
        r["vec_id"]: list(r["codes"])
        for r in _pq_encode_np(df, books, keep=["vec_id bigint"]).collect()
    }
    stats = {
        (r["vec_id"], r["sub"]): (r["code"], r["d2"])
        for r in _pq_encode_stats_np(df, books).collect()
    }
    for i, v in enumerate(vecs):
        for s in range(_PQ_M):
            sub = v[s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM]
            dists = [
                sum((x - c) ** 2 for x, c in zip(sub, cent))
                for cent in books[s]
            ]
            want = dists.index(min(dists))
            assert got[i][s] == want
            assert stats[(i, s)] == (want, min(dists))
