"""Streaming + multimodal operator tests."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from azure_sales_etl_pipeline_spark.catalog import table_path
from azure_sales_etl_pipeline_spark.operators.writer import read_table
from azure_sales_etl_pipeline_spark.plans.multimodal import (
    media_decode_features,
    media_metadata,
)
from azure_sales_etl_pipeline_spark.streaming import (
    stream_tumbling_counts,
    streaming_ingest,
)
from tests.conftest import SF_DIR


def test_stream_tumbling_matches_batch(spark):
    """Streaming AvailableNow drain ≡ batch groupBy over the same file."""
    out = stream_tumbling_counts(spark, SF_DIR)
    total_streamed = out.agg(F.sum("n_events")).first()[0]
    n_batch = duckdb.sql(
        f"SELECT count(*) FROM '{table_path(SF_DIR, 'events')}'"
    ).fetchone()[0]
    assert total_streamed == n_batch
    # window bounds are 1h-aligned and end = start + 1h
    r = out.first()
    assert (r["window_end"] - r["window_start"]).total_seconds() == 3600
    assert r["window_start"].minute == 0 and r["window_start"].second == 0


def test_streaming_ingest_exactly_once(spark, tmp_path):
    """foreachBatch ingestion with checkpoint: a second run over the same
    files processes nothing new (file-source exactly-once)."""
    src = tmp_path / "landing"
    src.mkdir()
    (src / "a.csv").write_text("id,v\n1,x\n2,y\n")
    bronze = str(tmp_path / "bronze" / "t")
    ckpt = str(tmp_path / "ckpt")
    schema = "id INT, v STRING"

    streaming_ingest(spark, str(src), schema, bronze, ckpt)
    assert read_table(spark, bronze).count() == 2

    streaming_ingest(spark, str(src), schema, bronze, ckpt)  # rerun: no dupes
    assert read_table(spark, bronze).count() == 2

    (src / "b.csv").write_text("id,v\n3,z\n")
    streaming_ingest(spark, str(src), schema, bronze, ckpt)  # only new file
    assert read_table(spark, bronze).count() == 3


def test_media_metadata_digest_is_content_hash(spark):
    meta = media_metadata(spark, SF_DIR)
    row = meta.first()
    assert len(row["digest"]) == 64
    assert row["media_type"] in ("image", "audio", "video")
    assert row["n_bytes"] > 0


def test_media_decode_runs_in_batches(spark):
    """mapInPandas must receive multi-row Arrow batches (not row-at-a-
    time) and produce deterministic stub dimensions."""
    from azure_sales_etl_pipeline_spark.plans.multimodal import (
        media_decode_features_debug,
    )

    feats = media_decode_features_debug(spark, SF_DIR).collect()
    assert len(feats) == 500
    assert max(r["batch_rows"] for r in feats) > 1
    by_id = {r["doc_id"]: r for r in feats}
    again = {r["doc_id"]: r for r in media_decode_features_debug(spark, SF_DIR).collect()}
    assert all(
        (by_id[i]["width"], by_id[i]["height"]) == (again[i]["width"], again[i]["height"])
        for i in by_id
    )
    assert all(64 <= r["width"] < 256 for r in feats)
    # images are single-frame; audio/video are multi-frame-capable
    assert all(r["n_frames"] == 1 for r in feats if r["media_type"] == "image")


def test_media_frame_sample_fanout_and_resize(spark):
    """Explode-shaped mapInPandas: ≤4 sampled frames per payload, images
    exactly 1; aspect-preserving resize puts the short side at 224; the
    per-frame digest is deterministic across runs."""
    from azure_sales_etl_pipeline_spark.plans.multimodal import (
        media_decode_features,
        media_frame_sample,
    )

    frames = media_frame_sample(spark, SF_DIR).collect()
    feats = {r["doc_id"]: r for r in media_decode_features(spark, SF_DIR).collect()}
    per_doc: dict[int, list] = {}
    for r in frames:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert set(per_doc) == set(feats)
    for doc_id, rows in per_doc.items():
        f = feats[doc_id]
        assert len(rows) == min(f["n_frames"], 4)
        if f["media_type"] == "image":
            assert len(rows) == 1 and rows[0]["frame_idx"] == 0
        assert all(0 <= r["frame_idx"] < f["n_frames"] for r in rows)
        assert all(min(r["resized_w"], r["resized_h"]) == 224 for r in rows)
    digests = sorted(r["frame_digest"] for r in frames)
    again = sorted(r["frame_digest"] for r in media_frame_sample(spark, SF_DIR).collect())
    assert digests == again


def test_pil_decoder_plugs_into_seam(spark):
    """Gated proof the decode seam is swappable: with PIL installed, a
    REAL image decode rides the same Arrow-batched decode_features
    pipeline as the stub — no change to schema, batching, or plan.
    Auto-skips in codec-less environments (this sandbox)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    bufs = []
    for w, h in ((5, 3), (17, 9)):
        buf = io.BytesIO()
        PIL_Image.new("RGB", (w, h), color=(200, 10, 10)).save(buf, "PNG")
        bufs.append(buf.getvalue())
    payloads = spark.createDataFrame(
        [(0, "image", bytearray(bufs[0])), (1, "image", bytearray(bufs[1]))],
        "doc_id bigint, media_type string, payload binary",
    )
    from azure_sales_etl_pipeline_spark.plans.multimodal import (
        _pil_decode,
        decode_features,
    )

    feats = {
        r["doc_id"]: r
        for r in decode_features(payloads, decoder=_pil_decode).collect()
    }
    assert (feats[0]["width"], feats[0]["height"]) == (5, 3)
    assert (feats[1]["width"], feats[1]["height"]) == (17, 9)
    assert all(r["n_frames"] == 1 for r in feats.values())


def test_media_dedup_collapses_identical_payloads(spark, tmp_path):
    """Byte-identical payloads collapse to one keeper (lowest doc_id)
    with the copy count; a single flipped byte stays distinct — the
    no-normalization contract of binary dedup."""
    from azure_sales_etl_pipeline_spark.plans.multimodal import media_dedup

    rows = [
        (0, "same bytes here", "en", "src0", 15),
        (3, "same bytes here", "en", "src0", 15),   # doc_id%3==0 → same modality as 0
        (6, "same bytes herE", "en", "src0", 15),   # one byte differs
        (1, "other payload", "en", "src0", 13),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = {r["keeper_doc_id"]: r for r in media_dedup(spark, str(tmp_path)).collect()}
    assert out[0]["n_copies"] == 2 and out[0]["total_bytes"] == 30
    assert out[6]["n_copies"] == 1  # flipped byte is a different asset
    assert out[1]["n_copies"] == 1
    digests = [r["digest"] for r in out.values()]
    assert len(set(digests)) == 3


def test_late_events_are_counted_not_silent(spark, tmp_path):
    """r7 verdict item 8: plant events where batch 2 arrives entirely
    behind batch 1's committed watermark and assert the audit reports
    the exact raw-row drop count (Spark's numRowsDroppedByWatermark,
    1:1 with raw rows through the dedup stateful operator)."""
    import datetime as _dt

    import pandas as pd

    from azure_sales_etl_pipeline_spark.streaming import stream_late_data_audit

    t0 = _dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    # even event_ids (batch 1): ts t0 .. t0+5min -> watermark t0+5min-1h
    for i in range(0, 20, 2):
        rows.append((i, t0 + _dt.timedelta(minutes=i // 2)))
    # odd event_ids (batch 2): 3 beyond-late (ts < t0-55min), 7 in time
    for j, i in enumerate(range(1, 20, 2)):
        late = j < 3
        rows.append(
            (i, t0 - _dt.timedelta(hours=3) if late else t0 + _dt.timedelta(minutes=j))
        )
    pd.DataFrame(rows, columns=["event_id", "ts"]).to_parquet(
        tmp_path / "events.parquet"
    )
    out = stream_late_data_audit(spark, str(tmp_path)).first()
    assert out["input_rows"] == 20
    assert out["rows_dropped_late"] == 3


def test_drained_streams_publish_late_metrics_view(spark):
    """Every withWatermark stream drained through the memory sink must
    publish its <name>_late_metrics companion view (zero drops on the
    single-batch testdata drain, but the metric is THERE)."""
    from azure_sales_etl_pipeline_spark.streaming import (
        stream_late_metrics,
        stream_tumbling_counts,
    )

    stream_tumbling_counts(spark, SF_DIR)
    m = stream_late_metrics(spark, "stream_tumbling_counts").first()
    assert m["stream"] == "stream_tumbling_counts"
    assert m["input_rows"] > 0
    assert m["rows_dropped_late"] == 0  # one availableNow batch: nothing late


@pytest.mark.parametrize("provider", ["", "rocksdb"])
def test_state_store_provider_matrix(spark, provider, monkeypatch):
    """Streamed results must be provider-independent: the default
    on-heap HDFSBackedStateStoreProvider and RocksDB (off-heap/on-disk,
    the 100 TB keyed-state path - r8 verdict item 4) must produce
    identical windows, dedup survivors, join matches, and custom-state
    folds. Each query also re-checks against its batch/oracle truth
    via the module-level asserts baked into the cached expected dict."""
    from azure_sales_etl_pipeline_spark.streaming import (
        stream_dedup_events,
        stream_session_windows,
        stream_user_totals_custom_state,
    )
    from azure_sales_etl_pipeline_spark.streaming import (
        stream_click_purchase_join,
        stream_click_purchase_outer,
    )

    if provider:
        monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", provider)
    else:
        monkeypatch.delenv("SPARK_GRAFT_STATE_STORE", raising=False)

    got = {
        "session": sorted(map(tuple, stream_session_windows(spark, SF_DIR).collect())),
        "dedup": sorted(map(tuple, stream_dedup_events(spark, SF_DIR).collect())),
        "join": sorted(
            map(tuple, stream_click_purchase_join(spark, SF_DIR).collect())
        ),
        # left-outer adds the state-EVICTION path (null emission) to
        # the matrix; key=repr because null click fields don't compare
        # against datetimes.
        "outer": sorted(
            map(tuple, stream_click_purchase_outer(spark, SF_DIR).collect()),
            key=repr,
        ),
        "custom": sorted(
            map(tuple, stream_user_totals_custom_state(spark, SF_DIR).collect())
        ),
    }
    for k, rows in got.items():
        assert rows, f"{k} drained empty under provider={provider!r}"

    # the switch must have ENGAGED, not silently run the default: the
    # drain publishes which provider the state operators reported.
    from azure_sales_etl_pipeline_spark.streaming import stream_late_metrics

    engaged = stream_late_metrics(spark, "stream_session_windows").first()[
        "state_provider"
    ]
    assert engaged == ("rocksdb" if provider else "hdfs")

    # cross-provider equivalence: stash the first provider's results on
    # the module and compare when the second run arrives.
    cache = getattr(test_state_store_provider_matrix, "_results", {})
    if cache:
        (other_provider, other) = next(iter(cache.items()))
        assert got == other, (
            f"provider {provider!r} diverged from {other_provider!r}"
        )
    cache[provider] = got
    test_state_store_provider_matrix._results = cache


def test_stream_transition_matrix_multi_batch_boundary(spark, tmp_path):
    """The transition fold must survive a MULTI-batch feed: split the
    events log at its midpoint timestamp into two files, stream them
    one per micro-batch (maxFilesPerTrigger=1, mtime-ordered), and the
    delta sum must still equal the batch lag-window answer — this is
    the cross-batch boundary pair (state.last → batch.first) doing its
    job, the path a single AvailableNow batch never exercises."""
    import os
    import shutil

    from azure_sales_etl_pipeline_spark.catalog import load_table
    from azure_sales_etl_pipeline_spark.streaming import (
        _drain_transition_fold,
        _transition_counts,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    stream_in = tmp_path / "stream_in"
    stream_in.mkdir()
    for i, part in enumerate(
        [ev.where(F.col("ts") <= mid), ev.where(F.col("ts") > mid)]
    ):
        staged = tmp_path / f"staged_{i}"
        part.coalesce(1).write.parquet(str(staged))
        (src_file,) = [p for p in staged.iterdir() if p.suffix == ".parquet"]
        dst = stream_in / f"batch_{i}.parquet"
        shutil.copy(src_file, dst)
        os.utime(dst, (1_000_000 + i * 1000, 1_000_000 + i * 1000))

    schema = spark.read.parquet(str(stream_in)).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_in))
    )
    if dict(src.dtypes).get("ts") == "timestamp_ntz":
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    _drain_transition_fold(src, "test_transition_two_batch")
    sink = spark.table("test_transition_two_batch")
    got = {
        (r["prev_type"], r["next_type"]): (r["n_transitions"], r["permille"])
        for r in _transition_counts(sink).collect()
    }

    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    expected_pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    expected = {
        (r["prev_type"], r["next_type"]): r["n"] for r in expected_pairs.collect()
    }
    assert {k: v[0] for k, v in got.items()} == expected
    # the boundary path must actually have fired: at least one user has
    # events on both sides of the split, so the sink holds MORE delta
    # rows than a single-batch drain would (two emissions for some pair
    # keys) — detectable as sink rows > distinct pair keys.
    assert sink.count() > len(got)


def test_fold_landing_roundtrips_multiline_text(spark, tmp_path):
    """Free text with embedded newlines, quotes, and delimiters must
    survive the _fold_parity_batches CSV landing intact (r11 advice:
    the readStream side previously lacked multiLine, so a newline in
    documents.text tore the row apart and silently diverged from the
    batch oracle)."""
    from azure_sales_etl_pipeline_spark.streaming import (
        _fold_parity_batches,
        _stream_csv_source,
    )

    texts = [
        'line one\nline two',
        'a "quoted" phrase, with comma',
        'trailing newline\n',
        'plain',
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    seen: list[tuple] = []

    def run_monitor(glob, schema, state, ckpt):
        src = _stream_csv_source(spark, schema, glob)
        q = (
            src.writeStream.foreachBatch(
                lambda b, _id: seen.extend(
                    b.select("doc_id", "text").collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _fold_parity_batches(
        spark,
        df,
        "doc_id",
        ["doc_id", "text"],
        "doc_id bigint, text string",
        str(tmp_path / "fold"),
        run_monitor,
    )
    # availableNow drains re-read files each invocation; dedupe by doc_id
    got = {r["doc_id"]: r["text"] for r in seen}
    assert got == {i: t for i, t in enumerate(texts)}


def test_tws_and_legacy_state_apis_agree(spark):
    """transformWithStateInPandas (Spark 4.x StatefulProcessor) and
    applyInPandasWithState implement the same per-user totals and must
    produce identical results over the same source — the API-migration
    guarantee a production stream relies on when moving off the legacy
    API. Skips where protobuf (the StatefulProcessor wire protocol's
    dependency) is absent — the documented gate, same treatment as the
    delta-spark seam."""
    pytest.importorskip("google.protobuf")
    from azure_sales_etl_pipeline_spark.streaming import (
        stream_user_totals_custom_state,
        stream_user_totals_tws,
    )

    legacy = {
        r["user_id"]: (r["n_events"], r["total_value"], r["last_ts"])
        for r in stream_user_totals_custom_state(spark, SF_DIR).collect()
    }
    modern = {
        r["user_id"]: (r["n_events"], r["total_value"], r["last_ts"])
        for r in stream_user_totals_tws(spark, SF_DIR).collect()
    }
    assert legacy == modern


def test_media_text_alignment_drops_planted_mismatches(spark, tmp_path):
    """CLIP-style alignment filter: matched (media, caption) pairs score
    exactly cos=1 and are kept; hash-planted mismatched pairs (md5
    leading digit % 4 == 0 → the pair carries its NEIGHBOR's caption)
    with disjoint-vocabulary neighbors score below the cut and are
    dropped — and the per-source report separates the clean source
    from the contaminated one. doc_ids 0-2 are plant-TRUE and 3-5
    plant-FALSE under the md5 rule (precomputed, deterministic)."""
    from azure_sales_etl_pipeline_spark.plans.multimodal import (
        media_text_alignment,
    )

    rows = [
        (0, "alpha bravo charlie delta echo", "en", "bad", 30),
        (1, "zulu yankee xray whiskey victor", "en", "bad", 31),
        (2, "one two three four five", "en", "bad", 23),
        (3, "red green blue cyan magenta", "en", "good", 27),
        (4, "dog cat bird fish lizard", "en", "good", 24),
        (5, "north south east west center", "en", "good", 28),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = {r["source"]: r for r in media_text_alignment(spark, str(tmp_path)).collect()}
    # 'bad' docs all carry a disjoint-vocab neighbor caption → dropped
    assert out["bad"]["n_pairs"] == 3
    assert out["bad"]["n_kept"] == 0
    assert out["bad"]["kept_permille"] == 0
    # 'good' docs keep their own caption → cos = 1 exactly, all kept
    assert out["good"]["n_pairs"] == 3
    assert out["good"]["n_kept"] == 3
    assert out["good"]["kept_permille"] == 1000
    assert out["good"]["mean_align_ppm"] == 1_000_000


def test_media_text_alignment_survives_int64_gate_overflow(spark, tmp_path):
    """r14 advice #3: a token-repetitive doc (every token identical →
    all mass in one hashed dim) drives dot = T² past the old BIGINT
    gate's wrap point (1e6·dot² > 2⁶³ at T ≈ 1744). The DECIMAL(38,0)
    gate must still score the matched pair cos = 1 (ppm = 1e6) and
    agree with the DuckDB HUGEINT replay value-for-value."""
    import duckdb

    from azure_sales_etl_pipeline_spark.plans.multimodal import (
        _ALIGN_SQL,
        media_text_alignment,
    )

    # doc_ids 3-5 are plant-FALSE under the md5 mismatch rule (see the
    # test above): each keeps its own caption, cos = 1 exactly.
    heavy = " ".join(["tok"] * 2500)  # T=2500 > 1744: old gate wrapped
    rows = [
        (3, heavy, "en", "heavy", len(heavy)),
        (4, "dog cat bird fish lizard", "en", "light", 24),
        (5, "north south east west center", "en", "light", 28),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = {r["source"]: r for r in media_text_alignment(spark, str(tmp_path)).collect()}
    assert got["heavy"]["n_kept"] == 1
    assert got["heavy"]["mean_align_ppm"] == 1_000_000

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path / 'documents.parquet'}/*.parquet'"
    )
    oracle = {r[0]: r for r in con.execute(_ALIGN_SQL).fetchall()}
    for src, row in got.items():
        assert tuple(row)[1:] == oracle[src][1:], (src, tuple(row), oracle[src])


def test_media_alignment_two_batch_scores_cross_batch_caption(spark, tmp_path):
    """The incremental fold's pending frontier: doc 2 is plant-TRUE
    (md5 rule), so its pair's caption is doc 3 — but the doc_id median
    of {1,2,3,100} is 2.5, putting doc 2 in batch 1 and its caption in
    batch 2 (the wrong-alt-text pair arriving across crawls). The pair
    must wait as PENDING, score when batch 2 lands, and the two-batch
    report must equal the one-shot report row-for-row."""
    from azure_sales_etl_pipeline_spark.plans.multimodal import (
        media_alignment_two_batch,
        media_text_alignment,
    )

    rows = [
        (1, "alpha bravo charlie delta", "en", "b1", 24),     # plant-TRUE, cap=2 (in-batch)
        (2, "one two three four five", "en", "xb", 23),       # plant-TRUE, cap=3 (CROSS-batch)
        (3, "red green blue cyan magenta", "en", "b2", 27),   # plant-FALSE, cap=self
        (100, "dog cat bird fish lizard", "en", "tail", 24),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    one_shot = sorted(tuple(r) for r in media_text_alignment(spark, str(tmp_path)).collect())
    folded = sorted(tuple(r) for r in media_alignment_two_batch(spark, str(tmp_path)).collect())
    assert folded == one_shot
    rep = {r[0]: r for r in folded}
    # the cross-batch pair WAS scored (not lost in pending): one pair,
    # dropped (disjoint vocab vs its planted neighbor caption)
    assert rep["xb"][1] == 1 and rep["xb"][2] == 0
    # doc 3 keeps its own caption: cos = 1, kept
    assert rep["b2"][1] == 1 and rep["b2"][2] == 1
