from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from azure_sales_etl_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

# Streaming state partitions: every stateful operator materializes one
# state-store instance PER PARTITION per provider, and store init (not
# data — sf0.001 rows are KBs) dominates the suite's ~20 AvailableNow
# drains. 8 -> 2 measured the provider-matrix test 82 s -> 34 s with
# identical results (keyed state is partition-count invariant; every
# drain collects sorted). Respect an explicit override.
os.environ.setdefault("SPARK_GRAFT_STREAM_PARTITIONS", "2")


@pytest.fixture(autouse=True)
def _drop_tmp_dir_memos():
    """Evict shared-memo cache entries keyed to NON-standard sf_dirs
    after each test (r15 ADVICE #2): a test that builds a memo over its
    own tmp dir would otherwise pin that localCheckpoint's blocks in
    the block manager for the whole session. Entries for the shared
    SF_DIR fixtures stay warm — they are reused across tests and the
    session teardown releases them."""
    yield
    from azure_sales_etl_pipeline_spark.plans import dedup, similarity, textops

    for cache in (
        dedup._JACCARD_PAIRS_CACHE,
        dedup._SIMHASH_SIG_CACHE,
        dedup._MINHASH_STAGE_CACHE,
        dedup._SHINGLE3_CACHE,
        similarity._NORM_CORPUS_CACHE,
        similarity._SPARSE_TERMS_CACHE,
        textops._WINNOW_FP_CACHE,
        textops._BIGRAM_SCORES_CACHE,
        textops._DSIR_FEATS_CACHE,
        textops._DSIR_WEIGHTS_CACHE,
        textops._BM25_TERMS_CACHE,
    ):
        for key in [k for k in cache if not str(k[-1]).startswith("/root/testdata/")]:
            for part in cache.pop(key):
                # entries are (frame(s)..., jrdd handle(s)...); the JVM
                # RDD handles are what actually free checkpoint blocks
                if hasattr(part, "unpersist") and not hasattr(part, "columns"):
                    try:
                        part.unpersist(False)
                    except Exception:  # noqa: BLE001 — session may be gone
                        pass


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[16]", extra_conf={
        "spark.sql.shuffle.partitions": "4",
        # sf0.001 fixtures: shuffles move KBs, so task-launch count and
        # compression CPU dominate — 4 partitions + uncompressed shuffle
        # measured faster than 8/compressed across the whole suite
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
        # tiny createDataFrame/parallelize jobs otherwise launch 16
        # tasks each on local[16] — task-launch overhead dominates the
        # suite's thousands of micro-jobs
        "spark.default.parallelism": "4",
    })
    yield s
    s.stop()
