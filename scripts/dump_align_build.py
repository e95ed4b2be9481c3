"""Dump the BUILD-TIME explain of media_alignment_two_batch's fold-2
scoring frame — the committed query plan is the post-checkpoint report,
so this is where the frontier left-semi join is visible (r15 verdict
item 4). Reconstructs the fold exactly as the query does, stopping
before the localCheckpoint that hides the scoring plan."""
import sys, tempfile, shutil
sys.path.insert(0, "/root/repo")
from azure_sales_etl_pipeline_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app_name="dump_align_build")
sf_dir = "/root/testdata/sf0.001"
from azure_sales_etl_pipeline_spark.catalog import load_table
from azure_sales_etl_pipeline_spark.operators.maintenance import merge_aggregate
from azure_sales_etl_pipeline_spark.plans.multimodal import (
    _align_pairs, _align_score, _align_sign_rows, _payloads)

docs = load_table(spark, sf_dir, "documents")
mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
tmp = tempfile.mkdtemp(prefix="align_dump_")
try:
    scored = None; pending = None; out = None
    for batch_no, pred in enumerate((F.col("doc_id") <= mid, F.col("doc_id") > mid), 1):
        state = merge_aggregate(spark, f"{tmp}/feats",
            _align_sign_rows(_payloads(spark, sf_dir).where(pred)).withColumnRenamed("sign","val"),
            keys=["doc_id","dim"], sums=["val"], count_col="c")
        feats = state.select("doc_id","dim",F.col("val").cast("bigint").alias("val"))
        batch_pairs = _align_pairs(docs.where(pred))
        candidates = (batch_pairs if pending is None else batch_pairs.unionByName(pending)).localCheckpoint()
        frontier_ids = (candidates.select(F.col("pair_id").alias("doc_id"))
            .unionByName(candidates.select(F.col("cap_id").alias("doc_id"))).distinct())
        frontier_feats = feats.join(frontier_ids, "doc_id", "left_semi")
        per_plan = _align_score(candidates, frontier_feats)   # BEFORE localCheckpoint
        if batch_no == 2:
            out = per_plan._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        per = per_plan.localCheckpoint()
        scored = per if scored is None else scored.unionByName(per)
        pending = candidates.join(per.select("pair_id"), "pair_id", "left_anti").localCheckpoint()
    open("/root/repo/plans/r16/media_alignment_two_batch_build_scoring.txt","w").write(
        "== media_alignment_two_batch: BUILD-TIME explain of the fold-2 scoring frame\n"
        "== (_align_score(candidates, frontier_feats) before its localCheckpoint).\n"
        "== The committed query plan is the post-checkpoint report; THIS plan shows\n"
        "== the mart restricted to the scoring frontier (LeftSemi on frontier ids)\n"
        "== below the norms aggregate — multimodal.py frontier semi-join (r15 sec.8).\n\n" + out)
    print("wrote; LeftSemi occurrences:", out.count("LeftSemi"))
finally:
    shutil.rmtree(tmp, ignore_errors=True)
