"""ANN recall on the planted-cluster corpus (VERDICT r11 #6).

Runs ann_recall_clustered + ann_recall_eval side by side, then the
IVF-PQ (nprobe x shortlist) sweep over the SAME clustered corpus via
the generalized _ivfpq_adc_scored — both recall regimes on record.
Results: SCALING.md r12 table.
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F
from pyspark.sql import Window as W
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions","32")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from slowlog2clickhouse_spark.registry import all_ops
ops = all_ops()
sf = "/root/testdata/sf0.01"
print("== ann_recall_clustered ==")
for r in ops["ann_recall_clustered"].fn(spark, sf).collect():
    print(r["method"], r["hits"], r["truth_n"], r["recall"])
print("== ann_recall_eval (uniform, same SF) ==")
for r in ops["ann_recall_eval"].fn(spark, sf).collect():
    print(r["method"], r["hits"], r["truth_n"], r["recall"])

# IVF-PQ sweep on the clustered corpus via the generalized internals
from slowlog2clickhouse_spark.operators.vector import (
    _ivfpq_adc_scored, _clustered_embeddings, cosine, _SWEEP_NPROBES)
with_e, scored = _ivfpq_adc_scored(spark, sf, max(_SWEEP_NPROBES), e=_clustered_embeddings(spark))
scored = scored.localCheckpoint(eager=False)
probes = with_e.where(F.col("vec_id") < 20).select(F.col("vec_id").alias("probe_id"), F.col("ed").alias("pe"))
cands = with_e.where(F.col("vec_id") >= 20).select(F.col("vec_id").alias("cand_id"), F.col("ed").alias("cve"))
wt = W.partitionBy("probe_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id").asc())
truth = (cands.join(F.broadcast(probes))
         .select("probe_id","cand_id",F.round(cosine(F.col("pe"),F.col("cve")),6).alias("cos_sim"))
         .withColumn("rn",F.row_number().over(wt)).where("rn<=3").select("probe_id","cand_id").localCheckpoint())
tn = truth.count()
print("== IVF-PQ sweep on clustered corpus (truth_n=%d) ==" % tn)
for nprobe in _SWEEP_NPROBES:
    arm = scored.where(F.col("rnc") <= nprobe)
    adc_rows = arm.count()  # depends only on nprobe — hoisted out of the shortlist loop
    for shortlist in (16, 32, 64):
        wa = W.partitionBy("probe_id").orderBy(F.col("adc_dist").asc(), F.col("cand_id").asc())
        short = arm.withColumn("r", F.row_number().over(wa)).where(F.col("r") <= shortlist)
        rer = (short.join(cands, "cand_id").join(F.broadcast(probes), "probe_id")
               .select("probe_id","cand_id",F.round(cosine(F.col("pe"),F.col("cve")),6).alias("cs")))
        wr = W.partitionBy("probe_id").orderBy(F.col("cs").desc(), F.col("cand_id").asc())
        top = rer.withColumn("rr", F.row_number().over(wr)).where("rr<=3")
        hits = top.join(truth, ["probe_id","cand_id"]).count()
        print(f"nprobe={nprobe} shortlist={shortlist} adc_rows={adc_rows} recall={hits/tn:.4f}")
spark.stop()
