import gc, json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from cca_spark.session import get_spark
from cca_spark.plans.pipeline import routed_facts
from cca_spark.transcripts import load_transcripts

def range_q(spark, sf_dir, with_value):
    facts = (
        routed_facts(spark, load_transcripts(spark, sf_dir), with_value=with_value)
        .select("entity_id","conv_id","turn_idx","sink","rule_id","span_start","span_end")
        .localCheckpoint(eager=True)
    )
    spans = facts.filter(F.col("sink") == "code_span").select(
        F.col("conv_id").alias("s_conv_id"), F.col("turn_idx").alias("s_turn_idx"),
        F.col("span_start").alias("s_start"), F.col("span_end").alias("s_end"))
    inner = facts.filter(F.col("sink") != "code_span")
    return inner.join(spans,
        (F.col("conv_id")==F.col("s_conv_id")) & (F.col("turn_idx")==F.col("s_turn_idx"))
        & (F.col("span_start")>=F.col("s_start")) & (F.col("span_end")<=F.col("s_end")),
        "left_anti").select("entity_id","sink","rule_id","span_start","span_end")

spark = get_spark(app_name="range_nv_ab")
sf = "/root/testdata/sf0.1"
variants = {"with_value": lambda: range_q(spark, sf, True).count(),
            "no_value": lambda: range_q(spark, sf, False).count()}
for n, fn in variants.items():
    fn(); spark.catalog.clearCache(); gc.collect(); spark._jvm.System.gc()
walls = {k: [] for k in variants}; counts = {}
for r in range(5):
    for n, fn in variants.items():
        spark.sparkContext.setJobDescription(f"{n} round {r}")
        t0=time.time(); c=fn(); walls[n].append(round(time.time()-t0,3)); counts[n]=c
        spark.catalog.clearCache(); gc.collect(); spark._jvm.System.gc()
print(json.dumps({"walls": walls, "counts": counts,
                  "mins": {k: min(v) for k,v in walls.items()},
                  "medians": {k: sorted(v)[len(v)//2] for k,v in walls.items()}}))
spark.stop()
