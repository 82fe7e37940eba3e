"""Position-controlled A/B: shipped containment (bk_agg pre-explode
checkpoint, NEW) in the penalized first slot vs the k-rows/doc exploded
checkpoint (OLD, session-2 shape) in the favored slot."""
import gc, json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark import StorageLevel
from pyspark.sql import functions as F, Window
from cca_spark.operators.dedup import (
    BOTTOM_K_SKETCH, CONTAINMENT_THRESHOLD, SKETCH_BUCKET_CAP,
    _pair_shingle_intersections, corpus_shingles, dedup_corpus,
    ngram_containment_over,
)
from cca_spark.session import get_spark

def cont_old(corpus, bucket_cap=SKETCH_BUCKET_CAP):
    shd = (corpus_shingles(corpus).repartition(F.col("doc_id")).distinct()
           .persist(StorageLevel.DISK_ONLY))
    hashes = shd.select("doc_id", F.md5("shingle").alias("h"))
    bk = (hashes.groupBy("doc_id")
          .agg(F.slice(F.sort_array(F.collect_list("h")), 1, BOTTOM_K_SKETCH).alias("hs"),
               F.count("*").alias("n_sh"))
          .select("doc_id", F.explode("hs").alias("h"), "n_sh")
          .localCheckpoint(eager=True))
    w_b = Window.partitionBy("h")
    lhs = (bk.select("doc_id","h",
                     F.count("*").over(w_b).alias("bucket_n"),
                     F.min("doc_id").over(w_b).alias("bucket_hub"))
           .filter((F.col("bucket_n") <= bucket_cap) | (F.col("doc_id")==F.col("bucket_hub")))
           .select("doc_id","h"))
    a,b = lhs.alias("a"), bk.alias("b")
    cands = (a.join(b,(F.col("a.h")==F.col("b.h")) & (F.col("a.doc_id")<F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")).distinct())
    sizes = bk.groupBy("doc_id").agg(F.min("n_sh").alias("n_sh"))
    scored = _pair_shingle_intersections(shd, cands, sizes=sizes).select(
        "doc_a","doc_b","n_inter",
        F.round(F.col("n_inter")/F.col("n_a"),6).alias("containment_a_in_b"),
        F.round(F.col("n_inter")/F.col("n_b"),6).alias("containment_b_in_a"))
    return scored.filter(F.greatest("containment_a_in_b","containment_b_in_a") >= CONTAINMENT_THRESHOLD)

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="cont_bkagg_ab")
variants = {  # NEW penalized first
    "cont_new": lambda: ngram_containment_over(dedup_corpus(spark, sf)).count(),
    "cont_old": lambda: cont_old(dedup_corpus(spark, sf)).count(),
}
def clear():
    spark.catalog.clearCache(); gc.collect(); spark._jvm.System.gc()
for fn in variants.values(): fn(); clear()
walls = {k: [] for k in variants}; counts = {}
for r in range(5):
    for n, fn in variants.items():
        t0=time.time(); c=fn(); walls[n].append(round(time.time()-t0,3)); counts[n]=c; clear()
print(json.dumps({"walls": walls, "counts": counts,
                  "medians": {k: sorted(v)[len(v)//2] for k,v in walls.items()},
                  "mins": {k: min(v) for k,v in walls.items()}}))
spark.stop()
