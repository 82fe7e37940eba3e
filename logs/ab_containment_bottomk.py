"""Containment variants: r5 (distinct+localCheckpoint), r6x (window bk),
r6y (agg bottom-k via sort_array(collect_list))."""
import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/tmp")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from cca_spark.operators.dedup import (
    BOTTOM_K_SKETCH,
    CONTAINMENT_THRESHOLD,
    SKETCH_BUCKET_CAP,
    corpus_shingles,
    dedup_corpus,
)
from cca_spark.session import get_spark
from dedup_ab import containment_r5, cont_r6x


def cont_r6y(corpus, bucket_cap=SKETCH_BUCKET_CAP):
    from pyspark.sql import Window

    shd = corpus_shingles(corpus).distinct().persist(StorageLevel.DISK_ONLY)
    hashes = shd.select("doc_id", F.md5("shingle").alias("h"))
    bk = (
        hashes.groupBy("doc_id")
        .agg(
            F.slice(F.sort_array(F.collect_list("h")), 1, BOTTOM_K_SKETCH).alias("hs"),
            F.count("*").alias("n_sh"),
        )
        .select("doc_id", F.explode("hs").alias("h"), "n_sh")
        .localCheckpoint(eager=True)
    )
    w_b = Window.partitionBy("h")
    aug = bk.select(
        "doc_id", "h",
        F.count("*").over(w_b).alias("bucket_n"),
        F.min("doc_id").over(w_b).alias("bucket_hub"),
    )
    lhs = aug.filter(
        (F.col("bucket_n") <= bucket_cap) | (F.col("doc_id") == F.col("bucket_hub"))
    ).select("doc_id", "h")
    a, b = lhs.alias("a"), bk.alias("b")
    cands = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = shd.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = shd.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cands.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = bk.groupBy("doc_id").agg(F.min("n_sh").alias("n_sh"))
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    scored = inter.join(na, "doc_a").join(nb, "doc_b").select(
        "doc_a", "doc_b", "n_inter",
        F.round(F.col("n_inter") / F.col("n_a"), 6).alias("containment_a_in_b"),
        F.round(F.col("n_inter") / F.col("n_b"), 6).alias("containment_b_in_a"),
    )
    return scored.filter(
        F.greatest("containment_a_in_b", "containment_b_in_a") >= CONTAINMENT_THRESHOLD
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cont_ab2")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    variants = {
        "cont_r5": lambda: containment_r5(dedup_corpus(spark, sf_dir)).count(),
        "cont_r6x": lambda: cont_r6x(dedup_corpus(spark, sf_dir)).count(),
        "cont_r6y": lambda: cont_r6y(dedup_corpus(spark, sf_dir)).count(),
    }
    for name, fn in variants.items():
        fn()
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
    walls = {k: [] for k in variants}
    counts = {}
    for r in range(rounds):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"{name} round {r}")
            t0 = time.time()
            counts[name] = fn()
            walls[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
    print(json.dumps({"walls": walls, "counts": counts,
                      "mins": {k: min(v) for k, v in walls.items()},
                      "medians": {k: sorted(v)[len(v)//2] for k, v in walls.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
