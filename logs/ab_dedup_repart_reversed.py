"""Position-bias control for ab_dedup_repart.py: the session-3 SHJ
experiment exposed a back-to-back ordering artifact (the second trial of
a pair wins; logs/ab_shj_reversed_out.json), so this rerun puts the NEW
(repartitioned) shapes FIRST in each round and the OLD (r6 session-2)
shapes LAST — the position that benefits. If the repartition still wins
from the penalized slot, the win is real. Shapes are explicit here
because the shipped operators now contain the repartition."""
import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/logs")
from ab_dedup_repart import _cont_tail, _lsh_tail

from cca_spark.operators.dedup import (
    CONTAINMENT_THRESHOLD,
    LSH_BUCKET_CAP,
    SKETCH_BUCKET_CAP,
    corpus_shingles,
    dedup_corpus,
)
from cca_spark.session import get_spark


def lsh_old(corpus):
    sh = corpus_shingles(corpus).distinct().persist(StorageLevel.DISK_ONLY)
    return _lsh_tail(sh, 0.5, LSH_BUCKET_CAP)


def lsh_new(corpus):
    sh = (
        corpus_shingles(corpus)
        .repartition(F.col("doc_id"))
        .distinct()
        .persist(StorageLevel.DISK_ONLY)
    )
    return _lsh_tail(sh, 0.5, LSH_BUCKET_CAP)


def cont_old(corpus):
    sh = corpus_shingles(corpus).distinct().persist(StorageLevel.DISK_ONLY)
    return _cont_tail(sh, SKETCH_BUCKET_CAP)


def cont_new(corpus):
    sh = (
        corpus_shingles(corpus)
        .repartition(F.col("doc_id"))
        .distinct()
        .persist(StorageLevel.DISK_ONLY)
    )
    return _cont_tail(sh, SKETCH_BUCKET_CAP)


def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dedup_repart_ab_rev")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    # NEW first (penalized position), OLD last (favored position)
    variants = {
        "lsh_new": lambda: lsh_new(dedup_corpus(spark, sf)).count(),
        "lsh_old": lambda: lsh_old(dedup_corpus(spark, sf)).count(),
        "cont_new": lambda: cont_new(dedup_corpus(spark, sf)).count(),
        "cont_old": lambda: cont_old(dedup_corpus(spark, sf)).count(),
    }

    def clear():
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()

    for fn in variants.values():
        fn()
        clear()
    walls = {k: [] for k in variants}
    counts = {}
    for r in range(rounds):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"{name} round {r}")
            t0 = time.time()
            n = fn()
            walls[name].append(round(time.time() - t0, 3))
            counts[name] = n
            clear()
    print(
        json.dumps(
            {
                "walls": walls,
                "counts": counts,
                "medians": {k: sorted(v)[len(v) // 2] for k, v in walls.items()},
                "mins": {k: min(v) for k, v in walls.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
