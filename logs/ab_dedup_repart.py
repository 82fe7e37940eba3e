"""Interleaved A/B: shipped r6 dedup shapes vs doc_id-partitioned shingle
cache ("r6p") and collect_set-based single-exchange dedup ("r6s").

Idea under test (guide §2.4 — share one exchange): the shipped shape pays
TWO corpus-sized exchanges before/around the cache — distinct() shuffles by
(doc_id, shingle), then the signature/sketch groupBy(doc_id) reshuffles the
cached stream by doc_id. hashpartitioning(doc_id) satisfies clustering on
(doc_id, shingle), so repartition(doc_id) BEFORE the distinct lets the
distinct AND every per-doc aggregation (sigs / bottom-k sketch) reuse one
exchange. r6s gets the same single-exchange property via
groupBy(doc_id).agg(collect_set) (map-side partial dedup kept, per-doc set
buffered in the agg — the containment collect_list memory bound).

Same discipline as ab_dedup_shapes.py: one session, alternating trials,
count() action, clearCache+GC between trials, identical counts verified.
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel
from pyspark.sql import functions as F
from pyspark.sql import Window

from cca_spark.operators.dedup import (
    BOTTOM_K_SKETCH,
    CONTAINMENT_THRESHOLD,
    LSH_BUCKET_CAP,
    N_BANDS,
    N_MINHASHES,
    SKETCH_BUCKET_CAP,
    _pair_shingle_intersections,
    _pair_shingle_jaccard,
    corpus_shingles,
    dedup_corpus,
    lsh_verified_pairs,
    minhash_signatures,
    ngram_containment_over,
)
from cca_spark.session import get_spark


def _lsh_tail(shingles, threshold, bucket_cap):
    """Everything after the cached distinct shingle stream — identical to
    the shipped lsh_verified_pairs tail."""
    sigs = minhash_signatures(None, shingles=shingles, with_count=True).localCheckpoint(
        eager=True
    )
    rows_per_band = N_MINHASHES // N_BANDS
    band_cols = []
    for b in range(N_BANDS):
        parts = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat_ws("|", *parts)).alias("band_key"))
        )
    banded = sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("band")).select(
        "doc_id", "band.band_idx", "band.band_key"
    )
    w = Window.partitionBy("band_idx", "band_key")
    lhs = (
        banded.select(
            "doc_id",
            "band_idx",
            "band_key",
            F.count("*").over(w).alias("bucket_n"),
            F.min("doc_id").over(w).alias("bucket_hub"),
        )
        .filter(
            (F.col("bucket_n") <= bucket_cap) | (F.col("doc_id") == F.col("bucket_hub"))
        )
        .select("doc_id", "band_idx", "band_key")
    )
    a, b = lhs.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    jac = _pair_shingle_jaccard(shingles, cands, sizes=sigs.select("doc_id", "n_sh"))
    return jac.filter(F.col("jaccard") >= threshold)


def lsh_r6p(corpus, threshold=0.5, bucket_cap=LSH_BUCKET_CAP):
    shingles = (
        corpus_shingles(corpus)
        .repartition(F.col("doc_id"))
        .distinct()
        .persist(StorageLevel.DISK_ONLY)
    )
    return _lsh_tail(shingles, threshold, bucket_cap)


def lsh_r6s(corpus, threshold=0.5, bucket_cap=LSH_BUCKET_CAP):
    shingles = (
        corpus_shingles(corpus)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("shs"))
        .select("doc_id", F.explode("shs").alias("shingle"))
        .persist(StorageLevel.DISK_ONLY)
    )
    return _lsh_tail(shingles, threshold, bucket_cap)


def _cont_tail(shd, bucket_cap):
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
    lhs = (
        bk.select(
            "doc_id",
            "h",
            F.count("*").over(w_b).alias("bucket_n"),
            F.min("doc_id").over(w_b).alias("bucket_hub"),
        )
        .filter(
            (F.col("bucket_n") <= bucket_cap) | (F.col("doc_id") == F.col("bucket_hub"))
        )
        .select("doc_id", "h")
    )
    a, b = lhs.alias("a"), bk.alias("b")
    cands = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = bk.groupBy("doc_id").agg(F.min("n_sh").alias("n_sh"))
    scored = _pair_shingle_intersections(shd, cands, sizes=sizes).select(
        "doc_a",
        "doc_b",
        "n_inter",
        F.round(F.col("n_inter") / F.col("n_a"), 6).alias("containment_a_in_b"),
        F.round(F.col("n_inter") / F.col("n_b"), 6).alias("containment_b_in_a"),
    )
    return scored.filter(
        F.greatest("containment_a_in_b", "containment_b_in_a")
        >= CONTAINMENT_THRESHOLD
    )


def cont_r6p(corpus, bucket_cap=SKETCH_BUCKET_CAP):
    shd = (
        corpus_shingles(corpus)
        .repartition(F.col("doc_id"))
        .distinct()
        .persist(StorageLevel.DISK_ONLY)
    )
    return _cont_tail(shd, bucket_cap)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dedup_repart_ab")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))

    variants = {
        "lsh_r6": lambda: lsh_verified_pairs(dedup_corpus(spark, sf_dir)).count(),
        "lsh_r6p": lambda: lsh_r6p(dedup_corpus(spark, sf_dir)).count(),
        "lsh_r6s": lambda: lsh_r6s(dedup_corpus(spark, sf_dir)).count(),
        "cont_r6": lambda: ngram_containment_over(dedup_corpus(spark, sf_dir)).count(),
        "cont_r6p": lambda: cont_r6p(dedup_corpus(spark, sf_dir)).count(),
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
            n = fn()
            walls[name].append(round(time.time() - t0, 3))
            counts[name] = n
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
    print(
        json.dumps(
            {
                "walls": walls,
                "counts": counts,
                "mins": {k: min(v) for k, v in walls.items()},
                "medians": {k: sorted(v)[len(v) // 2] for k, v in walls.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
