"""Interleaved A/B of the production-day near-dup stage on the dense
192-replica corpus: session-1 r6 LSH shape (banded checkpoint + stats
join + sizes re-scan) vs HEAD (sigs checkpoint + window stats + folded
sizes). Same survivors input, count() of verified pairs AND full CC
labels, clearCache+GC between trials."""
import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from cca_spark import chain
from cca_spark.bench_corpus import ensure_bench_corpus, read_bench_corpus
from cca_spark.operators.dedup import (
    LSH_BUCKET_CAP,
    N_BANDS,
    N_MINHASHES,
    _pair_shingle_jaccard,
    connected_min_labels,
    corpus_shingles,
    lsh_verified_pairs,
    minhash_signatures,
)
from cca_spark.session import get_spark


def lsh_s1(corpus, threshold=0.5, bucket_cap=LSH_BUCKET_CAP):
    """Session-1 r6 shape (HEAD~1): distinct + DISK_ONLY, banded
    localCheckpoint, stats groupBy + join-back, sizes re-scan in verify."""
    shingles = corpus_shingles(corpus).distinct().persist(StorageLevel.DISK_ONLY)
    sigs = minhash_signatures(corpus, shingles=shingles)
    rows_per_band = N_MINHASHES // N_BANDS
    band_cols = []
    for b in range(N_BANDS):
        parts = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat_ws("|", *parts)).alias("band_key"))
        )
    banded = (
        sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("band"))
        .select("doc_id", "band.band_idx", "band.band_key")
        .localCheckpoint(eager=True)
    )
    stats = banded.groupBy("band_idx", "band_key").agg(
        F.count("*").alias("bucket_n"), F.min("doc_id").alias("bucket_hub")
    )
    lhs = (
        banded.join(stats, ["band_idx", "band_key"])
        .filter((F.col("bucket_n") <= bucket_cap) | (F.col("doc_id") == F.col("bucket_hub")))
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
    jac = _pair_shingle_jaccard(shingles, cands)
    return jac.filter(F.col("jaccard") >= threshold)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("AB_REPLICAS", "192"))
    rounds = int(os.environ.get("AB_ROUNDS", "2"))
    spark = get_spark(app_name="neardup_ab")
    path = ensure_bench_corpus(spark, sf_dir, replicas)
    corpus = read_bench_corpus(spark, path)

    docs = chain.turns_as_docs(corpus)
    groups = chain.exact_dedup_groups(docs).localCheckpoint(eager=True)
    survivors = chain.exact_dedup_survivors(groups, docs).localCheckpoint(eager=True)
    print("survivors:", survivors.count(), flush=True)

    def full_head():
        pairs = lsh_verified_pairs(survivors)
        labels = connected_min_labels(pairs, max_iters=30)
        return labels.count()

    def full_s1():
        pairs = lsh_s1(survivors)
        labels = connected_min_labels(pairs, max_iters=30)
        return labels.count()

    def pairs_head():
        return lsh_verified_pairs(survivors).count()

    def pairs_s1():
        return lsh_s1(survivors).count()

    variants = {
        "pairs_s1": pairs_s1,
        "pairs_head": pairs_head,
        "full_s1": full_s1,
        "full_head": full_head,
    }
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
            print(json.dumps({name: walls[name][-1], "n": counts[name]}), flush=True)
    print(json.dumps({"walls": walls, "counts": counts,
                      "mins": {k: min(v) for k, v in walls.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
