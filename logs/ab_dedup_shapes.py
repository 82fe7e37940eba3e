"""Interleaved A/B of dedup shapes: r5 (eager localCheckpoint, per-consumer
distinct) vs r6 (distinct + DISK_ONLY persist) vs r6m (distinct +
MEMORY_AND_DISK persist). One session, alternating trials, count() action,
clearCache+GC between trials — same discipline as bench.py."""
import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from cca_spark.operators.dedup import (
    LSH_BUCKET_CAP,
    N_BANDS,
    N_MINHASHES,
    BOTTOM_K_SKETCH,
    CONTAINMENT_THRESHOLD,
    SKETCH_BUCKET_CAP,
    _pair_shingle_intersections,
    _pair_shingle_jaccard,
    corpus_shingles,
    dedup_corpus,
    minhash_signatures,
    lsh_verified_pairs,
    ngram_containment_over,
)
from cca_spark.session import get_spark


def lsh_r5(corpus, threshold=0.5, bucket_cap=LSH_BUCKET_CAP):
    shingles = corpus_shingles(corpus).localCheckpoint(eager=True)
    sigs = minhash_signatures(corpus, shingles=shingles)
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
    sh = shingles.distinct()
    jac = _pair_shingle_jaccard(sh, cands)
    return jac.filter(F.col("jaccard") >= threshold)


def lsh_r6m(corpus, threshold=0.5, bucket_cap=LSH_BUCKET_CAP):
    """r6 shape but MEMORY_AND_DISK instead of DISK_ONLY."""
    shingles = corpus_shingles(corpus).distinct().persist(StorageLevel.MEMORY_AND_DISK)
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


def containment_r5(corpus, bucket_cap=SKETCH_BUCKET_CAP):
    from pyspark.sql import Window

    shd = corpus_shingles(corpus).distinct().localCheckpoint(eager=True)
    hashes = shd.select("doc_id", F.md5("shingle").alias("h"))
    rk = F.row_number().over(Window.partitionBy("doc_id").orderBy("h"))
    bk = hashes.withColumn("rk", rk).filter(F.col("rk") <= BOTTOM_K_SKETCH).select("doc_id", "h")
    stats = bk.groupBy("h").agg(F.count("*").alias("bucket_n"), F.min("doc_id").alias("bucket_hub"))
    lhs = (
        bk.join(stats, "h")
        .filter((F.col("bucket_n") <= bucket_cap) | (F.col("doc_id") == F.col("bucket_hub")))
        .select("doc_id", "h")
    )
    a, b = lhs.alias("a"), bk.alias("b")
    cands = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    scored = _pair_shingle_intersections(shd, cands).select(
        "doc_a",
        "doc_b",
        "n_inter",
        F.round(F.col("n_inter") / F.col("n_a"), 6).alias("containment_a_in_b"),
        F.round(F.col("n_inter") / F.col("n_b"), 6).alias("containment_b_in_a"),
    )
    return scored.filter(
        F.greatest("containment_a_in_b", "containment_b_in_a") >= CONTAINMENT_THRESHOLD
    )




def lsh_r6x(corpus, threshold=0.5, bucket_cap=LSH_BUCKET_CAP):
    """r6 discipline, restructured: sizes folded into the signature agg,
    bucket stats via window (no stats join), checkpoint sigs not banded."""
    from pyspark.sql import Window

    shingles = corpus_shingles(corpus).distinct().persist(StorageLevel.DISK_ONLY)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(N_MINHASHES)
    ] + [F.count("*").alias("n_sh")]
    sigs = shingles.groupBy("doc_id").agg(*aggs).localCheckpoint(eager=True)
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
    aug = banded.select(
        "doc_id", "band_idx", "band_key",
        F.count("*").over(w).alias("bucket_n"),
        F.min("doc_id").over(w).alias("bucket_hub"),
    )
    lhs = aug.filter(
        (F.col("bucket_n") <= bucket_cap) | (F.col("doc_id") == F.col("bucket_hub"))
    ).select("doc_id", "band_idx", "band_key")
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
    sa = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cands.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sigs.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = inter.join(na, "doc_a").join(nb, "doc_b").select(
        "doc_a", "doc_b",
        F.round(
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
            6,
        ).alias("jaccard"),
    )
    return jac.filter(F.col("jaccard") >= threshold)


def cont_r6x(corpus, bucket_cap=SKETCH_BUCKET_CAP):
    from pyspark.sql import Window

    shd = corpus_shingles(corpus).distinct().persist(StorageLevel.DISK_ONLY)
    hashes = shd.select("doc_id", F.md5("shingle").alias("h"))
    w_rk = Window.partitionBy("doc_id").orderBy("h")
    w_doc = Window.partitionBy("doc_id")
    bk = (
        hashes.select(
            "doc_id", "h",
            F.row_number().over(w_rk).alias("rk"),
            F.count("*").over(w_doc).alias("n_sh"),
        )
        .filter(F.col("rk") <= BOTTOM_K_SKETCH)
        .select("doc_id", "h", "n_sh")
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
    sizes = bk.groupBy("doc_id").agg(F.first("n_sh").alias("n_sh"))
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
    spark = get_spark(app_name="dedup_ab")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))

    variants = {
        "lsh_r5": lambda: lsh_r5(dedup_corpus(spark, sf_dir)).count(),
        "lsh_r6": lambda: lsh_verified_pairs(dedup_corpus(spark, sf_dir)).count(),
        "lsh_r6m": lambda: lsh_r6m(dedup_corpus(spark, sf_dir)).count(),
        "lsh_r6x": lambda: lsh_r6x(dedup_corpus(spark, sf_dir)).count(),
        "cont_r5": lambda: containment_r5(dedup_corpus(spark, sf_dir)).count(),
        "cont_r6": lambda: ngram_containment_over(dedup_corpus(spark, sf_dir)).count(),
        "cont_r6x": lambda: cont_r6x(dedup_corpus(spark, sf_dir)).count(),
    }
    # warmup (JIT) once with each shape
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
    print(json.dumps({"walls": walls, "counts": counts,
                      "mins": {k: min(v) for k, v in walls.items()},
                      "medians": {k: sorted(v)[len(v)//2] for k, v in walls.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
