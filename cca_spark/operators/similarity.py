"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring the reference's two-tier matching (cheap digest
prematch → expensive TED only on survivors,
/root/reference/src/ast/analyzing/engine/analyzing.ml:1292-1326):

- brute-force cosine top-k: the exact baseline. Query side is small and
  broadcast; the corpus scan is embarrassingly parallel; dot products run
  JVM-side via ``aggregate``/``zip_with`` higher-order functions (no
  Python in the loop).
- LSH-bucketed ANN: deterministic sign-projection buckets prune the
  corpus before the exact rerank — the scale path (at 100 TB the bucket
  join replaces the full cross product).

Float discipline: all arithmetic upcast to double, results rounded to 6
decimals before ranking so rankings are reproducible across engines and
partitionings; ties broken by vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# dims used for the deterministic sign-projection LSH bucket
LSH_DIMS = [0, 13, 29, 47]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def brute_force_topk(
    spark: SparkSession, sf_dir: str, k: int = 3, n_queries: int = 20
) -> DataFrame:
    """Exact cosine top-k: first ``n_queries`` vectors against the corpus.

    Query side is broadcast (tiny); corpus side never shuffles until the
    final per-query top-k (row_number over a k-sized window)."""
    emb = _emb(spark, sf_dir)
    queries = F.broadcast(
        emb.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"))
    scored = (
        queries.crossJoin(corpus)
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(
                _dot(F.col("q_emb"), F.col("c_emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("c_emb"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def _bucket(emb_col):
    """Deterministic sign-projection bucket: one char per probed dim."""
    parts = [
        F.when(F.element_at(emb_col, d + 1).cast("double") > 0, F.lit("1")).otherwise(F.lit("0"))
        for d in LSH_DIMS
    ]
    return F.concat(*parts)


def lsh_bucketed_ann(
    spark: SparkSession, sf_dir: str, k: int = 3, n_queries: int = 20
) -> DataFrame:
    """ANN: candidates share the sign-projection bucket; exact cosine
    rerank within bucket. Recall < 1 by design; determinism exact."""
    emb = _emb(spark, sf_dir).withColumn("bucket", _bucket(F.col("embedding")))
    queries = F.broadcast(
        emb.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"), "bucket"
        )
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"), "bucket")
    scored = (
        queries.join(corpus, "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(
                _dot(F.col("q_emb"), F.col("c_emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("c_emb"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def embedding_cosine_near_dup(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35
) -> DataFrame:
    """Embedding near-dup pairs: same LSH bucket AND cosine >= threshold —
    the embedding member of the dedup family (dedup.py)."""
    emb = _emb(spark, sf_dir).withColumn("bucket", _bucket(F.col("embedding")))
    a = emb.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("ea"), "bucket")
    b = emb.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("eb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb"))), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


N_IVF_CENTROIDS = 8
IVF_CENTROID_STRIDE = 8  # centroid vec_ids: 0, 8, 16, ... 56


def _ivf_centroids(emb: DataFrame) -> DataFrame:
    """Deterministic coarse quantizer: a fixed stride of corpus vectors
    stands in for trained k-means centroids (training is out of scope for
    the oracle; the *plumbing* — assignment join + cell-local search — is
    identical with trained centroids)."""
    top = N_IVF_CENTROIDS * IVF_CENTROID_STRIDE
    return emb.filter(
        (F.col("vec_id") % IVF_CENTROID_STRIDE == 0) & (F.col("vec_id") < top)
    ).select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cent_emb"))


def ivf_assign(emb: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid (cosine, 6dp-rounded,
    centroid_id tie-break): broadcast the tiny centroid table, score all
    cells in one projection, keep rank 1. At 10^12 scale this is the
    classic IVF build pass — one broadcast join, no shuffle until the
    per-vector argmin window (partitioned by vec_id, so state is K rows)."""
    cents = F.broadcast(_ivf_centroids(emb))
    scored = emb.crossJoin(cents).select(
        "vec_id",
        "embedding",
        "centroid_id",
        F.round(
            _dot(F.col("embedding"), F.col("cent_emb"))
            / (_norm(F.col("embedding")) * _norm(F.col("cent_emb"))),
            6,
        ).alias("cent_cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cent_cos"), F.asc("centroid_id"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "embedding", F.col("centroid_id").alias("cell"))
    )


def ivf_ann(spark: SparkSession, sf_dir: str, k: int = 3, n_queries: int = 20) -> DataFrame:
    """IVF ANN (nprobe=1): queries search only their own centroid cell;
    exact cosine rerank within the cell. The scale path: a 10^12-vector
    corpus is bucketed by cell (Iceberg partition / bucket column), so a
    query touches 1/K of the data. Recall < 1 by design; determinism
    exact (6dp rounding + vec_id tie-breaks)."""
    assigned = ivf_assign(_emb(spark, sf_dir))
    queries = F.broadcast(
        assigned.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"), "cell"
        )
    )
    corpus = assigned.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"), "cell"
    )
    scored = (
        queries.join(corpus, "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(
                _dot(F.col("q_emb"), F.col("c_emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("c_emb"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
