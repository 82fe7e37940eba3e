"""Benchmark corpus: the sf transcripts, deterministically replicated.

The scaling measurement needs enough work per core that fixed overheads
(session, planning, Arrow spin-up) don't dominate — sf0.1 alone is ~100k
turns (~seconds). ``replicated_transcripts`` multiplies the corpus R× by
cross-joining a literal replica index into conv_id: fully deterministic,
same bytes every run, no generated randomness (the turn text is identical
across replicas; conv identity differs, which is exactly the shape of many
concurrent conversations at production scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cca_spark.transcripts import load_transcripts


def replicated_transcripts(
    spark: SparkSession, sf_dir: str, replicas: int = 16
) -> DataFrame:
    t = load_transcripts(spark, sf_dir)
    if replicas <= 1:
        return t
    reps = spark.range(replicas).select(F.col("id").alias("replica"))
    return (
        t.crossJoin(F.broadcast(reps))
        .withColumn("conv_id", F.concat_ws("#", "conv_id", F.col("replica").cast("string")))
        .drop("replica")
    )
