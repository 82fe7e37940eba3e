"""Transcripts source abstraction: Iceberg in production, parquet here.

Reference analog: CCA reads from a directory tree, a git object store, or
a cache dir behind one ``builder#build_tree`` interface
(/root/reference/src/ast/analyzing/diffastcore.ml:42-48,
git_storage.ml). Same shape: one ``read_transcripts`` entry point over
pluggable physical sources.

Production layout (10^12 turns): an Iceberg table partitioned by
``days(ts)`` with a bucket transform on ``conv_id``:

    CREATE TABLE lake.transcripts (
      conv_id string, turn_idx int, role string,
      text string, tool string, ts timestamp)
    USING iceberg
    PARTITIONED BY (days(ts), bucket(256, conv_id))

- days(ts) => partition pruning for date-ranged jobs and the manifest
  resume unit;
- bucket(conv_id) => conversation-grouped work (windows over
  (conv_id, turn_idx)) shuffles at most within a bucket, and storage-
  partitioned joins can eliminate the shuffle entirely
  (spark.sql.sources.v2.bucketing.enabled).

The Iceberg runtime jar is not in this sandbox image, so the catalog
path is import/config-gated; the parquet path is the tested stand-in
with identical schema and partition semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp_ntz"
)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured on this session."""
    try:
        return any(
            k.startswith("spark.sql.catalog.") and "iceberg" in v.lower()
            for k, v in spark.sparkContext.getConf().getAll()
        )
    except Exception:
        return False


def read_transcripts(
    spark: SparkSession,
    source: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read transcripts from an Iceberg table name or a parquet path.

    ``snapshot_id`` pins an Iceberg snapshot (the checkpoint/resume
    boundary — CCA's content-hash cache analog, diffts.py:125-207).
    """
    if "/" not in source and iceberg_available(spark):
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.table(source)
    if "/" in source:
        return spark.read.schema(TRANSCRIPT_DDL).parquet(source)
    raise ValueError(
        f"source {source!r} looks like a table name but no Iceberg catalog "
        "is configured on this session (jar not present in this image); "
        "pass a parquet path instead"
    )


def write_transcripts_partitioned(df: DataFrame, path: str) -> None:
    """Parquet stand-in for the Iceberg layout: days(ts) partitioning via a
    derived date column (bucket transform left to Iceberg)."""
    from pyspark.sql import functions as F

    (
        df.withColumn("ts_day", F.col("ts").cast("date"))
        .write.mode("overwrite")
        .partitionBy("ts_day")
        .parquet(path)
    )
