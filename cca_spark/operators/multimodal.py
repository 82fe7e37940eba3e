"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas``. The decode libraries (PIL/ffmpeg/...)
are NOT in this container, so the actual codec step is STUBBED: a
deterministic fake derives features from the raw bytes (so the Spark-side
plumbing — binary schema, Arrow transfer of bytes into pandas, batch
shapes, partitioning — is fully real and oracle-tested), and the real
decode path raises NotImplementedError behind ``real_decode=True``.

Reference analog: CCA treats source files as opaque blobs identified by
content digest and parses them inside per-language plugins
(/root/reference/src/ast/analyzing/diffastcore.ml:42-48); the binary
column + pluggable decoder is the same shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, byte_len int, header_hex string, width int, height int, n_frames int"
)


def binary_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, content binary, meta struct): the multimodal
    table shape. ``content`` stands in for an encoded image/audio blob."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.col("lang").alias("mime_hint"),
            F.col("n_chars").cast("int").alias("declared_size"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def _fake_decode_features(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a codec: features derived from raw bytes.

    Replace the body with PIL/av decode in a real deployment; signature,
    batching and schema stay identical.
    """
    blobs = pdf["content"]
    byte_len = blobs.map(len)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].astype("int64"),
            "byte_len": byte_len.astype("int32"),
            "header_hex": blobs.map(lambda b: b[:4].hex().upper()),
            "width": (byte_len % 640).astype("int32"),
            "height": (byte_len * 7 % 480).astype("int32"),
            "n_frames": (byte_len % 30 + 1).astype("int32"),
        }
    )


def extract_features(binary_df: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary content (Arrow batches).

    real_decode=True is the production path (image/audio libs) — stubbed
    in this container."""
    if real_decode:
        def fail(_: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "real decode requires image/audio codecs not present in this "
                "container; deploy with PIL/pyav and swap _fake_decode_features"
            )

        return binary_df.mapInPandas(fail, schema=FEATURE_SCHEMA)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_features(pdf)

    return binary_df.mapInPandas(run, schema=FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(binary_corpus(spark, sf_dir))


def frame_sample(spark: SparkSession, sf_dir: str, stride: int = 64) -> DataFrame:
    """Frame-sampling plumbing: one row per strided 'frame' window with a
    window digest — the explode shape a video pipeline uses (sample every
    Nth frame, fingerprint it). JVM-side explode + substring, no UDF."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # blen > 0 filter: for empty text, Spark's sequence(0, -1) yields a
    # DESCENDING [0, -1] (two rows) while the oracle's generate_series(0, -1)
    # yields none — clamp by excluding empty payloads in both engines
    # (the oracle's unnest(empty list) drops the row on its own).
    with_len = docs.withColumn("blen", F.length("text").cast("int")).filter(
        F.col("blen") > 0
    )
    frames = with_len.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(0), F.floor((F.col("blen") - 1) / stride).cast("int"))
        ).alias("frame_idx"),
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.md5(F.expr(f"substring(text, frame_idx * {stride} + 1, {stride})")).alias("frame_md5"),
    )
