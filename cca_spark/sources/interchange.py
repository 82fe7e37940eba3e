"""Interchange formats for the documents table: JSONL and CSV.

Training corpora move between systems as JSON-Lines (the de-facto
interchange format for pre-training data) and occasionally CSV; the
lakehouse format stays parquet/Iceberg. These are thin, schema-pinned
wrappers over Spark's native readers/writers — the engine's JSON/CSV
parsing is JVM-side and whole-stage-codegen'd, so a JSONL scan runs at
parquet-scan-order speed with column pruning (Spark prunes JSON fields
it doesn't need via the pushed schema).

Schema discipline: readers take an EXPLICIT schema (never inference).
At 100 TB, schema inference is a full extra pass over the data, and a
drifting inferred type (a doc_id that looks numeric in one shard and
string in another) silently forks downstream joins. The pinned schema
also keeps the lossless-round-trip contract checkable: the
``jsonl_roundtrip`` battery query writes parquet → JSONL → reads it
back and must aggregate hash-identically to DuckDB reading the parquet
directly.

Reference analog: CCA emits facts as size-rotated N-Triples text files
(S5) and reads them back; same role — a textual interchange sink/source
pair around the binary store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """One JSON object per line; Spark handles quoting/escaping (newlines
    inside text become \\n escapes, so the line framing is never broken)."""
    df.select([f.name for f in DOCUMENTS_SCHEMA.fields]).write.mode(
        "overwrite"
    ).json(path)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Schema-pinned JSONL scan. ``mode=FAILFAST`` — a corrupt line is an
    error, not a silent null row (PERMISSIVE's default swallows it, which
    at corpus scale means quietly training on truncated data)."""
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "FAILFAST")
        .json(path)
    )


def write_documents_csv(df: DataFrame, path: str) -> None:
    """CSV with full quoting/escaping (quote-doubling, header row) —
    text columns contain commas, quotes, and newline escapes."""
    (
        df.select([f.name for f in DOCUMENTS_SCHEMA.fields])
        .write.mode("overwrite")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        # Spark's CSV writer TRIMS field whitespace by default — padded
        # text must survive byte-exactly
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """``multiLine`` because quoted text fields legally contain raw
    newlines in CSV — but multiLine files are NOT SPLITTABLE (one task
    per file; a record may straddle any byte offset). That is the scale
    argument for JSONL over CSV: JSON escapes newlines to \\n, so line
    framing survives and every JSONL file splits. CSV support exists for
    interchange with tools that demand it, not as the corpus format."""
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def jsonl_roundtrip_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery query: parquet → JSONL → read back → per-source digest.
    The digest (row count, n_chars sum, bit_xor of every row's 60-bit
    md5(doc_id ':' text) prefix) is ORDER-INDEPENDENT and text-sensitive,
    so it proves the textual round-trip lossless against the DuckDB
    oracle aggregating the original parquet directly — any escaping or
    type drift through JSONL breaks the digest. bit_xor, not sum: a sum
    of 60-bit keys overflows int64 (ANSI Spark raises; DuckDB silently
    widens to HUGEINT — a cross-engine fork), while XOR is closed over
    int64 and commutative at any corpus size."""
    import hashlib
    import tempfile

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # ONE deterministic dir per sf_dir, overwritten in place — a fresh
    # mkdtemp per call leaked a corpus-sized JSONL copy on every battery
    # run / pytest / HTTP hit until the disk filled
    out = (
        tempfile.gettempdir()
        + "/jsonl_rt_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    write_documents_jsonl(docs, out)
    back = read_documents_jsonl(spark, out)
    from cca_spark.operators.corpus_prep import md5_prefix60

    key = md5_prefix60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))
    )
    return back.select("source", "n_chars", key.alias("k")).groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.expr("bit_xor(k)").cast("bigint").alias("content_digest"),
    )
