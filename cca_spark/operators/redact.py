"""PII / secret redaction for training-data pipelines.

The scrub every corpus runs before pre-training: emails, IPv4 addresses,
long hex tokens (API keys / digests), and long digit runs (phone /
account numbers) replaced with typed placeholders, plus per-type match
counts for corpus audit dashboards. Extends the reference's
text-normalization surface (the fact pipeline already normalizes spans;
/root/reference/python/src/cca/ccautil/ the same way this repo's
textstats extend its SLOC counting) to the redaction step a 100 TB
pipeline needs.

Shape: pure JVM column expressions — a chain of ``regexp_replace`` plus
``regexp_extract_all`` counts, whole-stage codegen, zero shuffle, runs at
parquet-scan speed with full column pruning. Patterns are written in the
regex subset Java (Spark) and RE2 (DuckDB) interpret identically — no
backreferences, no lookaround — and replacement ORDER is fixed (email →
ipv4 → hexkey → longnum) so both engines scrub byte-identically; counts
are measured per-pattern on the ORIGINAL text.

The driver's synthetic documents contain no PII, so the oracled query
derives a deterministic PII-bearing corpus (every 4th doc gains an email,
every 5th an IPv4, every 6th an account number, every 7th an md5 hex key)
from the same parquet via one dialect-shared expression — the twin-corpus
discipline of the dedup family (dedup.dedup_corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (name, pattern, placeholder) in REPLACEMENT ORDER — the order is part of
# the cross-engine contract (a 32+ digit run is a HEXKEY, not a LONGNUM,
# because hexkey replaces first)
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IPV4>"),
    ("hexkey", r"\b[0-9a-fA-F]{32,}\b", "<HEXKEY>"),
    ("longnum", r"\b[0-9]{9,}\b", "<LONGNUM>"),
]


def pii_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic PII-bearing corpus derived from (doc_id, text)."""
    did = F.col("doc_id")
    dstr = did.cast("string")
    text = F.concat(
        F.col("text"),
        F.when(
            did % 4 == 0,
            F.concat(F.lit(" contact user"), dstr, F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" host 10.0."), (did % 256).cast("string"), F.lit(".7")),
        ).otherwise(F.lit("")),
        F.when(
            did % 6 == 0, F.concat(F.lit(" acct 900000000"), dstr)
        ).otherwise(F.lit("")),
        F.when(did % 7 == 0, F.concat(F.lit(" key "), F.md5(dstr))).otherwise(
            F.lit("")
        ),
    )
    return docs.select("doc_id", text.alias("text"))


def pii_scrub_over(docs: DataFrame) -> DataFrame:
    """Scrub + audit counts over any (doc_id, text) table."""
    scrubbed = F.col("text")
    for _, pattern, placeholder in PII_RULES:
        scrubbed = F.regexp_replace(scrubbed, pattern, placeholder)
    counts = [
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pattern), 0))
        .cast("int")
        .alias(f"n_{name}")
        for name, pattern, _ in PII_RULES
    ]
    return docs.select(
        "doc_id",
        *counts,
        scrubbed.alias("scrubbed"),
        (scrubbed != F.col("text")).alias("was_redacted"),
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver query: scrub the derived PII corpus."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return pii_scrub_over(pii_corpus(docs))
