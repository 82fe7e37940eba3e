"""Non-SQL-expressible operators get pure-Python oracles here."""

from __future__ import annotations

import difflib

import duckdb


def test_lcs_alignment_matches_python_oracle(spark, sf_dir):
    from cca_spark.operators.delta import lcs_pair_alignment

    got = {
        (r["doc_a"], r["doc_b"]): (r["lcs_len"], r["sim_ratio"])
        for r in lcs_pair_alignment(spark, sf_dir, n_pairs=20).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE doc_id < 40 ORDER BY doc_id"
    ).fetchall()
    texts = dict(docs)
    want = {}
    for a in range(0, 40, 2):
        ta, tb = texts[a].split(), texts[a + 1].split()
        sm = difflib.SequenceMatcher(None, ta, tb, autojunk=False)
        lcs = sum(bl.size for bl in sm.get_matching_blocks())
        want[(a, a + 1)] = (lcs, round(2.0 * lcs / (len(ta) + len(tb)), 6))
    assert got == want and len(got) == 20


def test_approx_stats_sanity(spark, sf_dir):
    from pyspark.sql import functions as F

    from cca_spark.operators.delta import approx_stats
    from cca_spark.transcripts import load_transcripts

    approx = {r["role"]: r for r in approx_stats(spark, sf_dir).collect()}
    exact = {
        r["role"]: r["n"]
        for r in load_transcripts(spark, sf_dir)
        .groupBy("role")
        .agg(F.countDistinct("conv_id").alias("n"))
        .collect()
    }
    for role, n_exact in exact.items():
        row = approx[role]
        assert abs(row["approx_convs"] - n_exact) / n_exact < 0.1
        # scalar percentile columns (canonicalizer-safe), monotone by level
        assert row["len_p50"] <= row["len_p95"] <= row["len_p99"]


def test_cdc_merge_semantics(spark, sf_dir):
    """Deletes gone, updates applied, inserts present, untouched intact."""
    from pyspark.sql import functions as F

    from cca_spark.operators.delta import cdc_merge

    merged = cdc_merge(spark, sf_dir)
    base = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert merged.filter((F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") < 1_000_000)).count() == 0
    n_inserts = base.filter(F.col("c_custkey") % 10 == 3).count()
    assert merged.filter(F.col("c_custkey") >= 1_000_000).count() == n_inserts
