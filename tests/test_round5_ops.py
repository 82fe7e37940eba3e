"""Round-5 additions: LSH dense-bucket bound, distributed bm25 top-k.

VERDICT r04 #2 measured the LSH verify join going quadratic on a
~99%-duplicate corpus (1,293s for 93k docs) — band buckets holding a whole
replica family make the in-bucket self-join O(n²). The fix caps oversized
buckets to hub-star candidates; these tests pin (a) the candidate count is
linear in bucket size, (b) the transitive keep-list still collapses a
replica family to one keeper, and (c) Spark and DuckDB agree bit-for-bit
while the cap is ACTIVE (the sf-table oracle tests only exercise buckets
below the cap).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _dense_corpus_pdf() -> pd.DataFrame:
    """60-doc replica family (near-dups: shared 30-token body + unique
    tail token) + one small 3-doc family + 2 unrelated singletons."""
    body = " ".join(f"w{i}" for i in range(30))
    rows = [(i, f"{body} tail{i}") for i in range(60)]
    other = "completely different second family " + " ".join(
        f"x{i}" for i in range(26)
    )
    rows += [(100 + i, f"{other} t{i}") for i in range(3)]
    rows += [
        (200, " ".join(f"alpha{i}" for i in range(30))),
        (201, " ".join(f"beta{i}" for i in range(30))),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_lsh_bucket_cap_linear_candidates_and_component_intact(spark):
    """With cap=8 the 60-doc family must emit O(n) candidates (hub-star),
    not O(n²), and connected components must still collapse the family to
    its min doc_id."""
    from cca_spark.operators.dedup import (
        N_BANDS,
        connected_min_labels,
        lsh_verified_pairs,
    )

    corpus = spark.createDataFrame(_dense_corpus_pdf())
    pairs = lsh_verified_pairs(corpus, threshold=0.5, bucket_cap=8).localCheckpoint()
    n_pairs = pairs.count()
    # all-pairs for the 60-family alone would be 1,770; hub-star bounds
    # candidates at ~(n-1) per band plus the small families
    assert 59 <= n_pairs <= N_BANDS * 59 + 10, n_pairs
    # every family pair must involve the hub (doc 0) — the star shape
    fam = pairs.filter(F.col("doc_b") < 100)
    assert fam.filter(F.col("doc_a") != 0).count() == 0
    labels = connected_min_labels(pairs)
    fam_labels = (
        labels.filter(F.col("doc_id") < 100).select("label").distinct().collect()
    )
    assert [r["label"] for r in fam_labels] == [0]
    # the small family stays all-pairs (below cap) and forms its own component
    small = labels.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 200)
    ).select("label").distinct().collect()
    assert [r["label"] for r in small] == [100]


def test_lsh_bucket_cap_active_matches_duckdb(spark):
    """Cross-engine parity while the cap is ACTIVE: Spark and the DuckDB
    oracle (same cap) must produce identical verified pairs."""
    import duckdb

    from cca_spark.operators.dedup import lsh_verified_pairs
    from cca_spark.oracles_training import minhash_lsh_pairs_sql
    from tests.util import normalize

    pdf = _dense_corpus_pdf()
    got = normalize(
        lsh_verified_pairs(spark.createDataFrame(pdf), bucket_cap=8).toPandas()
    )
    con = duckdb.connect()
    con.register("dense_docs", pdf)
    sql = minhash_lsh_pairs_sql(
        corpus_cte="corpus AS (SELECT doc_id, text FROM dense_docs)", bucket_cap=8
    )
    want = normalize(con.sql(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) and len(got) > 50
    pd.testing.assert_frame_equal(got, want)


def test_lsh_cap_inactive_is_identity(spark):
    """With the cap above every bucket size the pipeline must equal the
    uncapped r4 behavior bit-for-bit (the cap only ever REMOVES candidate
    pairs from oversized buckets; below it, nothing changes)."""
    from cca_spark.operators.dedup import lsh_verified_pairs

    corpus = spark.createDataFrame(_dense_corpus_pdf())
    capped = lsh_verified_pairs(corpus, bucket_cap=10_000).toPandas()
    family = capped[capped.doc_b < 100]
    # uncapped: the 60-family is all-pairs verified (59*60/2 = 1770)
    assert len(family) == 1770


def test_bm25_topk_is_distributed_take_ordered(spark, sf_dir):
    """VERDICT r04 #5: the global top-k must plan as TakeOrderedAndProject
    (per-partition top-k + k-row merge), not a single-task row_number
    window over every matching doc. The rank-deriving window runs over the
    k surviving rows only."""
    from cca_spark.operators.textstats import bm25_retrieval

    df = bm25_retrieval(spark, sf_dir)
    fmt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in fmt
    # the window must sit ABOVE the take (bounded by k), and there must be
    # exactly one window operator
    assert fmt.count("Window") >= 1
    assert fmt.index("Window") < fmt.index("TakeOrderedAndProject"), (
        "rank window must consume the k-row take output, not the full corpus"
    )


def test_streaming_dedup_ttl_matches_batch_and_evicts(spark, sf_dir):
    """TTL dedup (VERDICT r04 #4): (a) drained per-(text, day) results
    must equal the batch GROUP BY bit-for-bit, AND (b) state rows must
    actually have been EVICTED mid-stream (watermark passing day-window
    ends) — otherwise the TTL semantics are untested."""
    import __spark_entry__ as entrymod
    from cca_spark.oracles import with_transcripts
    from cca_spark.streaming.pipeline import run_dedup_ttl_to_memory
    from tests.util import assert_matches_oracle

    input_dir = entrymod._staged_stream_input_ts_ordered(spark, sf_dir)
    df, stats = run_dedup_ttl_to_memory(spark, input_dir, query_name="ttl_pytest")
    oracle = with_transcripts(
        sf_dir,
        "SELECT md5(text) AS text_md5, cast(ts AS date) AS day, "
        "min(conv_id || ':' || cast(turn_idx AS varchar)) AS keeper_doc, "
        "count(*) AS n_copies FROM t GROUP BY 1, 2",
    )
    assert_matches_oracle(df, oracle, min_rows=10, sf_dir=sf_dir)
    assert stats["rows_removed"] > 0, (
        f"no state was evicted ({stats}) — the TTL path never fired"
    )


def test_ivf_trained_matches_oracle(spark, sf_dir):
    """VERDICT r04 #8 (stretch): 6dp fixed-point Lloyd means make the
    trained-IVF ANN hash-oracle-able — full value parity vs the
    unrolled-SQL oracle instead of the former rows-only check."""
    from cca_spark.operators.similarity import ivf_ann_trained
    from cca_spark.oracles_training import ivf_ann_trained_sql
    from tests.util import assert_matches_oracle

    assert_matches_oracle(
        ivf_ann_trained(spark, sf_dir),
        ivf_ann_trained_sql(),
        min_rows=30,
        sf_dir=sf_dir,
    )
