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


def test_pii_scrub_matches_oracle(spark, sf_dir):
    """PII redaction (new r5 training-data op): derived PII corpus,
    replacement-order contract, per-type counts — bit-for-bit vs DuckDB."""
    from cca_spark.operators.redact import pii_scrub
    from cca_spark.oracles_training import pii_scrub_sql
    from tests.util import assert_matches_oracle

    df = pii_scrub(spark, sf_dir)
    assert_matches_oracle(df, pii_scrub_sql(), min_rows=100, sf_dir=sf_dir)
    # the scrub must actually fire: every 4th doc gained an email
    got = df.toPandas()
    assert got["was_redacted"].sum() >= len(got) // 4
    assert "<EMAIL>" in got[got.doc_id % 4 == 0].iloc[0]["scrubbed"]
    # and no raw email/hexkey survives a scrubbed text
    assert not got["scrubbed"].str.contains("@example.com").any()


def test_ngram_decontaminate_matches_oracle(spark, sf_dir):
    """Test-set decontamination (new r5): 8-gram overlap vs the derived
    eval subset, broadcast probe — bit-for-bit vs DuckDB."""
    from cca_spark.operators.decontam import EVAL_MOD, EVAL_RESIDUE, ngram_decontaminate
    from cca_spark.oracles_training import ngram_decontaminate_sql
    from tests.util import assert_matches_oracle

    df = ngram_decontaminate(spark, sf_dir)
    assert_matches_oracle(df, ngram_decontaminate_sql(), min_rows=100, sf_dir=sf_dir)
    got = df.toPandas()
    # every eval-source doc is its own contamination hit (it shares all
    # its 8-grams with the eval set), so the flag must fire for them all
    evals = got[got.doc_id % EVAL_MOD == EVAL_RESIDUE]
    assert evals["contaminated"].all()
    # and the scrub is selective: clean docs exist
    assert (~got["contaminated"]).any()


def test_repetition_filter_matches_oracle(spark, sf_dir):
    """Gopher-style repetition ratios (new r5): pure array expressions,
    zero shuffle — bit-for-bit vs DuckDB."""
    from cca_spark.operators.decontam import repetition_filter
    from cca_spark.oracles_training import repetition_filter_sql
    from tests.util import assert_matches_oracle

    df = repetition_filter(spark, sf_dir)
    assert_matches_oracle(df, repetition_filter_sql(), min_rows=100, sf_dir=sf_dir)


def test_repetition_filter_flags_degenerate_text(spark):
    """A doc that is one token repeated must fail the filter; ordinary
    prose must pass."""
    import pandas as pd

    from cca_spark.operators.decontam import repetition_filter_over

    rows = [
        (1, "spam " * 50),
        (2, "the quick brown fox jumps over the lazy dog near a river bank"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = repetition_filter_over(docs).toPandas().set_index("doc_id")
    assert not got.loc[1, "passes_repetition"]
    assert got.loc[2, "passes_repetition"]
    assert got.loc[1, "dup_token_ratio"] > 0.9


def test_lm_unigram_logprob_matches_oracle(spark, sf_dir):
    """Self-trained unigram LM scoring (new r5): decimal-summed 6dp token
    log-probs — bit-for-bit vs DuckDB."""
    from cca_spark.operators.corpus_prep import lm_unigram_logprob
    from cca_spark.oracles_training import lm_unigram_logprob_sql
    from tests.util import assert_matches_oracle

    df = lm_unigram_logprob(spark, sf_dir)
    assert_matches_oracle(df, lm_unigram_logprob_sql(), min_rows=100, sf_dir=sf_dir)


def test_pack_token_budget_matches_oracle(spark, sf_dir):
    """Sequence packing (new r5): shard-local integer bin arithmetic —
    bit-for-bit vs DuckDB, plus the packing invariants."""
    from cca_spark.operators.corpus_prep import PACK_BUDGET, pack_token_budget
    from cca_spark.oracles_training import pack_token_budget_sql
    from tests.util import assert_matches_oracle

    df = pack_token_budget(spark, sf_dir)
    assert_matches_oracle(df, pack_token_budget_sql(), min_rows=100, sf_dir=sf_dir)
    got = df.toPandas()
    # REAL invariants (offset < budget is true by modulo construction and
    # checks nothing): the window cumsum must reconstruct exactly from
    # (bin_id, offset_in_bin) and match an independent per-shard running
    # sum in doc_id order; bins are contiguous from 0 within every shard.
    # Bins are stream chunks docs may STRADDLE, so per-bin token sums are
    # deliberately NOT asserted against the budget.
    got = got.sort_values(["shard", "doc_id"])
    got["cum_before"] = got["bin_id"].astype("int64") * PACK_BUDGET + got[
        "offset_in_bin"
    ].astype("int64")
    for _, g in got.groupby("shard"):
        expected_cum = g["n_tokens"].cumsum().shift(fill_value=0)
        assert (g["cum_before"].values == expected_cum.values).all()
        bins = sorted(g["bin_id"].unique())
        assert bins == list(range(len(bins)))


def test_pack_token_budget_negative_ids_shard_nonnegative(spark):
    """Signed hash doc_ids (the production-day chain feeds xxhash64) must
    land in [0, shards) — Spark's % keeps the dividend's sign, which
    would silently double the shard count; pmod pins the contract."""
    import pandas as pd

    from cca_spark.operators.corpus_prep import PACK_SHARDS, pack_token_budget_over

    rows = [(-5, "a b c"), (-(2**62), "d e"), (7, "f g h i")]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = pack_token_budget_over(docs).toPandas()
    assert (got["shard"] >= 0).all()
    assert (got["shard"] < PACK_SHARDS).all()


def test_lsh_max_shingle_df_drops_boilerplate_candidates(spark):
    """Optional stop-shingle cutoff (VERDICT r04 #2 'and/or'): a
    boilerplate prefix shared by EVERY doc must not make unrelated docs
    near-dup candidates once shingles above the df cutoff are dropped,
    while true near-dups (distinctive shared shingles) survive."""
    import pandas as pd

    from cca_spark.operators.dedup import lsh_verified_pairs

    boiler = " ".join(f"header{i}" for i in range(20))
    uniq = lambda d: " ".join(f"body{d}x{i}" for i in range(10))  # noqa: E731
    rows = [(d, f"{boiler} {uniq(d)}") for d in range(8)]
    # docs 100/101: true near-dups (same distinctive body, no boilerplate)
    body = " ".join(f"shared{i}" for i in range(20))
    rows += [(100, body + " tailA"), (101, body + " tailB")]
    corpus = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    # without the cutoff the boilerplate dominates every signature: the 8
    # unrelated docs all pair up (verify still rejects them on jaccard,
    # but they all PAY the verify join)
    with_cutoff = lsh_verified_pairs(corpus, threshold=0.5, max_shingle_df=4).toPandas()
    assert set(map(tuple, with_cutoff[["doc_a", "doc_b"]].values)) == {(100, 101)}

def test_mixture_weighted_sample_matches_oracle(spark, sf_dir):
    """Source-mixture weighted sampling (new r5): md5-prefix thresholding
    per source — the sampled row SET is bit-for-bit vs DuckDB."""
    from cca_spark.operators.corpus_prep import (
        MIXTURE_WEIGHTS,
        mixture_weighted_sample,
    )
    from cca_spark.oracles_training import mixture_weighted_sample_sql
    from tests.util import assert_matches_oracle

    df = mixture_weighted_sample(spark, sf_dir)
    assert_matches_oracle(
        df, mixture_weighted_sample_sql(), min_rows=50, sf_dir=sf_dir
    )
    got = df.toPandas()
    totals = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .count()
        .toPandas()
        .set_index("source")["count"]
    )
    kept = got.groupby("source").size()
    # weight-1.0 sources keep every doc; fractional sources never exceed
    # their total and the lowest tier visibly downsamples
    for src, w in MIXTURE_WEIGHTS.items():
        if w >= 1.0:
            assert kept.get(src, 0) == totals[src], src
        else:
            assert kept.get(src, 0) <= totals[src], src
    low = [s for s, w in MIXTURE_WEIGHTS.items() if w == 0.1]
    assert sum(kept.get(s, 0) for s in low) < 0.5 * sum(totals[s] for s in low)


def test_mixture_reweighting_superset_and_independent(spark):
    """Raising one source's weight must grow its sample as a SUPERSET and
    leave every other source's sample untouched — the property that makes
    hash thresholding the right tool over rand()."""
    import pandas as pd

    from cca_spark.operators.corpus_prep import mixture_weighted_sample_over

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(400)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source"]))
    s1 = mixture_weighted_sample_over(docs, {"a": 0.3, "b": 0.5}).toPandas()
    s2 = mixture_weighted_sample_over(docs, {"a": 0.7, "b": 0.5}).toPandas()
    a1 = set(s1[s1.source == "a"].doc_id)
    a2 = set(s2[s2.source == "a"].doc_id)
    assert a1 < a2  # strict superset at a higher weight
    assert set(s1[s1.source == "b"].doc_id) == set(s2[s2.source == "b"].doc_id)


def test_ngram_containment_matches_oracle_and_finds_subsets(spark, sf_dir):
    """Asymmetric containment near-dup (new r5): bottom-k sketch blocking
    + exact intersection verify — bit-for-bit vs DuckDB; every twin pair
    (original ⊂ original+suffix) must surface with containment 1.0."""
    from cca_spark.operators.dedup import ngram_containment_pairs
    from cca_spark.oracles_training import ngram_containment_sql
    from tests.util import assert_matches_oracle

    df = ngram_containment_pairs(spark, sf_dir)
    assert_matches_oracle(df, ngram_containment_sql(), min_rows=50, sf_dir=sf_dir)
    got = df.toPandas()
    twins = got[got.doc_b == got.doc_a + 1_000_000]
    n_twin_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id % 3 = 0")
        .count()
    )
    # the sketch must recover every subset pair, not a sample of them
    assert len(twins) == n_twin_docs
    assert (twins["containment_a_in_b"] == 1.0).all()
    # asymmetry is the point: the twin is NOT fully contained in the
    # original (it has suffix shingles the original lacks)
    assert (twins["containment_b_in_a"] < 1.0).all()

def test_containment_bucket_cap_active_matches_duckdb(spark):
    """Sketch-bucket hub-star cap on the containment blocker: with the
    60-doc replica family every doc shares its bottom-k sketch hashes, so
    cap=8 is ACTIVE — Spark and the DuckDB oracle (same cap) must stay
    bit-for-bit, and candidates must be star-shaped, not all-pairs."""
    import duckdb

    from cca_spark.operators.dedup import ngram_containment_over
    from cca_spark.oracles_training import ngram_containment_sql
    from tests.util import normalize

    pdf = _dense_corpus_pdf()
    got_df = ngram_containment_over(spark.createDataFrame(pdf), bucket_cap=8)
    got = normalize(got_df.toPandas())
    con = duckdb.connect()
    con.register("dense_docs", pdf)
    sql = ngram_containment_sql(
        corpus_cte="corpus AS (SELECT doc_id, text FROM dense_docs)", bucket_cap=8
    )
    want = normalize(con.sql(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) and len(got) > 10
    pd.testing.assert_frame_equal(got, want)
    # hub-star bound: family pairs all involve the hub (doc 0), so the
    # surviving pair count is O(n), far below the 1,770 all-pairs
    raw = got_df.toPandas()
    fam = raw[raw.doc_b < 100]
    assert (fam.doc_a == 0).all()
    assert len(fam) <= 59


def test_canonical_by_quality_matches_oracle_and_diverges_from_min_id(spark, sf_dir):
    """Canonical-by-quality keeper (new r5): bit-for-bit vs the DuckDB
    recursive-closure + ranking oracle, one canonical per cluster, and the
    policy must actually differ from the min-id keep-list somewhere (else
    it is the same operator twice)."""
    from cca_spark.operators.dedup import dedup_canonical_by_quality
    from cca_spark.oracles_training import dedup_canonical_by_quality_sql
    from tests.util import assert_matches_oracle

    df = dedup_canonical_by_quality(spark, sf_dir)
    assert_matches_oracle(df, dedup_canonical_by_quality_sql(), min_rows=100, sf_dir=sf_dir)
    got = df.toPandas()
    per = got.groupby("cluster_id").agg(
        n_canon=("is_duplicate", lambda s: int((~s).sum())),
        min_id=("doc_id", "min"),
        canon=("canonical_doc_id", "first"),
        n=("doc_id", "size"),
    )
    assert (per.n_canon == 1).all()  # exactly one keeper per cluster
    multi = per[per.n >= 2]
    assert (multi.canon != multi.min_id).any(), "quality ranking never diverged from min-id"


def test_canonical_by_quality_prefers_higher_quality_member(spark):
    """Synthetic cluster where the HIGHER doc_id is the better copy (more
    stopwords, less punctuation): the canonical pick must be the quality
    winner, not the min id."""
    import pandas as pd

    from cca_spark.operators.dedup import canonical_by_quality_over

    # ~40 shared tokens so the pair passes LSH+Jaccard; doc 11 appends a
    # stopword-rich tail (higher stopword_ratio), doc 10 a punctuation tail
    body = " ".join(f"tok{i}" for i in range(40))
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 11, 50],
                "text": [
                    body + " !!! ??? ;;;",
                    body + " the and of to in it is was",
                    " ".join(f"zzz{i}" for i in range(40)),
                ],
            }
        )
    )
    got = canonical_by_quality_over(corpus).toPandas().set_index("doc_id")
    assert got.loc[10, "canonical_doc_id"] == 11
    assert got.loc[11, "canonical_doc_id"] == 11
    assert bool(got.loc[10, "is_duplicate"]) and not bool(got.loc[11, "is_duplicate"])
    # the unrelated singleton keeps itself
    assert got.loc[50, "canonical_doc_id"] == 50 and not bool(got.loc[50, "is_duplicate"])


def test_streaming_dedup_ttl_nonutc_session_timezone(spark, tmp_path):
    """The TTL window end is computed JVM-side in the SESSION timezone.
    Under a non-UTC session (America/Los_Angeles: a naive midnight
    re-interpreted as UTC lands 8h EARLY) the old pandas-side
    pd.Timestamp(day) end evicted a day-window once the watermark passed
    16:00 local, splitting that day's counts across state generations.
    The staged driver input is day-aligned (a day never straddles
    microbatches), which masked this — so this test stages files that
    SPLIT day 1 at hour 20 (still oldest-first, no late drops) and checks
    exact parity with the tz-independent naive-date GROUP BY."""
    import pandas as pd

    from cca_spark.streaming.pipeline import run_dedup_ttl_to_memory

    # The split needs: (batch1) day-1 texts t0..t6 up to 19:00 — the old
    # UTC-naive timeout (16:00 local) is already behind the 18:00
    # watermark; (batch2) a batch with NO t* data, so their expired
    # timers fire and the state is evicted prematurely; (batch3) more
    # day-1 t* rows at 20:00+ (above the 18:30 watermark, so not late)
    # that re-create the state with counts restarted. The fixed JVM-side
    # end (local midnight) keeps the state alive through batch3, and
    # batches 4-5 (day 2) advance the watermark past it for the real
    # eviction the rows_removed assert pins.
    rows = []
    for i in range(60):  # day 1, hours 0..19
        rows.append(
            ("c1", i, "user", f"t{i % 7}", "",
             pd.Timestamp(2024, 1, 1, i * 20 // 60, i % 60))
        )
    rows.append(("ka", 0, "user", "keepalive", "", pd.Timestamp(2024, 1, 1, 19, 30)))
    for i in range(12):  # day 1, hours 20..23 — same texts return
        rows.append(
            ("c1", 100 + i, "user", f"t{i % 7}", "",
             pd.Timestamp(2024, 1, 1, 20 + i * 4 // 12, i % 60))
        )
    for i in range(6):  # day 2 early
        rows.append(
            ("c2", i, "user", f"t{i % 7}", "", pd.Timestamp(2024, 1, 2, 0, 30 + i))
        )
    for i in range(6):  # day 2 later — watermark passes day 1's true end
        rows.append(
            ("c2", 100 + i, "user", f"t{i % 7}", "", pd.Timestamp(2024, 1, 2, 10 + i, 0))
        )
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    bounds = [
        pd.Timestamp(2024, 1, 1, 19, 15),
        pd.Timestamp(2024, 1, 1, 20),
        pd.Timestamp(2024, 1, 2),
        pd.Timestamp(2024, 1, 2, 5),
        pd.Timestamp(2024, 1, 3),
    ]
    lo = pd.Timestamp(2023, 12, 31)
    chunks = []
    for hi in bounds:
        chunks.append(pdf[(pdf.ts >= lo) & (pdf.ts < hi)])
        lo = hi
    assert all(len(c) for c in chunks)

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        in_dir = str(tmp_path / "ttl_la_in")
        for c in chunks:  # oldest-first file order
            sdf = spark.createDataFrame(c)
            sdf = sdf.withColumn("turn_idx", sdf["turn_idx"].cast("int")).withColumn(
                "ts", sdf["ts"].cast("timestamp_ntz")
            )
            sdf.coalesce(1).write.mode("append").parquet(in_dir)
            # distinct mtimes keep the file source's oldest-first delivery
            import time as _t

            _t.sleep(0.05)
        df, stats = run_dedup_ttl_to_memory(spark, in_dir, query_name="ttl_pytest_la")
        got = (
            df.toPandas()
            .astype({"day": str})
            .sort_values(["text_md5", "day"])
            .reset_index(drop=True)
        )
        exp = (
            spark.createDataFrame(pdf)
            .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
            .selectExpr(
                "md5(text) AS text_md5",
                "to_date(ts) AS day",
                "concat_ws(':', conv_id, cast(turn_idx AS string)) AS doc_key",
            )
            .groupBy("text_md5", "day")
            .agg(F.min("doc_key").alias("keeper_doc"), F.count("*").alias("n_copies"))
            .toPandas()
            .astype({"day": str})
            .sort_values(["text_md5", "day"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
        assert stats["rows_removed"] > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_corpus_shard_shuffle_matches_oracle_and_permutes(spark, sf_dir):
    """Training-shard shuffle: cross-engine exact, positions contiguous
    per shard, no doc lost, and a NEW SEED is a genuinely different
    permutation (the per-epoch reshuffle contract)."""
    from cca_spark.operators.corpus_prep import (
        SHUFFLE_SHARDS,
        corpus_shard_shuffle,
        corpus_shard_shuffle_over,
    )
    from cca_spark.oracles_training import corpus_shard_shuffle_sql
    from tests.util import assert_matches_oracle

    df = corpus_shard_shuffle(spark, sf_dir)
    assert_matches_oracle(df, corpus_shard_shuffle_sql(), min_rows=100, sf_dir=sf_dir)
    got = df.toPandas()
    assert got["doc_id"].is_unique and got["shard"].between(0, SHUFFLE_SHARDS - 1).all()
    for _, g in got.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    epoch1 = corpus_shard_shuffle_over(docs, seed="epoch1").toPandas()
    j = got.merge(epoch1, on="doc_id", suffixes=("_0", "_1"))
    assert len(j) == len(got)
    moved = ((j["shard_0"] != j["shard_1"]) | (j["pos_0"] != j["pos_1"])).mean()
    assert moved > 0.9, f"epoch reshuffle barely moved anything ({moved:.2%})"


def test_per_source_cap_matches_oracle_and_bounds(spark, sf_dir):
    """Per-source cap: cross-engine exact and no source exceeds the cap."""
    from cca_spark.operators.corpus_prep import PER_SOURCE_CAP, per_source_cap
    from cca_spark.oracles_training import per_source_cap_sql
    from tests.util import assert_matches_oracle

    df = per_source_cap(spark, sf_dir)
    assert_matches_oracle(df, per_source_cap_sql(), min_rows=50, sf_dir=sf_dir)
    got = df.toPandas()
    assert (got.groupby("source").size() <= PER_SOURCE_CAP).all()
    assert (got["src_rank"] >= 1).all() and (got["src_rank"] <= PER_SOURCE_CAP).all()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(got) < n_docs, "the cap never bound — test data too small to exercise it"


def test_per_source_cap_prefers_passing_docs(spark):
    """A source with more docs than the cap must keep quality-gate
    passers over longer failers — the ranking is quality-first."""
    from cca_spark.operators.corpus_prep import per_source_cap_over

    passing = "the a of and to in is for on with " * 15  # long, stopword-rich
    failing = "zz " * 300  # longer, but no stopwords -> fails the gate
    rows = [(1, passing, "s", len(passing)), (2, failing, "s", len(failing)),
            (3, passing + "x", "s", len(passing) + 1)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source", "n_chars"])
    )
    got = per_source_cap_over(docs, cap=2).toPandas().set_index("doc_id")
    assert set(got.index) == {1, 3}, "failing-but-longer doc displaced a passer"
    assert bool(got["passes_quality"].all())


def test_vocab_coverage_matches_oracle_and_curve_shape(spark, sf_dir):
    """Vocabulary coverage: cross-engine exact; ranks contiguous from 1;
    coverage strictly increasing to <= 1; an explicit small top exercises
    the distributed take (limit actually binds)."""
    from cca_spark.operators.corpus_prep import vocab_coverage, vocab_coverage_over
    from cca_spark.oracles_training import vocab_coverage_sql
    from tests.util import assert_matches_oracle

    df = vocab_coverage(spark, sf_dir)
    assert_matches_oracle(df, vocab_coverage_sql(), min_rows=10, sf_dir=sf_dir)
    got = df.toPandas().sort_values("vocab_rank").reset_index(drop=True)
    assert got["vocab_rank"].tolist() == list(range(1, len(got) + 1))
    assert got["cum_coverage"].is_monotonic_increasing
    assert got["cum_coverage"].iloc[-1] <= 1.0
    assert (got["cnt"].diff().dropna() <= 0).all(), "counts must be non-increasing"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    top5 = vocab_coverage_over(docs, top=5).toPandas()
    assert len(top5) == 5
    assert top5.sort_values("vocab_rank")["cum_coverage"].iloc[-1] < 1.0


def test_hash_split_matches_oracle_and_is_growth_stable(spark, sf_dir):
    """Holdout split: cross-engine exact; fractions roughly honored; and
    GROWTH-STABLE — splitting a superset corpus never reassigns an
    existing doc (the property that prevents train->eval leakage as the
    corpus grows)."""
    from cca_spark.operators.corpus_prep import hash_split, hash_split_over
    from cca_spark.oracles_training import hash_split_sql
    from tests.util import assert_matches_oracle

    df = hash_split(spark, sf_dir)
    assert_matches_oracle(df, hash_split_sql(), min_rows=100, sf_dir=sf_dir)
    got = df.toPandas()
    frac_train = (got["split"] == "train").mean()
    assert 0.9 <= frac_train <= 1.0 and set(got["split"]) <= {"train", "val", "test"}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    grown = docs.union(docs.select((F.col("doc_id") + 10_000_000).alias("doc_id")))
    re_split = hash_split_over(grown).toPandas()
    j = got.merge(re_split, on="doc_id", suffixes=("_old", "_new"))
    assert len(j) == len(got)
    assert (j["split_old"] == j["split_new"]).all(), "corpus growth moved docs between splits"


def test_repeated_span_fraction_matches_oracle_and_signal(spark, sf_dir):
    """Cross-doc boilerplate fraction: cross-engine exact on the real
    table; and on a synthetic corpus, a verbatim-duplicated doc scores
    exactly 1.0 while a unique-vocabulary doc scores exactly 0.0."""
    from cca_spark.operators.dedup import repeated_span_fraction, repeated_span_fraction_over
    from cca_spark.oracles_training import repeated_span_fraction_sql
    from tests.util import assert_matches_oracle

    df = repeated_span_fraction(spark, sf_dir)
    assert_matches_oracle(df, repeated_span_fraction_sql(), min_rows=100, sf_dir=sf_dir)
    shared = " ".join(f"w{i}" for i in range(20))
    unique = " ".join(f"u{i}" for i in range(20))
    corpus = spark.createDataFrame(
        pd.DataFrame(
            [(1, shared), (2, shared), (3, unique)], columns=["doc_id", "text"]
        )
    )
    got = repeated_span_fraction_over(corpus).toPandas().set_index("doc_id")
    assert got.loc[1, "repeated_frac"] == 1.0 and got.loc[2, "repeated_frac"] == 1.0
    assert got.loc[3, "repeated_frac"] == 0.0


def test_per_source_cap_plan_has_partial_group_limit(spark, sf_dir):
    """Hub-domain scale safety rides on Catalyst's InferWindowGroupLimit:
    the physical plan must show a PARTIAL WindowGroupLimit below the
    Exchange (map-side per-source top-cap prune), so a giant source never
    funnels more than cap rows per map partition into the final sort.
    Also checks correctness on a skewed multi-partition corpus (one
    source holding 90% of docs across 16 input partitions)."""
    from cca_spark.operators.corpus_prep import per_source_cap, per_source_cap_over

    plan = (
        per_source_cap(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pre_exchange = plan.split("Exchange", 1)[1]
    assert "WindowGroupLimit" in pre_exchange and "Partial" in pre_exchange, (
        "map-side Partial WindowGroupLimit missing — the rank filter no "
        "longer infers a group limit; a hub domain would shuffle whole"
    )
    stop_rich = "the a of and to in is for on with " * 12
    rows = [(i, stop_rich + f"x{i} " * (i % 37), "hub", 0) for i in range(900)]
    rows += [(1000 + i, stop_rich + f"y{i}", f"s{i % 5}", 0) for i in range(100)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source", "n_chars"])
    pdf["n_chars"] = pdf["text"].str.len()
    got = (
        per_source_cap_over(spark.createDataFrame(pdf).repartition(16), cap=7)
        .toPandas()
        .sort_values(["source", "src_rank"])
    )
    assert (got.groupby("source").size() <= 7).all()
    # pandas oracle: same (passes-first, longer-first, doc_id) ranking —
    # the synthetic texts all pass the gate, so rank by (n_chars, doc_id)
    exp_hub = (
        pdf[pdf.source == "hub"]
        .sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .head(7)["doc_id"]
        .tolist()
    )
    assert got[got.source == "hub"].sort_values("src_rank")["doc_id"].tolist() == exp_hub


def test_pack_assemble_matches_oracle_and_reassembles(spark, sf_dir):
    """Packed-sequence assembly: cross-engine exact (the seq md5 pins
    byte-exact member order); totals reconcile with the assignments; and
    a synthetic bin's hash equals a hand-computed concatenation."""
    import hashlib

    from cca_spark.operators.corpus_prep import pack_assemble, pack_assemble_over, pack_token_budget
    from cca_spark.oracles_training import pack_assemble_sql
    from tests.util import assert_matches_oracle

    df = pack_assemble(spark, sf_dir)
    assert_matches_oracle(df, pack_assemble_sql(), min_rows=20, sf_dir=sf_dir)
    got = df.toPandas()
    assignments = pack_token_budget(spark, sf_dir).toPandas()
    assert got["n_docs"].sum() == len(assignments)
    assert got["bin_tokens"].sum() == assignments["n_tokens"].sum()
    # hand oracle: 3 docs, one shard, tiny budget -> docs 0,32 pack into
    # shard 0 (pmod 32); budget 5 puts both in bin 0 (2+2 tokens)
    docs = spark.createDataFrame(
        pd.DataFrame(
            [(0, "a b"), (32, "c d"), (1, "e f")], columns=["doc_id", "text"]
        )
    )
    out = pack_assemble_over(docs, budget=5, shards=32).toPandas()
    row = out[(out.shard == 0) & (out.bin_id == 0)].iloc[0]
    assert row["n_docs"] == 2
    assert row["seq_md5"] == hashlib.md5(b"a b c d").hexdigest()


def test_http_query_service_serves_battery(spark, sf_dir):
    """The HTTP service (reference web-service analog) must serve the
    battery over a long-lived session: health, the query list, a real
    query whose rows equal direct execution, a 404 for unknown names,
    and a limit that reaches the plan (CollectLimit, not a slice)."""
    import json
    import urllib.request

    from cca_spark.service import serve

    server = serve(spark)
    host, port = server.server_address
    base = f"http://{host}:{port}"

    def get(path):
        with urllib.request.urlopen(f"{base}{path}", timeout=120) as r:
            return r.status, json.loads(r.read())

    try:
        code, health = get("/health")
        assert code == 200 and health["ok"]
        code, listing = get("/queries")
        assert code == 200 and "token_count" in listing["queries"]
        code, res = get(f"/query/token_count?sf_dir={sf_dir}&limit=10000")
        assert code == 200 and res["n_rows"] >= 100
        assert {c["name"] for c in res["schema"]} == {
            "doc_id", "ws_tokens", "bpe_ish_tokens"
        }
        import __spark_entry__ as entrymod

        direct = {
            r["doc_id"]: r["ws_tokens"]
            for r in entrymod.queries()["token_count"](spark, sf_dir).collect()
        }
        served = {r["doc_id"]: r["ws_tokens"] for r in res["rows"]}
        assert served == direct
        code, res = get(f"/query/token_count?sf_dir={sf_dir}&limit=7")
        assert code == 200 and res["n_rows"] == 7
        try:
            code, _ = get("/query/not_a_query")
            assert False, "unknown query must 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


def test_similarity_cli_scores_pairs(spark, sf_dir):
    """simast-analog: a conversation against itself scores exact
    match / jaccard 1.0 / token_sim 1.0; two different conversations
    score below 1.0 on all three."""
    from cca_spark.transcripts import load_transcripts
    from scripts.similarity_cli import conv_similarity

    convs = [
        r["conv_id"]
        for r in load_transcripts(spark, sf_dir)
        .select("conv_id").distinct().orderBy("conv_id").limit(2).collect()
    ]
    assert len(convs) == 2
    same = conv_similarity(spark, sf_dir, convs[0], convs[0])
    assert same["exact"] and same["jaccard"] == 1.0 and same["token_sim"] == 1.0
    diff = conv_similarity(spark, sf_dir, convs[0], convs[1])
    assert not diff["exact"]
    assert diff["jaccard"] < 1.0 and diff["token_sim"] < 1.0
    assert diff["n_tokens_a"] > 0 and diff["n_tokens_b"] > 0


def test_jsonl_roundtrip_matches_oracle(spark, sf_dir):
    """Interchange: parquet -> JSONL -> read-back digest must equal the
    oracle's digest over the ORIGINAL parquet (lossless text round-trip,
    order-independent bit_xor of content hashes)."""
    from cca_spark.sources.interchange import jsonl_roundtrip_digest
    from cca_spark.oracles_training import jsonl_roundtrip_sql
    from tests.util import assert_matches_oracle

    assert_matches_oracle(
        jsonl_roundtrip_digest(spark, sf_dir),
        jsonl_roundtrip_sql(),
        min_rows=5,
        sf_dir=sf_dir,
    )


def test_csv_roundtrip_survives_adversarial_text(spark, tmp_path):
    """CSV round-trip with the characters that break naive CSV: commas,
    double quotes, embedded newlines, unicode, leading/trailing spaces —
    every field must come back byte-identical."""
    rows = [
        (1, 'plain text', "en", "s0", 10),
        (2, 'comma, separated, values', "en", "s1", 24),
        (3, 'she said "hello" twice: ""', "en", "s0", 26),
        (4, 'line one\nline two\r\nline three', "en", "s1", 29),
        (5, '  padded  ', "en", "s0", 10),
        (6, 'unicode: naïve café 日本語 🚀', "fr", "s1", 25),
        (7, 'quote-comma: ",", and "",""', "en", "s0", 27),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    from cca_spark.sources.interchange import (
        read_documents_csv,
        write_documents_csv,
    )

    df = spark.createDataFrame(pdf)
    out = str(tmp_path / "csv_rt")
    write_documents_csv(df, out)
    back = (
        read_documents_csv(spark, out)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, pdf, check_dtype=False)


def test_hash_split_single_fraction_keeps_everything(spark, sf_dir):
    """A no-holdout config (single fractions entry) must assign every doc
    to that one split instead of crashing on an empty CASE chain."""
    from cca_spark.operators.corpus_prep import hash_split_over

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    got = hash_split_over(docs, fractions=(("all", 1.0),)).toPandas()
    assert (got["split"] == "all").all() and len(got) == docs.count()
