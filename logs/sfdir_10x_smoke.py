"""Synthesize a 10x sf directory (key-shifted replicas of sf0.1) and
smoke every sf-dir bench query on it: no crashes, sane walls, output
rows scaling plausibly. NOT an oracle check — scale insurance only
(the driver's measurement may use a larger driver-generated sf)."""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cca_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sfbig"
R = 10


def build(spark):
    if os.path.exists(os.path.join(DST, "_DONE")):
        return
    os.makedirs(DST, exist_ok=True)
    # integer-keyed tables: offset every key-ish integer column by a
    # replica stride far above the real key range
    strides = {
        "documents": {"doc_id": 100_000_000},
        "embeddings": {"vec_id": 100_000_000},
        "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
        "lineitem": {"l_orderkey": 100_000_000, "l_suppkey": 10_000_000, "l_partkey": 10_000_000},
        "customer": {"c_custkey": 10_000_000},
        "supplier": {"s_suppkey": 10_000_000},
        "part": {"p_partkey": 10_000_000},
        "nation": {},
        "region": {},
    }
    for t, shifts in strides.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if shifts:
            reps = []
            for r in range(R):
                d = df
                for c, stride in shifts.items():
                    d = d.withColumn(c, (F.col(c) + F.lit(r * stride)).cast(df.schema[c].dataType))
                reps.append(d)
            out = reps[0]
            for d in reps[1:]:
                out = out.unionByName(d)
        else:
            out = df  # dimension lookup tables stay as-is
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print("built", t, flush=True)
    # events: conv identity derives from user_id (hot conv = user_id%10==0,
    # transcripts_sql) — shift user_id by a multiple of 10 so replica hot
    # convs stay hot (mod-10 class preserved) yet conv keys stay disjoint;
    # event_id shifted to keep turn tie-break and synth-text variation
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    reps = []
    for r in range(R):
        reps.append(
            ev.withColumn("user_id", (F.col("user_id") + F.lit(r * 1_000_000_000)).cast("long"))
            .withColumn("event_id", (F.col("event_id") + F.lit(r * 1_000_000_000)).cast("long"))
        )
    out = reps[0]
    for d in reps[1:]:
        out = out.unionByName(d)
    out.write.mode("overwrite").parquet(f"{DST}/events.parquet")
    print("built events", flush=True)
    open(os.path.join(DST, "_DONE"), "w").write("ok")


def main():
    spark = get_spark(app_name="sfbig_smoke")
    from cca_spark.dist import ensure_on_executors

    ensure_on_executors(spark)
    build(spark)

    from cca_spark.operators import corpus_prep as CP
    from cca_spark.operators import decontam as DC
    from cca_spark.operators import dedup as DD
    from cca_spark.operators import redact as RED
    from cca_spark.operators import relational as Rl
    from cca_spark.operators import similarity as SIM
    from cca_spark.operators import textstats as TS

    queries = {
        "pricing_summary": lambda: Rl.pricing_summary(spark, DST).count(),
        "join_chain_revenue": lambda: Rl.join_chain_revenue(spark, DST).count(),
        "sessionize_events": lambda: Rl.sessionize_events(spark, DST).count(),
        "range_containment": lambda: Rl.range_containment_suppression(spark, DST).count(),
        "dedup_minhash_lsh": lambda: DD.minhash_lsh_pairs(spark, DST).count(),
        "ngram_containment": lambda: DD.ngram_containment_pairs(spark, DST).count(),
        "ann_brute_force": lambda: SIM.brute_force_topk(spark, DST).count(),
        "tfidf_top_terms": lambda: TS.tfidf_top_terms(spark, DST).count(),
        "bm25_retrieval": lambda: TS.bm25_retrieval(spark, DST).count(),
        "pii_scrub": lambda: RED.pii_scrub(spark, DST).count(),
        "ngram_decontaminate": lambda: DC.ngram_decontaminate(spark, DST).count(),
        "repetition_filter": lambda: DC.repetition_filter(spark, DST).count(),
        "lm_unigram_score": lambda: CP.lm_unigram_logprob(spark, DST).count(),
        "pack_token_budget": lambda: CP.pack_token_budget(spark, DST).count(),
        "mixture_weighted_sample": lambda: CP.mixture_weighted_sample(spark, DST).count(),
    }
    out = {}
    for name, fn in queries.items():
        spark.sparkContext.setJobDescription(f"sfbig:{name}")
        t0 = time.time()
        n = fn()
        out[name] = {"sec": round(time.time() - t0, 2), "rows": n}
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark._jvm.System.gc()
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))
    spark.stop()


if __name__ == "__main__":
    main()
