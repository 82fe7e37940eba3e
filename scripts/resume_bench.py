"""Bench-scale kill/resume evidence (VERDICT r02 #6).

Simulates a crashed run over the STORED 19.2M-turn corpus: run 1 is capped
at 20 of the 30 date-bucket partitions (the 'kill'), run 2 resumes and must
process EXACTLY the 10 unmanifested partitions, run 3 must be a no-op.
Prints one JSON line for BENCH.md.

Usage: python scripts/resume_bench.py [replicas=192]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    from pyspark.sql import functions as F

    from cca_spark.bench_corpus import ensure_bench_corpus, read_bench_corpus
    from cca_spark.plans.manifest import read_facts, read_manifest, run_with_resume
    from cca_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="resume_bench", master=f"local[{cpus}]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    path = ensure_bench_corpus(spark, sf_dir, replicas)
    corpus = read_bench_corpus(spark, path)
    n_turns = corpus.count()

    out_dir = tempfile.mkdtemp(prefix="cca_resume_bench_")
    try:
        t0 = time.time()
        r1 = run_with_resume(spark, sf_dir, out_dir, max_partitions=20, transcripts=corpus)
        w1 = time.time() - t0
        t0 = time.time()
        r2 = run_with_resume(spark, sf_dir, out_dir, transcripts=corpus)
        w2 = time.time() - t0
        t0 = time.time()
        r3 = run_with_resume(spark, sf_dir, out_dir, transcripts=corpus)
        w3 = time.time() - t0

        manifest = read_manifest(spark, out_dir)
        n_manifest = manifest.count()
        n_distinct = manifest.select("date_bucket").distinct().count()
        facts_committed = read_facts(spark, out_dir).count()
        manifest_sum = manifest.agg(F.sum("n_facts")).collect()[0][0]
        report = {
                    "metric": "resume_reprocessed_partitions",
                    "n_turns": n_turns,
                    "replicas": replicas,
                    "run1_processed": len(r1["processed"]),
                    "run1_skipped": r1["skipped"],
                    "run1_sec": round(w1, 1),
                    "run2_processed": len(r2["processed"]),
                    "run2_skipped": r2["skipped"],
                    "run2_sec": round(w2, 1),
                    "run3_processed": len(r3["processed"]),
                    "run3_skipped": r3["skipped"],
                    "run3_sec": round(w3, 1),
                    "manifest_rows": n_manifest,
                    "manifest_distinct_partitions": n_distinct,
                    "facts_committed": facts_committed,
                    "manifest_fact_sum": manifest_sum,
                    "readback_equals_manifest": facts_committed == manifest_sum,
        }
        print(json.dumps(report))
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo, "BENCH_resume.json"), "w") as f:
            json.dump(report, f, indent=2)
        assert len(r2["processed"]) == n_distinct - len(r1["processed"])
        assert r3["processed"] == [] and r3["skipped"] == n_distinct
        assert facts_committed == manifest_sum
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
