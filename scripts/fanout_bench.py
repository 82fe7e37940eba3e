"""Re-measure the sink fan-out write (VERDICT r04 #1).

BENCH_r04 recorded sink_fanout_write at 102.6s vs 29.4s in r03 with the
write path (route.write_sinks) and its bench harness code-unchanged; the
only r4 bench delta was the tfidf/bm25 measurements that run immediately
BEFORE the fan-out write. Two hypotheses:

  (a) sandbox I/O noise window (this host documents ±40% swings, but 3.5×
      exceeds every documented band);
  (b) neighbor-block pollution: the retrieval benches materialize
      corpus-sized cached/checkpointed blocks whose async ContextCleaner
      drop overlaps the write, contending for the same local disk.

This script answers both with INTERLEAVED trials in one session at the
r3/r4 bench scale: each round measures (A) the fan-out write in isolation,
then (B) the identical write immediately after the tfidf+bm25 benches
(the exact r4 sequence). ≥3 rounds; all raw trials recorded. Verdict
rule: if median(B) >> median(A) the regression is real and (b) is the
cause; if both medians sit near the r3 number the r4 figure was one bad
window; if both sit near the r4 number the host changed.

Usage: python scripts/fanout_bench.py [replicas=16]
Writes BENCH_fanout.json (auto-folded into BENCH.md by
scripts/scaling_bench.py's evidence sections).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rounds = int(os.environ.get("FANOUT_BENCH_ROUNDS", "3"))
    import gc

    from cca_spark.bench_corpus import ensure_bench_corpus, read_bench_corpus
    from cca_spark.operators import textstats as TS
    from cca_spark.operators.route import write_sinks
    from cca_spark.plans.pipeline import routed_facts
    from cca_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="fanout_bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = ensure_bench_corpus(spark, sf_dir, replicas)
    transcripts = read_bench_corpus(spark, corpus_path)
    n_turns = transcripts.count()

    def release() -> None:
        # clearCache drains persist()-based caches (tfidf's lazy DISK_ONLY
        # tf cache holds a STRONG CacheManager reference GC never frees) so
        # the next "isolated" leg truly starts cache-free; the
        # after_retrieval leg deliberately runs WITHOUT this, replicating
        # the exact r4 sequence with retrieval blocks still resident
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        time.sleep(2)  # let the async ContextCleaner drain

    def timed_write() -> float:
        out = tempfile.mkdtemp(prefix="cca_fanout_trial_")
        try:
            t0 = time.time()
            write_sinks(routed_facts(spark, transcripts), out)
            return round(time.time() - t0, 1)
        finally:
            shutil.rmtree(out, ignore_errors=True)

    # identical warm discipline to bench.py: first write through a fresh
    # JVM pays parquet/shuffle JIT
    warm = tempfile.mkdtemp(prefix="cca_fanout_warm_")
    try:
        write_sinks(routed_facts(spark, transcripts.limit(200_000)), warm)
    finally:
        shutil.rmtree(warm, ignore_errors=True)
    release()

    isolated: list[float] = []
    after_retrieval: list[float] = []
    for i in range(rounds):
        isolated.append(timed_write())
        print(json.dumps({"round": i, "leg": "isolated", "sec": isolated[-1]}), flush=True)
        release()
        # the exact r4 sequence: tfidf + bm25 (their caches/checkpoints
        # still draining), then the write
        TS.tfidf_top_terms(spark, sf_dir).count()
        TS.bm25_retrieval(spark, sf_dir).count()
        gc.collect()
        spark._jvm.System.gc()
        after_retrieval.append(timed_write())
        print(
            json.dumps({"round": i, "leg": "after_retrieval", "sec": after_retrieval[-1]}),
            flush=True,
        )
        release()

    # true median (even-length lists average the middle pair — the
    # upper-middle pick biased the medians feeding scaling_bench's
    # NOISE/UNRESOLVED verdict whenever FANOUT_BENCH_ROUNDS was even;
    # recorded runs used the odd default of 3, so past verdicts stand)
    med = statistics.median
    report = {
        "metric": "sink_fanout_write_interleaved",
        "sf": sf_dir,
        "replicas": replicas,
        "n_turns": n_turns,
        "isolated_trials_sec": isolated,
        "after_retrieval_trials_sec": after_retrieval,
        "isolated_median_sec": med(isolated),
        "after_retrieval_median_sec": med(after_retrieval),
        "r03_reference_sec": 29.4,
        "r04_reference_sec": 102.6,
    }
    print(json.dumps(report))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_fanout.json"), "w") as f:
        json.dump(report, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
