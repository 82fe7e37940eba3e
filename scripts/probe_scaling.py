#!/usr/bin/env python3
"""One-off probe: time pipeline stages at a given parallelism level.

Usage: python scripts/probe_scaling.py <cores> [driver_mem]
Prints one JSON line with per-stage seconds.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1])
    mem = sys.argv[2] if len(sys.argv) > 2 else "8g"
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = mem

    from pyspark.sql import functions as F

    from cca_spark.bench_corpus import ensure_bench_corpus, read_bench_corpus
    from cca_spark.operators.aggregate import agg_per_sink
    from cca_spark.operators.parse import parse_facts
    from cca_spark.plans.pipeline import routed_facts
    from cca_spark.session import get_spark

    spark = get_spark(app_name=f"probe_{cores}", master=f"local[{cores}]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    path = ensure_bench_corpus(spark, sf_dir, 64)
    t = read_bench_corpus(spark, path)

    out = {"cores": cores, "mem": mem}
    t0 = time.time()
    out["n_turns"] = t.count()
    out["scan_count_s"] = round(time.time() - t0, 2)

    # warm python workers
    agg_per_sink(routed_facts(spark, t.limit(2000))).collect()

    t0 = time.time()
    n = parse_facts(t).count()
    out["parse_only_s"] = round(time.time() - t0, 2)
    out["n_facts"] = n

    t0 = time.time()
    agg_per_sink(routed_facts(spark, t)).collect()
    out["pipeline_s"] = round(time.time() - t0, 2)

    out["scan_partitions"] = t.rdd.getNumPartitions()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
