"""Interleaved A/B: spark.sql.join.preferSortMergeJoin true (default) vs
false (guide §3.1/§9 — planner may pick shuffled-hash join when its size
conditions hold, skipping both corpus-sized sorts). Runtime SQL conf, so
it toggles per trial inside ONE session; counts asserted identical."""
import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from cca_spark.session import get_spark


def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="shj_ab")
    from cca_spark.operators import dedup as DD
    from cca_spark.operators import relational as R

    queries = {
        "dedup_minhash_lsh": lambda: DD.minhash_lsh_pairs(spark, sf).count(),
        "ngram_containment": lambda: DD.ngram_containment_pairs(spark, sf).count(),
        "range_containment": lambda: R.range_containment_suppression(spark, sf).count(),
    }
    modes = {"smj": "true", "shj": "false"}

    def clear():
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()

    # warm both modes
    for mode, v in modes.items():
        spark.conf.set("spark.sql.join.preferSortMergeJoin", v)
        for fn in queries.values():
            fn()
            clear()

    walls = {f"{q}:{m}": [] for q in queries for m in modes}
    counts = {}
    for r in range(4):
        for q, fn in queries.items():
            for mode, v in modes.items():
                spark.conf.set("spark.sql.join.preferSortMergeJoin", v)
                spark.sparkContext.setJobDescription(f"{q} {mode} round {r}")
                t0 = time.time()
                n = fn()
                walls[f"{q}:{mode}"].append(round(time.time() - t0, 3))
                prev = counts.setdefault(q, n)
                assert prev == n, f"{q}: count diverged {prev} vs {n} in {mode}"
                clear()
    print(
        json.dumps(
            {
                "walls": walls,
                "counts": counts,
                "medians": {k: sorted(v)[len(v) // 2] for k, v in walls.items()},
                "mins": {k: min(v) for k, v in walls.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
