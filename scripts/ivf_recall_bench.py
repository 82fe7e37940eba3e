"""IVF recall/nprobe curve (VERDICT r02 #5) on both corpora:

- clustered (similarity.clustered_embeddings): real-embedding-shaped
  structure, where the production recall floor (>= 0.9 at nprobe <= 4) is
  pinned;
- isotropic (the driver's raw random embeddings): the honest ceiling — no
  sublinear ANN beats ~probed-fraction recall here by much.

Writes BENCH_ivf.json for BENCH.md.

Usage: python scripts/ivf_recall_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import cca_spark.operators.similarity as S
    from cca_spark.session import get_spark

    spark = get_spark(app_name="ivf_recall", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def curve(emb) -> dict:
        truth = {
            (r.q_id, r.c_id) for r in S.brute_force_topk(spark, sf_dir, emb=emb).collect()
        }
        out = {}
        for nprobe in (1, 2, 4):
            got = {
                (r.q_id, r.c_id)
                for r in S.ivf_ann_trained(
                    spark, sf_dir, nprobe=nprobe, iters=2, emb=emb
                ).collect()
            }
            out[f"nprobe_{nprobe}"] = round(len(truth & got) / len(truth), 3)
        return out

    clus = S.clustered_embeddings(spark, sf_dir).localCheckpoint(eager=True)
    report = {
        "metric": "ivf_trained_recall_curve",
        "sf": sf_dir,
        "k_centroids": S.N_IVF_CENTROIDS,
        "clustered": curve(clus),
        "isotropic": curve(S._emb(spark, sf_dir)),
    }
    print(json.dumps(report))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_ivf.json"), "w") as f:
        json.dump(report, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
