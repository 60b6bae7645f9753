"""Sharding-scale k-means datapoint: k=1024 on the 10x embeddings
replica (SCALE.md evidence for operators/clustering.py).

The round-6 rewrite made assignment zero-shuffle (one broadcast
centroid-array row, in-row argmin fold), measured flat in k up to 64.
The semantic-sharding claim is k in the THOUSANDS: this probe runs
assignment-dominated k-means at k = 8 / 64 / 256 / 1024 on the same
replica and records wall time per iteration, proving the cost stays
assignment-CPU-bound (linear-ish in k x rows compute, no shuffle
blow-up) rather than exploding with k.

Usage: python tools/kmeans_scale_probe.py [factor] [out.json]
Requires the scale-sweep replica generator (reuses it if the replica
directory is absent).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elb_log_to_mysql_spark.session import build_session  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_json = sys.argv[2] if len(sys.argv) > 2 else "KMEANS_SCALE_PROBE.json"
    out_dir = f"/tmp/scale_sweep_{factor}x"

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_sweep import replicate

    made_replica = not os.path.exists(os.path.join(out_dir, "embeddings.parquet"))
    if made_replica:
        replicate(factor, out_dir)

    spark = build_session(app_name="kmeans-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from elb_log_to_mysql_spark.operators.clustering import kmeans_embeddings

    emb = spark.read.parquet(os.path.join(out_dir, "embeddings.parquet")).persist()
    n = emb.count()

    report: dict = {"factor": factor, "vectors": n, "iterations": 2, "by_k": {}}
    for k in (8, 64, 256, 1024):
        t0 = time.perf_counter()
        out = kmeans_embeddings(emb, k=k, iterations=2)
        n_assigned = out.count()
        wall = time.perf_counter() - t0
        n_clusters = out.select("cluster_id").distinct().count()
        report["by_k"][k] = {
            "wall_sec": round(wall, 2),
            "assigned": n_assigned,
            "nonempty_clusters": n_clusters,
            "all_assigned": n_assigned == n,
        }
        print(f"k={k}: {wall:.2f}s, {n_clusters} nonempty clusters", flush=True)

    ks = sorted(report["by_k"])
    w0, w1 = report["by_k"][ks[0]]["wall_sec"], report["by_k"][ks[-1]]["wall_sec"]
    report["cost_ratio_kmax_over_kmin"] = round(w1 / w0, 2)
    report["k_ratio"] = ks[-1] // ks[0]

    spark.stop()
    if made_replica:
        shutil.rmtree(out_dir, ignore_errors=True)
    with open(out_json, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
