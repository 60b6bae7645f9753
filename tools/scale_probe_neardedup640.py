"""640x cell for the flagship near-dedup operator: one more doubling
past the round-12 320x octave (SCALE_PROBE_320x.json: 1.6M docs,
281.3M pairs, 575.6 s, heap model 13.6/48 GiB).

At 640x the clone-dense replica yields 3.2M docs and a TRUE pair
output of n_base*C(640,2) = 1.02G clone pairs plus the scaled
cross-base near pairs — the law under test remains "wall linear in
candidates/output", and the heap-requirement model's prediction
(~2x the 320x cell) moves meaningfully toward the live 48 GiB
ceiling, which is exactly the executor-sizing regime a 100 TB
deployment plans in.

Records wall + pairs + s/Mpair (linearity vs the 320x anchor's 2.05),
in-plan precision (min emitted jaccard >= threshold), the
deterministic clone-pair floor, and the heap model prediction vs the
live JVM heap.

Run with SPARK_DRIVER_MEMORY=48g inside tmux (expect ~40-80 min).
Usage: python tools/scale_probe_neardedup640.py [factor] [out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elb_log_to_mysql_spark.session import build_session  # noqa: E402
from tools.scale_sweep import replicate, timed  # noqa: E402

SRC = "/root/testdata/sf0.1"
DOC_TABLES = {"documents"}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    out_json = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"SCALE_PROBE_NEARDEDUP_{factor}x.json"
    )

    spark = build_session(app_name=f"scale-probe-neardedup-{factor}x")
    spark.sparkContext.setLogLevel("ERROR")
    from elb_log_to_mysql_spark.operators import dedup

    out_dir = f"/tmp/scale_probe_docs_{factor}x"
    marker = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(marker):
        replicate(factor, out_dir, tables=DOC_TABLES)
    docs = spark.read.parquet(marker)
    n_base = spark.read.parquet(os.path.join(SRC, "documents.parquet")).count()

    t0 = time.perf_counter()
    nd = dedup.near_dedup_minhash(docs, threshold=0.6).persist()
    n_nd, t_nd = timed(nd.count)
    min_j = nd.agg(F.min("jaccard")).first()[0]
    nd.unpersist()
    clone_floor = n_base * math.comb(factor, 2)

    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(F.split("text", r"\s+"))).alias("w"),
    ).first()
    required = dedup.sublinear_heap_requirement(
        stats["n"], float(stats["w"]), n_nd
    )
    heap = dedup._runtime_heap_bytes(spark)

    report = {
        "probe": "near_dedup_minhash_execution",
        "factor": factor,
        "docs": docs.count(),
        "found_pairs": n_nd,
        "sec": t_nd,
        "total_sec_incl_audit": round(time.perf_counter() - t0, 2),
        "min_emitted_jaccard": min_j,
        "precision_1": bool(min_j is not None and min_j >= 0.6),
        "clone_pair_floor": clone_floor,
        "floor_met": n_nd >= clone_floor,
        "sec_per_mpair": round(t_nd / (n_nd / 1e6), 2),
        "anchor_320x": {"sec": 575.61, "sec_per_mpair": 2.05},
        "heap_required_model_gib": round(required / (1 << 30), 2),
        "heap_live_gib": round(heap / (1 << 30), 2),
        "heap_headroom_ok": bool(heap >= required),
    }
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
