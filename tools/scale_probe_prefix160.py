"""160x cell for the exact-Jaccard PREFIX path (VERDICT r12 item 4).

The chooser's 320x refusal arithmetic is proven
(SCALE_PROBE_320x.json: est_pairs 142.9G prices the inverted join at
4.16 TiB of shuffle), but the prefix path's EXECUTED linearity
stopped at 80x (1208.8 s, 69.3 s/Mpair). This probe runs
`ngram_jaccard_pairs_prefix` directly at 160x (800k docs on the
clone-dense replica) and records:

- wall + found pairs + s/Mpair (the linearity check vs the 80x
  anchor: pairs grow ~4x per doubling on this replica, wall must
  track pairs, so expect ~4x the 80x wall — plan a long session),
- in-plan precision (min emitted jaccard >= threshold) and the
  deterministic clone-pair floor n_base * C(160, 2),
- the heap-requirement model prediction vs the live JVM heap (the
  100 TB executor-sizing formula, one more anchor).

Run with SPARK_DRIVER_MEMORY=48g inside tmux (multi-hour wall).
Usage: python tools/scale_probe_prefix160.py [factor] [out.json]
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
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    out_json = (
        sys.argv[2] if len(sys.argv) > 2 else f"SCALE_PROBE_PREFIX_{factor}x.json"
    )

    spark = build_session(app_name=f"scale-probe-prefix-{factor}x")
    spark.sparkContext.setLogLevel("ERROR")
    from elb_log_to_mysql_spark.operators import dedup

    out_dir = f"/tmp/scale_probe_docs_{factor}x"
    marker = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(marker):
        replicate(factor, out_dir, tables=DOC_TABLES)
    docs = spark.read.parquet(marker)
    n_base = spark.read.parquet(os.path.join(SRC, "documents.parquet")).count()

    t0 = time.perf_counter()
    ng = dedup.ngram_jaccard_pairs_prefix(docs, threshold=0.5).persist()
    n_ng, t_ng = timed(ng.count)
    min_j = ng.agg(F.min("jaccard")).first()[0]
    ng.unpersist()
    clone_floor = n_base * math.comb(factor, 2)

    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(F.split("text", r"\s+"))).alias("w"),
    ).first()
    required = dedup.sublinear_heap_requirement(
        stats["n"], float(stats["w"]), n_ng
    )
    heap = dedup._runtime_heap_bytes(spark)

    report = {
        "probe": "ngram_jaccard_prefix_execution",
        "factor": factor,
        "docs": docs.count(),
        "found_pairs": n_ng,
        "sec": t_ng,
        "total_sec_incl_audit": round(time.perf_counter() - t0, 2),
        "min_emitted_jaccard": min_j,
        "precision_1": bool(min_j is not None and min_j >= 0.5),
        "clone_pair_floor": clone_floor,
        "floor_met": n_ng >= clone_floor,
        "sec_per_mpair": round(t_ng / (n_ng / 1e6), 2),
        "anchor_80x": {"sec": 1208.78, "sec_per_mpair": 69.32},
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
