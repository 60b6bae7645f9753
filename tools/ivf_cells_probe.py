"""Derived IVF cell count at scale (SCALE.md evidence for
operators/similarity.py:derive_ivf_cells, round 14).

The search-side controls are fully derived (depth/band, nprobe prune,
LSH config); the cell COUNT is the remaining index-BUILD constant.
This probe prices the sqrt law on the factor-x noisy replica: train
one coarse quantizer at the certified fixed 64 cells and one at
derive_ivf_cells(n) (= round(sqrt(8n)) under clamps), then serve the
same query batch through similarity_topk_ivf_auto (the sound prune —
recall 1.0 by construction on BOTH indexes, so the comparison is pure
cost) and record train wall, serving wall, and the measured per-query
probe/scan telemetry. The expected shape: C* = sqrt(probes*n) turns
the per-query member scan from n*probes/64 rows into ~sqrt(n*probes)
rows, at the price of a heavier one-time Lloyd job (bounded by the
100k training-sample cap) and a C-row broadcast.

Usage: python tools/ivf_cells_probe.py [factor] [out.json] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ann_scale_probe import (  # noqa: E402
    build_noisy_replica,
    expected_replica_rows,
)

from elb_log_to_mysql_spark.session import build_session  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    out_json = sys.argv[2] if len(sys.argv) > 2 else "IVF_CELLS_PROBE.json"
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    work = f"/tmp/ann_probe_{factor}x"
    os.makedirs(work, exist_ok=True)
    emb_path = os.path.join(work, "embeddings.parquet")
    n_vec = None
    if os.path.exists(emb_path):
        import pyarrow.parquet as _pq

        try:
            cached_rows = _pq.read_metadata(emb_path).num_rows
        except Exception:
            cached_rows = -1
        if cached_rows == expected_replica_rows(factor):
            n_vec = cached_rows
    if n_vec is None:
        n_vec = build_noisy_replica(factor, emb_path)

    from pyspark.sql import functions as F

    from elb_log_to_mysql_spark.functions.vectorops import with_unit_norm
    from elb_log_to_mysql_spark.operators import similarity

    spark = build_session(app_name="ivf-cells-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(emb_path).persist()
    emb.count()
    q = emb.filter(F.col("vec_id") < n_queries)

    derived_cells = similarity.derive_ivf_cells(n_vec)
    report: dict = {
        "factor": factor,
        "vectors": n_vec,
        "queries": n_queries,
        "k": 10,
        "derived_cells": derived_cells,
        "paths": {},
    }

    t0 = time.perf_counter()
    exact_rows = similarity.similarity_topk_bruteforce(emb, q, k=10).collect()
    exact = {(r.query_id, r.neighbor_id) for r in exact_rows}
    report["paths"]["bruteforce"] = {
        "wall_sec": round(time.perf_counter() - t0, 2),
        "pairs": len(exact),
    }

    normed = with_unit_norm(
        emb.select(F.col("embedding").alias("_v")), "_v"
    )

    def serve(cells: int, **kw) -> dict:
        t0 = time.perf_counter()
        out, stats = similarity.similarity_topk_ivf_auto(
            emb, q, k=10, with_stats=True, **kw
        )
        rows = out.collect()
        wall = round(time.perf_counter() - t0, 2)
        got = {(r.query_id, r.neighbor_id) for r in rows}
        # collected AFTER the timed window
        srow = stats.agg(
            F.mean("cells_probed").alias("mean_probed"),
            F.max("cells_probed").alias("max_probed"),
        ).first()
        return {
            "wall_sec": wall,
            "recall_at_10": round(len(exact & got) / len(exact), 4),
            "mean_cells_probed": round(float(srow["mean_probed"]), 1),
            "max_cells_probed": int(srow["max_probed"]),
            "probe_fraction": round(float(srow["mean_probed"]) / cells, 5),
        }

    def run(name: str, cells: int) -> None:
        """One cell count, three costs: train (once), the INLINE wall
        (assignment per call — the ad-hoc shape), and the prebuilt
        split (assignment once at build, then the MARGINAL serving
        wall — the production shape derive_ivf_cells is scoped to)."""
        t0 = time.perf_counter()
        centroids = similarity.train_ivf_centroids(
            normed, n_centroids=cells, vec_col="_nv"
        )
        train_wall = round(time.perf_counter() - t0, 2)
        cell = {"cells": cells, "train_sec": train_wall}
        cell["inline"] = serve(cells, centroids=centroids)
        t0 = time.perf_counter()
        idx = similarity.build_ivf_index(emb, centroids=centroids)
        cell["index_build_sec"] = round(time.perf_counter() - t0, 2)
        cell["prebuilt_marginal"] = serve(cells, index=idx)
        idx["corpus"].unpersist()
        report["paths"][name] = cell

    run("ivf_auto_fixed64", 64)
    run("ivf_auto_derived", derived_cells)

    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
