"""Filtered-ANN broad-regime cost cell (SCALE.md evidence for
operators/similarity.py:similarity_topk_filtered, round 15 —
VERDICT r14 item 4's measured half).

The similarity_topk_filtered_broad gate certifies the derived post
branch's decisions at sf0.01; this probe measures the cost arithmetic
on the factor-x noisy replica (each base vector gains `factor`
genuine near-neighbors — the narrow-angle geometry a real index
serves). Predicate keeps 7/8 of the corpus (s = 0.875, the broad
regime). Three cells:

  - pre_exact: brute force over the survivor set — BOTH the recall
    referee and the cost of the pre branch the chooser weighs,
  - post_fixed_3_24: the legacy pinned config the operator used
    until round 15 (expected scan fraction 24/2^3 = 3.0 — three
    brute scans' worth of candidate work per query batch),
  - post_derived: derive_lsh_params' config through the same
    operator (the round-15 default), chooser decision recorded with
    the REAL modeled fraction.

Done-criterion: the derived cell beats the fixed cell at the same
recall floor, and the chooser (given the derived fraction) picks post
while the fixed config's fraction >= 1 would price post as unsound.

Usage: python tools/filtered_scale_probe.py [factor] [out.json]
       [n_queries]
"""

from __future__ import annotations

import json
import math
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
    out_json = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"FILTERED_SCALE_PROBE_{factor}x.json"
    )
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
        else:
            print(
                f"cached replica invalid ({cached_rows} rows): rebuilding",
                flush=True,
            )
    if n_vec is None:
        n_vec = build_noisy_replica(factor, emb_path)

    from pyspark.sql import functions as F

    from elb_log_to_mysql_spark.operators import similarity

    spark = build_session(app_name="filtered-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(emb_path).persist()
    emb.count()
    q = emb.filter(F.col("vec_id") < n_queries)
    pred = F.col("vec_id") % 8 != 0

    report: dict = {
        "probe": "filtered_ann_broad_regime",
        "factor": factor,
        "vectors": n_vec,
        "queries": n_queries,
        "k": 10,
        "predicate": "vec_id % 8 != 0",
        "cells": {},
    }

    # referee AND the pre branch's cost: exact over the survivor set
    t0 = time.perf_counter()
    exact_rows = similarity.similarity_topk_bruteforce(
        emb.filter(pred), q, k=10
    ).collect()
    exact = {(r.query_id, r.neighbor_id) for r in exact_rows}
    pre_wall = round(time.perf_counter() - t0, 2)
    report["cells"]["pre_exact"] = {"wall_sec": pre_wall, "pairs": len(exact)}

    # derivation = index-build artifact (outside serving walls), sized
    # by the coverage law sample >= 2*k*n/factor
    sample_rows = max(2048, math.ceil(2 * 10 * n_vec / factor))
    t0 = time.perf_counter()
    params = similarity.derive_lsh_params(
        emb, q, k=10, floor=0.95, sample_rows=sample_rows,
        query_sample=min(n_queries, 64),
    )
    derive_wall = round(time.perf_counter() - t0, 2)
    post_frac = (
        params["est_scan_fraction"] if params["method"] == "lsh" else 1.0
    )
    strategy, s = similarity.choose_filter_strategy(
        emb, pred, post_scan_fraction=post_frac
    )
    report["derivation"] = {
        "method": params["method"],
        "n_planes": params.get("n_planes"),
        "n_tables": params.get("n_tables"),
        "est_scan_fraction": post_frac,
        "derive_sec": derive_wall,
        "sample_rows": sample_rows,
        "chooser_decision": strategy,
        "selectivity": round(s, 4),
        "fixed_3_24_scan_fraction": round(
            similarity.lsh_scan_fraction(params["p_rand"], 3, 24), 4
        ),
    }

    def run(name: str, **kw) -> None:
        t0 = time.perf_counter()
        rows = similarity.similarity_topk_filtered(
            emb, q, pred, k=10, method="post", selectivity=s, **kw
        ).collect()
        wall = round(time.perf_counter() - t0, 2)
        got = {(r.query_id, r.neighbor_id) for r in rows}
        report["cells"][name] = {
            "wall_sec": wall,
            "recall_at_10": round(len(exact & got) / len(exact), 4),
        }

    run("post_fixed_3_24", n_planes=3, n_tables=24)
    if params["method"] == "lsh":
        run("post_derived", lsh_params=params)
        d = report["cells"]["post_derived"]
        f = report["cells"]["post_fixed_3_24"]
        report["derived_beats_fixed"] = bool(
            d["wall_sec"] < f["wall_sec"]
            and d["recall_at_10"] >= 0.95
        )

    with open(out_json, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
