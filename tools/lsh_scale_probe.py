"""Derived-LSH-at-scale datapoint (SCALE.md evidence for
operators/similarity.py:derive_lsh_params, round 14).

The ann_lsh_auto gate certifies the derivation's choices at sf0.01;
this probe measures the COST arithmetic the gate can only assert as
booleans, on the same factor-x noisy replica the ANN probes use
(each base vector gains `factor` genuine near-neighbors at ±0.05
Gaussian noise — the narrow-angle cluster geometry LSH exists for):

  - brute-force exact: the wall every ANN path is audited against,
  - lsh_auto: derive (planes, tables) from the measured geometry
    (the sample must be dense enough to catch >= k cluster siblings
    per query — sized k*n/factor x 2 here, see derive_lsh_params),
    then run the derived config; recall + measured candidate volume,
  - lsh_fixed_3_24: the gate-certified fixed config, whose expected
    scan fraction 24/2^3 = 3.0 means it does ~three brute scans of
    candidate work per query batch at ANY scale — the cost-unsound
    shape the derivation exists to replace.

Usage: python tools/lsh_scale_probe.py [factor] [out.json] [n_queries]

n_queries (default 20) sizes the query batch: the corpus bucketize is
query-count-INDEPENDENT (one Arrow matmul pass over the corpus), so a
larger batch amortizes it while brute force scales linearly in
|Q|·|corpus| — the serving-shape arithmetic the 20-query cells can't
show.
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
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    out_json = sys.argv[2] if len(sys.argv) > 2 else "LSH_SCALE_PROBE.json"
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

    spark = build_session(app_name="lsh-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(emb_path).persist()
    emb.count()
    q = emb.filter(F.col("vec_id") < n_queries)

    report: dict = {
        "factor": factor,
        "vectors": n_vec,
        "queries": n_queries,
        "k": 10,
        "paths": {},
    }

    t0 = time.perf_counter()
    exact_rows = similarity.similarity_topk_bruteforce(emb, q, k=10).collect()
    exact = {(r.query_id, r.neighbor_id) for r in exact_rows}
    brute_wall = round(time.perf_counter() - t0, 2)
    report["paths"]["bruteforce"] = {
        "wall_sec": brute_wall,
        "pairs": len(exact),
    }

    # Sample sizing: expected siblings-in-sample per query is
    # factor * sample/n = sample/base_rows; x2 safety over k.
    sample_rows = max(2048, math.ceil(2 * 10 * n_vec / factor))
    t0 = time.perf_counter()
    params = similarity.derive_lsh_params(
        emb, q, k=10, floor=0.95, sample_rows=sample_rows,
        query_sample=min(n_queries, 64),
    )
    derive_wall = round(time.perf_counter() - t0, 2)

    def run(name: str, **kw) -> None:
        t0 = time.perf_counter()
        out, stats = similarity.similarity_topk_lsh(
            emb, q, k=10, with_stats=True, **kw
        )
        rows = out.collect()
        wall = round(time.perf_counter() - t0, 2)
        got = {(r.query_id, r.neighbor_id) for r in rows}
        # collected AFTER the timed window (re-runs the bucket join)
        cand = stats.agg(F.sum("candidates")).first()[0] or 0
        report["paths"][name] = {
            "wall_sec": wall,
            "recall_at_10": round(len(exact & got) / len(exact), 4),
            "candidates_total": int(cand),
            "scan_fraction_measured": round(cand / (n_queries * n_vec), 6),
            "config": {
                "n_planes": kw["n_planes"],
                "n_tables": kw["n_tables"],
            },
        }

    if params["method"] == "lsh":
        run(
            "lsh_auto",
            n_planes=params["n_planes"],
            n_tables=params["n_tables"],
        )
        report["paths"]["lsh_auto"]["derive_sec"] = derive_wall
        report["paths"]["lsh_auto"]["sample_rows"] = sample_rows
        report["paths"]["lsh_auto"]["est_scan_fraction"] = round(
            params["est_scan_fraction"], 6
        )
    else:
        report["paths"]["lsh_auto"] = {
            "method": "brute-refusal",
            "derive_sec": derive_wall,
            "sample_rows": sample_rows,
        }
    report["derived"] = {
        "method": params["method"],
        "theta_near_deg": round(math.degrees(params["theta_near"]), 1),
        "theta_rand_deg": round(math.degrees(params["theta_rand"]), 1),
        "fixed_3_24_scan_fraction": round(
            similarity.lsh_scan_fraction(params["p_rand"], 3, 24), 3
        ),
    }

    run("lsh_fixed_3_24", n_planes=3, n_tables=24)

    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
