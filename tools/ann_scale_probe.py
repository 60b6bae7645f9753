"""ANN-at-scale datapoint: PQ and IVF+PQ vs brute force on an 80k
vector corpus (SCALE.md evidence for operators/similarity.py).

The registry certifies recall at sf0.01 (500 vectors); the 100 TB
claims are about SCAN SHAPE — ADC over 16-byte codes instead of
full-width dot products, and IVF cell restriction making the scan
sublinear. This probe builds a `factor`x replica of the sf0.1
embeddings where each copy gets small deterministic Gaussian noise
(seeded per copy — NOT exact clones, so each base vector gains
`factor` genuine near-neighbors and the top-k problem stays
non-degenerate, like a real near-dup-heavy corpus), then measures
wall + recall@10 for:

  - brute-force exact (the baseline the others are audited against),
  - PQ with exhaustive ADC scan + top-40 exact rerank,
  - IVF(64 cells, nprobe 8) + PQ — the sublinear compressed path.

Usage: python tools/ann_scale_probe.py [factor] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elb_log_to_mysql_spark.session import build_session  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_noisy_replica(factor: int, out_path: str, noise: float = 0.05) -> int:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    base = np.vstack(t["embedding"].to_pylist()).astype(np.float32)
    n, dim = base.shape
    labels = t["label"].to_numpy()
    parts = []
    for i in range(factor):
        rng = np.random.default_rng(1000 + i)
        vecs = base if i == 0 else base + rng.normal(
            0.0, noise, size=base.shape
        ).astype(np.float32)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(
                        (i * n + np.arange(n)).astype("int64")
                    ),
                    "embedding": pa.array(
                        [row for row in vecs.tolist()],
                        type=pa.list_(pa.float32()),
                    ),
                    "label": pa.array(labels, type=pa.int32()),
                }
            )
        )
    full = pa.concat_tables(parts)
    # write-temp + atomic rename: a crashed build can never leave a
    # partial file at out_path that a later run would silently reuse
    tmp_path = out_path + ".tmp"
    pq.write_table(
        full, tmp_path, row_group_size=max(1024, (factor * n) // 32)
    )
    os.replace(tmp_path, out_path)
    return factor * n


def expected_replica_rows(factor: int) -> int:
    """Row count a valid cached replica must have: factor x the base
    table — the validation gate for reusing /tmp artifacts (ADVICE
    r12: bare os.path.exists accepted partial/mismatched files)."""
    import pyarrow.parquet as pq

    base_rows = pq.read_metadata(
        os.path.join(SRC, "embeddings.parquet")
    ).num_rows
    return factor * base_rows


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    out_json = sys.argv[2] if len(sys.argv) > 2 else "ANN_SCALE_PROBE.json"
    # rerank_factor: the exact-rerank shortlist is k*rerank_factor per
    # query. On a near-dup-dense corpus ADC scores TIE across a clone
    # cluster, so the shortlist must be at least the duplicate
    # multiplicity or the true top-k (an id-tiebroken subset of the
    # cluster) falls outside it — the 320x probe measured recall 0.65
    # at the old fixed depth 4 (top-40 vs 320-wide tie clusters) and
    # the depth-64 rerun adjudicated the recovery. "auto" passes None:
    # the r13 DEFAULT, deriving the depth from the stored codes' tie
    # structure (operators/similarity.py:derive_pq_rerank_factor).
    # arg3 forms: "auto" -> derived controls (depth agg + adaptive
    # cut); "N" -> fixed depth N, no cut; "Na" (e.g. "4a") -> the
    # PRODUCTION SERVING shape: precomputed depth N + the adaptive
    # per-candidate cut, zero eager jobs at plan build.
    arg3 = sys.argv[3] if len(sys.argv) > 3 else "4"
    adaptive = None
    if arg3 in ("auto", "none", "None"):
        rerank_factor = None
    elif arg3.endswith("a"):
        rerank_factor = int(arg3[:-1])
        adaptive = True
    else:
        rerank_factor = int(arg3)
    work = f"/tmp/ann_probe_{factor}x"
    os.makedirs(work, exist_ok=True)
    emb_path = os.path.join(work, "embeddings.parquet")
    n_vec = None
    if os.path.exists(emb_path):
        import pyarrow.parquet as _pq

        # validate before reuse: a partial file from a crashed build,
        # or one built against a different factor/base, must trigger
        # a rebuild instead of silently skewing the recorded cells
        try:
            cached_rows = _pq.read_metadata(emb_path).num_rows
        except Exception:
            cached_rows = -1
        if cached_rows == expected_replica_rows(factor):
            n_vec = cached_rows
        else:
            print(
                f"cached replica invalid ({cached_rows} rows, want "
                f"{expected_replica_rows(factor)}): rebuilding",
                flush=True,
            )
    if n_vec is None:
        n_vec = build_noisy_replica(factor, emb_path)

    from pyspark.sql import functions as F

    from elb_log_to_mysql_spark.operators import similarity

    spark = build_session(app_name="ann-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(emb_path).persist()
    emb.count()
    q = emb.filter(F.col("vec_id") < 20)

    report: dict = {
        "factor": factor,
        "vectors": n_vec,
        "queries": 20,
        "k": 10,
        "rerank_factor": "derived" if rerank_factor is None else rerank_factor,
        "adaptive_cut": bool(adaptive) if adaptive is not None else rerank_factor is None,
        "paths": {},
    }

    t0 = time.perf_counter()
    exact_rows = similarity.similarity_topk_bruteforce(emb, q, k=10).collect()
    exact = {(r.query_id, r.neighbor_id) for r in exact_rows}
    report["paths"]["bruteforce"] = {
        "wall_sec": round(time.perf_counter() - t0, 2),
        "pairs": len(exact),
    }

    t0 = time.perf_counter()
    codebooks = similarity.train_pq_codebooks(emb)
    train_wall = round(time.perf_counter() - t0, 2)

    if rerank_factor is None:
        # record what the default derivation sizes the shortlist to on
        # this corpus (the operators derive the depth internally too;
        # this duplicate agg just makes the controls visible in the
        # artifact). The qerr band is index-health REPORTING since r14
        # (the live cut is two-phase per-candidate — _shortlist_rerank).
        from elb_log_to_mysql_spark.functions.vectorops import (
            with_pq_index_cols,
        )

        idx = with_pq_index_cols(
            emb.select("vec_id", F.col("embedding").alias("_v")),
            "_v",
            codebooks,
            qerr=True,
            drop=("_v",),
        ).persist()
        depth, band = similarity.derive_pq_search_params(idx, 10)
        idx.unpersist()
        report["derived_depth"] = depth
        report["derived_qerr_band"] = round(band, 6)

    def admission_summary(stats_df) -> dict:
        """Collapse per-query admission telemetry into artifact cells
        (VERDICT r13 item 2: make the cut's admission observable)."""
        row = stats_df.agg(
            F.mean("admitted").alias("mean"),
            F.max("admitted").alias("max"),
            F.sum("cut_admitted").alias("cut_total"),
            F.sum("cap_dropped").alias("cap_dropped_total"),
            F.sum((F.col("cap_dropped") > 0).cast("long")).alias(
                "cap_hit_queries"
            ),
        ).first()
        return {
            "mean_admitted": round(float(row["mean"]), 1),
            "max_admitted": int(row["max"]),
            "cut_admitted_total": int(row["cut_total"]),
            "cap_dropped_total": int(row["cap_dropped_total"]),
            "cap_hit_queries": int(row["cap_hit_queries"]),
        }

    t0 = time.perf_counter()
    pq_out = similarity.similarity_topk_pq(
        emb, q, k=10, rerank_factor=rerank_factor, codebooks=codebooks,
        with_stats=True, adaptive=adaptive,
    )
    pq_df, pq_stats = pq_out
    pq_rows = pq_df.collect()
    pq_wall = round(time.perf_counter() - t0, 2)
    pq_set = {(r.query_id, r.neighbor_id) for r in pq_rows}
    report["paths"]["pq_adc"] = {
        "wall_sec": pq_wall,
        "codebook_train_sec": train_wall,
        "recall_at_10": round(len(exact & pq_set) / len(exact), 4),
        # collected AFTER the timed window (re-runs the ADC scan)
        "admission": admission_summary(pq_stats),
    }

    t0 = time.perf_counter()
    centroids = similarity.train_ivf_centroids(emb, n_centroids=64)
    ivf_train_wall = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ivfpq_df, ivfpq_stats = similarity.similarity_topk_ivfpq(
        emb, q, k=10, n_centroids=64, nprobe=8,
        rerank_factor=rerank_factor,
        centroids=centroids, codebooks=codebooks,
        with_stats=True, adaptive=adaptive,
    )
    ivfpq_rows = ivfpq_df.collect()
    ivfpq_wall = round(time.perf_counter() - t0, 2)
    ivfpq_set = {(r.query_id, r.neighbor_id) for r in ivfpq_rows}
    report["paths"]["ivfpq_64c_8probe"] = {
        "wall_sec": ivfpq_wall,
        "centroid_train_sec": ivf_train_wall,
        "scan_fraction": round(8 / 64, 3),
        "recall_at_10": round(len(exact & ivfpq_set) / len(exact), 4),
        "admission": admission_summary(ivfpq_stats),
    }

    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    with open(out_json, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
