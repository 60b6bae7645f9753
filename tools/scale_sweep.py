"""Reproducible scale sweep: replicate the sf0.1 tables Nx and verify
the document/embedding/event operator families at the larger size —
correctness first (exact twins must still agree bit-for-bit), wall
time second.

Round 3 ran this as an ad-hoc probe; this committed version makes the
evidence regenerable against whatever testdata layout the driver
ships. The replica is written with ~16 MB parquet row groups (the
row-group-size finding from SCALE.md: single-group files pin scans to
one task), and foreign keys are shifted consistently per replica so
cross-replica ids never collide.

Note the replica corpus is EXTREMELY duplicate-dense by construction
(every document gains factor-1 exact copies under different ids) —
deliberately so: it is the adversarial case for pair-generation
operators, where the inverted-index exact join blows up and the
prefix-filtered / LSH paths must hold.

Checks (all Spark-side, engine-vs-engine — no DuckDB in the loop, so
the sweep measures the operators, not the single-node oracle):

- ngram_jaccard_pairs == ngram_jaccard_pairs_prefix (exact set +
  value equality via bidirectional anti-joins) + both wall times
- near_dedup_minhash ⊆/⊇ exact Jaccard pairs at its threshold
- simhash recall of near-identical (exact j>=0.9) pairs
- similarity LSH/IVF recall vs brute-force exact top-k
- sessionize + streaming tumbling counts vs the batch twin

Usage: python tools/scale_sweep.py [factor] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elb_log_to_mysql_spark.session import build_session  # noqa: E402
from elb_log_to_mysql_spark.sources.tables import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"


def replicate(factor: int, out_dir: str, tables: set[str] | None = None) -> None:
    """Concat `factor` key-shifted copies of each table (pyarrow:
    preserves the source's physical layouts, e.g. events' naive-µs ts,
    so the replica stresses the same loader paths the real testdata
    does) and write ONE file per table with ~32 row groups, so scans
    parallelize AND DuckDB's single-file view pattern still works.

    Fact tables replicate with their own keys shifted while dimension
    foreign keys stay UNSHIFTED (10× orders still point at the same
    customers/suppliers/parts): that is how fact growth actually looks
    — dimensions grow far slower than facts — and it keeps every
    referential query valid against the original dimensions, which are
    copied through as-is. l_orderkey and o_orderkey shift by the same
    offset so the order⋈lineitem relationship is preserved per replica.

    `tables` restricts which FACT tables are replicated (default: all
    five) — a probe that only reads documents/embeddings/events should
    not pay the pyarrow concat RAM for a 320x lineitem it never scans.
    Dimensions are always copied through.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    order_max = (
        pc.max(pq.read_table(os.path.join(SRC, "orders.parquet"),
                             columns=["o_orderkey"])["o_orderkey"]).as_py() + 1
    )
    specs = {
        "documents": {"doc_id": None},
        "embeddings": {"vec_id": None},
        "events": {"event_id": None, "user_id": None},
        "orders": {"o_orderkey": order_max},
        "lineitem": {"l_orderkey": order_max},
    }
    if tables is not None:
        specs = {n: k for n, k in specs.items() if n in tables}
    for name, keys in specs.items():
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        offs = {
            k: (off if off is not None else pc.max(t[k]).as_py() + 1)
            for k, off in keys.items()
        }
        parts = []
        for i in range(factor):
            cols = {c: t[c] for c in t.column_names}
            for k in keys:
                cols[k] = pc.add(t[k], i * offs[k])
            parts.append(pa.table(cols))
        big = pa.concat_tables(parts)
        pq.write_table(
            big,
            os.path.join(out_dir, f"{name}.parquet"),
            row_group_size=max(len(big) // 32, 10_000),
        )
    for dim in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(
            os.path.join(SRC, f"{dim}.parquet"),
            os.path.join(out_dir, f"{dim}.parquet"),
        )


def timed(fn):
    t0 = time.perf_counter()
    r = fn()
    return r, round(time.perf_counter() - t0, 2)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_json = sys.argv[2] if len(sys.argv) > 2 else f"SCALE_SWEEP_{factor}x.json"
    out_dir = f"/tmp/scale_sweep_{factor}x"

    spark = build_session(app_name="scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    from elb_log_to_mysql_spark.operators import dedup, sessionize, similarity
    from elb_log_to_mysql_spark.streaming.windows import (
        ensure_event_time,
        run_stream_to_batch,
        tumbling_counts,
    )
    from elb_log_to_mysql_spark.sources.tables import raw_parquet_schema

    if not os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
        shutil.rmtree(out_dir, ignore_errors=True)  # stale partial replica
        replicate(factor, out_dir)
    docs = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(out_dir, "embeddings.parquet"))
    ev = load_table(spark, out_dir, "events")

    report: dict = {"factor": factor, "rows": {
        "documents": docs.count(), "embeddings": emb.count(), "events": ev.count()
    }}

    # --- exact Jaccard: inverted index vs prefix filter ---
    # persist() is lazy: time the materializing count, which executes
    # the full plan into the cache the comparison joins then reuse.
    inv = dedup.ngram_jaccard_pairs(docs, threshold=0.5).persist()
    n_inv, t_inv = timed(inv.count)
    pref = dedup.ngram_jaccard_pairs_prefix(docs, threshold=0.5).persist()
    n_pref, t_pref = timed(pref.count)
    only_inv = inv.join(pref, ["doc_id_a", "doc_id_b", "jaccard"], "left_anti").count()
    only_pref = pref.join(inv, ["doc_id_a", "doc_id_b", "jaccard"], "left_anti").count()
    report["ngram_exact"] = {
        "pairs": n_inv,
        "inverted_index_sec": t_inv,
        "prefix_filter_sec": t_pref,
        "set_equal": only_inv == 0 and only_pref == 0 and n_inv == n_pref,
    }
    inv.unpersist()

    # --- MinHash-LSH vs exact at its own threshold ---
    ex06 = dedup.ngram_jaccard_pairs(docs, threshold=0.6).persist()
    n_ex06 = ex06.count()
    nd = dedup.near_dedup_minhash(docs, threshold=0.6).persist()
    n_nd, t_nd = timed(nd.count)
    nd_missing = ex06.join(nd, ["doc_id_a", "doc_id_b"], "left_anti").count()
    nd_extra = nd.join(ex06, ["doc_id_a", "doc_id_b"], "left_anti").count()
    report["near_dedup"] = {
        "exact_pairs": n_ex06, "found": n_nd, "sec": t_nd,
        "recall": round(1 - nd_missing / n_ex06, 4) if n_ex06 else 1.0,
        "false_pairs": nd_extra,
    }
    nd.unpersist()

    # --- SimHash recall of near-identical pairs ---
    ex09 = dedup.ngram_jaccard_pairs(docs, threshold=0.9).persist()
    n_ex09 = ex09.count()
    sim = dedup.simhash_near_pairs(docs, max_hamming=6).persist()
    _, t_sim = timed(sim.count)
    sim_hit = ex09.join(sim, ["doc_id_a", "doc_id_b"], "left_semi").count()
    # Candidate volume: the quantities the key-widening (block-pair
    # join) and bucket cap bound — raw join rows are the physical
    # work, distinct pairs are the verification input (round 4: 7×
    # emitted blowup; narrow single-block keys: 17M join rows here).
    cand, cand_fp = dedup.simhash_candidates(docs, max_hamming=6)
    n_rows, t_cand = timed(cand.count)
    n_pairs = cand.dropDuplicates(["doc_id_a", "doc_id_b"]).count()
    cand_fp.unpersist()
    report["simhash"] = {
        "exact_j09_pairs": n_ex09, "found": sim.count(), "sec": t_sim,
        "recall": round(sim_hit / n_ex09, 4) if n_ex09 else 1.0,
        "candidate_join_rows": n_rows,
        "candidate_pairs": n_pairs,
        "candidate_blowup_vs_true": (
            round(n_pairs / n_ex09, 2) if n_ex09 else None
        ),
        # the operator's own output (all pairs at hamming<=6) is the
        # fair denominator: j>=0.9 pairs are a far narrower target
        # than the hamming ball on a templated corpus
        "candidate_pairs_per_found": (
            round(n_pairs / sim.count(), 2) if sim.count() else None
        ),
    }
    sim.unpersist()

    # The round-6 `simhash_scaled_cap` row is retired: the operator
    # now derives the cap from the exact-fingerprint duplication
    # histogram by default (max(300, 50 x max multiplicity),
    # dedup.py:simhash_candidates), so the default-config row above
    # IS the density-scaled measurement. A constant-cap row remains
    # useful only as the starvation counterexample:
    sim2 = dedup.simhash_near_pairs(
        docs, max_hamming=6, max_bucket=300
    ).persist()
    n_sim2, t_sim2 = timed(sim2.count)
    sim2_hit = ex09.join(sim2, ["doc_id_a", "doc_id_b"], "left_semi").count()
    report["simhash_constant_cap_300"] = {
        "max_bucket": 300,
        "found": n_sim2,
        "sec": t_sim2,
        "recall": round(sim2_hit / n_ex09, 4) if n_ex09 else 1.0,
        "note": "starvation control; default derives the cap in-plan",
    }
    sim2.unpersist()
    ex06.unpersist()
    ex09.unpersist()

    # --- ANN recall at the larger corpus ---
    q = emb.filter(F.col("vec_id") < 20)
    exact_tk, t_bf = timed(
        lambda: {
            (r.query_id, r.neighbor_id)
            for r in similarity.similarity_topk_bruteforce(emb, q, k=10).collect()
        }
    )
    lsh, t_lsh = timed(
        lambda: {
            (r.query_id, r.neighbor_id)
            for r in similarity.similarity_topk_lsh(
                emb, q, k=10, n_planes=3, n_tables=24
            ).collect()
        }
    )
    cents = similarity.train_ivf_centroids(emb)
    ivf, t_ivf = timed(
        lambda: {
            (r.query_id, r.neighbor_id)
            for r in similarity.similarity_topk_ivf(
                emb, q, k=10, nprobe=12, centroids=cents
            ).collect()
        }
    )
    report["similarity"] = {
        "corpus": report["rows"]["embeddings"],
        "bruteforce_sec": t_bf,
        "lsh_sec": t_lsh, "lsh_recall": round(len(lsh & exact_tk) / len(exact_tk), 4),
        "ivf_sec": t_ivf, "ivf_recall": round(len(ivf & exact_tk) / len(exact_tk), 4),
    }

    # --- corpus-curation family at the replica ---
    from elb_log_to_mysql_spark.operators import pipeline, textops
    from elb_log_to_mysql_spark.operators.clustering import kmeans_embeddings

    # stratum size scales with the replication factor (25 docs/source
    # at sf0.01): derive quotas so "exact count" and "whole stratum"
    # regimes are both exercised at ANY factor
    quotas = {"src0": 4 * factor, "src1": factor + 5, "src2": 25 * factor}
    mix, t_mix = timed(
        lambda: {
            r.source: r.n
            for r in pipeline.mixture_sample(docs, "source", "doc_id", quotas)
            .groupBy("source")
            .agg(F.count("*").alias("n"))
            .collect()
        }
    )
    ov = pipeline.source_overlap(docs, ngram=5).persist()
    n_ov, t_ov = timed(ov.count)
    ov_bad = ov.filter(
        (F.col("containment") < 0) | (F.col("containment") > 1)
        | (F.col("n_shared") > F.least("n_grams_a", "n_grams_b"))
    ).count()
    ov.unpersist()
    prev = textops.unigram_prevalence(docs).persist()
    n_prev, t_prev = timed(prev.count)
    prev_bad = prev.filter(
        (F.col("min_freq") < 1) | (F.col("sum_freq") < F.col("n_tokens"))
    ).count()
    prev.unpersist()
    km = kmeans_embeddings(emb, k=8, iterations=2).persist()
    n_km, t_km = timed(km.count)
    km_sizes = {
        r.cluster_id: r.n
        for r in km.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    km.unpersist()
    report["curation"] = {
        "mixture_sec": t_mix,
        "mixture_counts_exact": mix == quotas,
        "source_overlap_pairs": n_ov, "source_overlap_sec": t_ov,
        "source_overlap_invariant_violations": ov_bad,
        "unigram_docs": n_prev, "unigram_sec": t_prev,
        "unigram_invariant_violations": prev_bad,
        "kmeans_rows": n_km, "kmeans_sec": t_km,
        "kmeans_total_assigned": sum(km_sizes.values()),
        "kmeans_nonempty_clusters": len(km_sizes),
    }

    # --- flagship end-to-end corpus build at the replica ---
    # The heaviest plan in the registry (quality gate -> exact dedup
    # -> decontamination -> exact-quota mixture -> global order) plus
    # its lineage twin, exercised at replica volume with invariant
    # checks that don't depend on DuckDB: the training order must be
    # a total permutation, the audit's `selected` set must equal the
    # pipeline's output set, and per-stratum selection must be
    # exactly min(quota, eligible pool). Quotas span both regimes at
    # any factor: src0 is quota-CUT (the replica is duplicate-dense,
    # so exact dedup collapses each source's pool back to ~250 — a
    # fixed quota of 50 stays below it), src1 whole-stratum via a
    # factor-scaled quota, src2 whole-stratum via an unbounded one.
    cp_quotas = {"src0": 50, "src1": 220 * factor, "src2": 10**9}
    cp = pipeline.corpus_pipeline(docs, cp_quotas).persist()
    n_cp, t_cp = timed(cp.count)
    pos_stats = cp.agg(
        F.min("pos"), F.max("pos"), F.count_distinct("pos")
    ).first()
    perm_ok = (
        pos_stats[0] == 0
        and pos_stats[1] == n_cp - 1
        and pos_stats[2] == n_cp
    )
    aud = pipeline.curation_audit(docs, cp_quotas).persist()
    n_aud, t_aud = timed(aud.count)
    sel = aud.filter("selected").select("doc_id")
    sel_vs_cp_mismatch = (
        sel.join(cp.select("doc_id"), "doc_id", "left_anti").count()
        + cp.select("doc_id").join(sel, "doc_id", "left_anti").count()
    )
    pool_counts = {
        r.source: r.pool
        for r in aud.filter("dedup_survivor AND decontaminated")
        .groupBy("source")
        .agg(F.count("*").alias("pool"))
        .collect()
    }
    sel_counts = {
        r.source: r.n
        for r in cp.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    quota_ok = all(
        sel_counts.get(src, 0) == min(cp_quotas.get(src, 0), pool)
        for src, pool in pool_counts.items()
    )
    cp.unpersist()
    aud.unpersist()
    report["corpus_build"] = {
        "quotas": cp_quotas,
        "input_docs": report["rows"]["documents"],
        "selected": n_cp,
        "corpus_pipeline_sec": t_cp,
        "curation_audit_sec": t_aud,
        "audit_rows": n_aud,
        "audit_covers_all_inputs": n_aud == report["rows"]["documents"],
        "training_order_is_permutation": bool(perm_ok),
        "audit_selected_equals_pipeline": sel_vs_cp_mismatch == 0,
        "per_stratum_selected_is_min_quota_pool": bool(quota_ok),
    }

    # --- event-time: sessionize + streaming twin on the replica ---
    sess, t_sess = timed(lambda: sessionize.sessionize(ev).count())
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .count()
    )
    schema = raw_parquet_schema(spark, os.path.join(out_dir, "events.parquet"))
    streamed = run_stream_to_batch(
        spark,
        os.path.join(out_dir, "events.parquet"),
        lambda s: tumbling_counts(ensure_event_time(s)),
        schema,
    ).count()
    report["events"] = {
        "sessions": sess, "sessionize_sec": t_sess,
        "stream_windows": streamed, "batch_windows": batch,
        "stream_equals_batch": streamed == batch,
    }

    spark.stop()

    # --- DuckDB oracle parity at the replica for the relational core ---
    # Run AFTER the sweep session stops (compare_oracle builds its own
    # session; two concurrent local[32] JVMs would fight for memory and
    # race on the shared warehouse dir). This re-proves the driver-gate
    # contract — row count + schema + stringified value hash — at 10×
    # fact volume, not just at the sf0.01 audit scale.
    import subprocess
    import tempfile

    parity_queries = [
        "hash_agg", "tpch_q3", "tpch_q9", "tpch_q21", "window_analytic",
        "asof_join", "range_join", "skew_salted_agg", "scalar_subquery",
        "topk_per_group", "exact_dedup", "incremental_agg", "sessionize",
        "window_distribution",
        # analytics battery at 10x fact volume (small outputs only:
        # rolling_median's 10M-row result and the near-complete
        # co-supply triangle join are excluded from the PARITY list —
        # collect-size and oracle-side cost, not operator concerns)
        "funnel_analysis", "retention_cohorts", "anomaly_zscore",
        "scd1_merge", "data_profile", "pagerank_parts",
        # round-5 corpus-curation family: value-parity at 10x, not
        # just the invariant checks above
        "mixture_sample", "source_overlap", "unigram_prevalence",
        "kmeans_embeddings",
        # round-8 additions: the LM gate (Zipf-skew join family),
        # the parse-chain dashboard rollup (synthetic-input, but its
        # one-exchange window+agg plan runs here under replica
        # parallelism), and both budgeted-mix stages (stratified
        # bucketed rank/cumsum at 10x stratum volume)
        "lm_perplexity_filter", "elb_url_stats", "domain_cap",
        "token_budget_sample",
    ]
    if factor <= 10:
        # Full-chain SQL replays of the flagship build (and its
        # incremental twin, whose Spark side runs the two-batch
        # composition): the DuckDB side recomputes the five-stage
        # chain over the whole replica — affordable at 10x; at 40x
        # the invariant checks in report["corpus_build"] carry the
        # evidence instead.
        parity_queries += [
            "corpus_pipeline", "curation_audit",
            "incremental_corpus_pipeline",
        ]
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        parity_path = tf.name
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__).replace(
                "scale_sweep.py", "compare_oracle.py"),
             "--json", parity_path, out_dir, *parity_queries],
            capture_output=True, text=True, timeout=1800,
        )
    except subprocess.TimeoutExpired:
        # A hung parity subprocess must not discard the sweep results
        # computed above — record the timeout and fall through to the
        # report write.
        proc = None
    try:
        with open(parity_path) as fh:
            parity = json.load(fh)
        # The r8 _freshness meta record marks SUBSET runs incomplete
        # (by design here: the sweep checks its parity list, not the
        # whole registry) — it is coverage metadata, not a parity row.
        parity.pop("_freshness", None)
        report["oracle_parity"] = {
            "all_hash_match": all(v.get("hash_match") for v in parity.values()),
            "queries": {k: bool(v.get("hash_match")) for k, v in parity.items()},
        }
    except Exception:
        report["oracle_parity"] = {
            "all_hash_match": False,
            "error": "parity subprocess timed out (1800s)" if proc is None
            else (proc.stdout + proc.stderr)[-500:],
        }
    finally:
        os.unlink(parity_path)

    with open(out_json, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
