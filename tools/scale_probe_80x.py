"""80× scale probe for the SUBLINEAR family: one more doubling past
the 40× sweep, restricted to the operators whose 100 TB story is
"bucketed/linear, never quadratic" (SCALE.md evidence).

The full sweep's recall numbers need the exact-Jaccard truth set,
which is the quadratic verification twin — at 80× (400k docs on this
clone-dense replica) its candidate volume is ~8.9G rows and the
inverted join is GC-unstable past the budget (measured at 40×,
JACCARD_CROSSOVER_r08.json). So this probe deliberately does NOT
compute quadratic truth; instead it checks what IS checkable at any
scale, the way a 100 TB operator audit would:

- near_dedup_minhash: wall + pair count, PRECISION 1.0 by in-plan
  verification (every emitted pair carries its exact jaccard — assert
  min >= threshold), and a deterministic RECALL LOWER BOUND: the
  replica gives every base doc factor-1 byte-identical clones, so the
  found set must contain all n_base * C(factor, 2) clone pairs plus
  the factor^2-scaled images of every cross-base near pair found at
  the smaller factors.
- corpus_pipeline + curation_audit: wall (does the r8 persist fix
  hold through another doubling — linear, audit/pipeline ratio flat)
  + the DuckDB-free invariants (training order is a total
  permutation; audit.selected == pipeline output; per-stratum
  selection = min(quota, pool)).
- sessionize + streaming tumbling ≡ batch at 8M events.

Run with SPARK_DRIVER_MEMORY=48g (the 40×+ requirement from
SCALE.md). Usage: python tools/scale_probe_80x.py [factor] [out.json]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elb_log_to_mysql_spark.session import build_session  # noqa: E402
from elb_log_to_mysql_spark.sources.tables import load_table  # noqa: E402
from tools.scale_sweep import replicate, timed  # noqa: E402

SRC = "/root/testdata/sf0.1"


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    out_json = sys.argv[2] if len(sys.argv) > 2 else f"SCALE_PROBE_{factor}x.json"
    # optional section filter (re-measure one family without paying
    # for the others): any of near_dedup / corpus / event_time
    sections = set(sys.argv[3:]) or {"near_dedup", "corpus", "event_time"}
    out_dir = f"/tmp/scale_probe_{factor}x"

    spark = build_session(app_name=f"scale-probe-{factor}x")
    spark.sparkContext.setLogLevel("ERROR")

    from elb_log_to_mysql_spark.operators import dedup, pipeline, sessionize
    from elb_log_to_mysql_spark.sources.tables import raw_parquet_schema
    from elb_log_to_mysql_spark.streaming.windows import (
        ensure_event_time,
        run_stream_to_batch,
        tumbling_counts,
    )

    if not os.path.exists(os.path.join(out_dir, "documents.parquet")):
        shutil.rmtree(out_dir, ignore_errors=True)
        replicate(factor, out_dir)
    docs = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
    ev = load_table(spark, out_dir, "events")
    n_docs = docs.count()
    n_base = spark.read.parquet(os.path.join(SRC, "documents.parquet")).count()

    report: dict = {"factor": factor, "rows": {"documents": n_docs,
                                               "events": ev.count()}}

    # --- near_dedup at scale: precision in-plan, recall lower bound ---
    if "near_dedup" in sections:
        _near_dedup_section(report, dedup, docs, n_base, factor)
    if "corpus" in sections:
        _corpus_section(report, spark, pipeline, docs, n_docs, factor)
    if "event_time" in sections:
        _event_time_section(report, spark, sessionize, ev, out_dir,
                            raw_parquet_schema, run_stream_to_batch,
                            ensure_event_time, tumbling_counts)

    if os.path.exists(out_json) and sections != {
        "near_dedup", "corpus", "event_time"
    }:
        # sectioned re-measure: merge into the existing artifact
        with open(out_json) as f:
            prior = json.load(f)
        prior.update(report)
        report = prior
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


def _near_dedup_section(report, dedup, docs, n_base, factor):
    nd = dedup.near_dedup_minhash(docs, threshold=0.6).persist()
    n_nd, t_nd = timed(nd.count)
    min_j = nd.agg(F.min("jaccard")).first()[0]
    clone_floor = n_base * math.comb(factor, 2)
    # Heap-requirement model (dedup.sublinear_heap_requirement): every
    # probe artifact records what the formula PREDICTS this cell needs
    # next to what the JVM actually had — three probe points validated
    # it (SCALE.md round-10); a 100x user sizes executors from it.
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(F.split("text", r"\s+"))).alias("w"),
    ).first()
    required = dedup.sublinear_heap_requirement(
        stats["n"], float(stats["w"]), n_nd
    )
    heap = dedup._runtime_heap_bytes(docs.sparkSession)
    if heap < required:
        print(
            f"WARN near_dedup: live heap {heap >> 30} GiB below the "
            f"model's {required >> 30} GiB requirement — expect the "
            "spill/GC-thrash regime (JACCARD_CROSSOVER_r08 cliff)"
        )
    report["near_dedup"] = {
        "found_pairs": n_nd,
        "sec": t_nd,
        "min_emitted_jaccard": min_j,
        "precision_1": bool(min_j is not None and min_j >= 0.6),
        "clone_pair_floor": clone_floor,
        "floor_met": n_nd >= clone_floor,
        "heap_required_model_gib": round(required / (1 << 30), 2),
        "heap_live_gib": round(heap / (1 << 30), 2),
        "heap_headroom_ok": bool(heap >= required),
    }
    nd.unpersist()


def _corpus_section(report, spark, pipeline, docs, n_docs, factor):
    # --- corpus build: another doubling on the audit-knee fix ---
    # The benchmark is the PRODUCTION shape: a fixed external eval
    # suite (the base corpus's mod-97 residue), not the in-corpus
    # id-mod stand-in. Under clone replication the stand-in is
    # ill-posed: each base text has `factor` clones, so by 160x ~81%
    # of texts have a clone on the benchmark residue and their gram
    # sets poison the whole pool (measured: selected == 0). A real
    # corpus grows while its eval suite stays fixed — this replica
    # now models that.
    src_docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    bench = src_docs.filter((F.col("doc_id") % 97) == 0).select("text")
    cp_quotas = {"src0": 50, "src1": 220 * factor, "src2": 10**9}
    # Session pre-warm (round-11): compile the pipeline's codegen
    # classes + ramp JIT + start Arrow workers on a 20k-doc sample so
    # the measured cold cell is the data's cost, not the JVM's. The
    # pre-warm wall is recorded — the saving must net out.
    t_prewarm = pipeline.prewarm(
        spark,
        lambda d: pipeline.corpus_pipeline(d, cp_quotas, benchmark=bench),
        docs,
    )
    cp = pipeline.corpus_pipeline(docs, cp_quotas, benchmark=bench).persist()
    n_cp, t_cp = timed(cp.count)
    pos = cp.agg(F.min("pos"), F.max("pos"), F.count_distinct("pos")).first()
    perm_ok = pos[0] == 0 and pos[1] == n_cp - 1 and pos[2] == n_cp
    aud = pipeline.curation_audit(docs, cp_quotas, benchmark=bench).persist()
    n_aud, t_aud = timed(aud.count)
    sel = aud.filter("selected").select("doc_id")
    mismatch = (
        sel.join(cp.select("doc_id"), "doc_id", "left_anti").count()
        + cp.select("doc_id").join(sel, "doc_id", "left_anti").count()
    )
    pool = {
        r.source: r.n
        for r in aud.filter("dedup_survivor AND decontaminated")
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    picked = {
        r.source: r.n
        for r in cp.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    quota_ok = all(
        picked.get(s, 0) == min(cp_quotas.get(s, 0), p)
        for s, p in pool.items()
    )
    cp.unpersist(); aud.unpersist()
    # Steady-state rep: the first evaluation of the expression-dense
    # quality gate pays a session-scoped codegen/JIT warm-up that is
    # SCALE-INDEPENDENT (measured 218 s first vs 26 s repeat on the
    # identical query at 80x) — a long-running production job pays it
    # once per executor JVM. Drop the persisted id-sets (gc fires
    # unpersist_on_gc), then re-evaluate fresh frames warm: the warm
    # cell is the number that scales.
    import gc
    del cp, aud, sel
    gc.collect()
    n_cp2, t_cp_warm = timed(
        lambda: pipeline.corpus_pipeline(docs, cp_quotas, benchmark=bench)
        .count()
    )
    assert n_cp2 == n_cp
    report["corpus_build"] = {
        "selected": n_cp,
        "prewarm_sec": round(t_prewarm, 2),
        "corpus_pipeline_sec": t_cp,
        "corpus_pipeline_sec_warm": t_cp_warm,
        "cold_over_warm": round(t_cp / t_cp_warm, 2) if t_cp_warm else None,
        "curation_audit_sec": t_aud,
        "audit_over_pipeline": round(t_aud / t_cp, 2) if t_cp else None,
        "audit_covers_all_inputs": n_aud == n_docs,
        "training_order_is_permutation": bool(perm_ok),
        "audit_selected_equals_pipeline": mismatch == 0,
        "per_stratum_quota_exact": bool(quota_ok),
    }


def _event_time_section(report, spark, sessionize, ev, out_dir,
                        raw_parquet_schema, run_stream_to_batch,
                        ensure_event_time, tumbling_counts):
    # --- event time at 8M events: sessionize + stream ≡ batch ---
    n_sess, t_sess = timed(lambda: sessionize.sessionize(ev).count())
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
    report["event_time"] = {
        "sessions": n_sess, "sessionize_sec": t_sess,
        "stream_windows": streamed, "batch_windows": batch,
        "stream_equals_batch": streamed == batch,
    }


if __name__ == "__main__":
    main()
