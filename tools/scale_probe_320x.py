"""320x-octave probe for the sublinear pair family (VERDICT r11
item 4): the next doubling past SCALE_PROBE_160x.json.

The clone-dense replica (tools/scale_sweep.replicate) gives every
base doc factor-1 byte-identical copies, so the TRUE pair output
itself grows quadratically in the factor: C(factor,2) x 5,000 base
docs = 255M exact-duplicate pairs at 320x. That is the adversarial
construction working as intended — and it means the honest scaling
law to check is "wall tracks candidates/output linearly" (the
sublinear claim is about CANDIDATE GENERATION never being corpus-
quadratic, not about the output of a quadratically-duplicated corpus
being small). Consequently each family runs at the largest octave
whose projected wall fits a single-box probe budget, with the
320x chooser/feasibility arithmetic recorded where execution would
be output-bound:

- near_dedup @ 320x (1.6M docs): the flagship cell — in-plan
  precision, clone-pair floor, and the sublinear_heap_requirement
  prediction vs the live JVM heap (the 100 TB executor-sizing
  formula, now at a 4th anchor).
- simhash_pairs @ 160x (800k docs; last measured 40x): clone-floor
  recall invariant (hamming-0 clone pairs must all surface under the
  density-derived cap), wall, and the heap-model prediction with
  est_pairs = emitted pairs (the dedup-shuffle volume term the 32
  B/pair calibration prices).
- ngram_jaccard_auto @ 80x (400k docs; last measured 40x): the
  chooser's stats-derived decision + execution of the chosen
  formulation, plus the CHOOSER-ONLY stats at 320x — est_pairs
  there (~143G candidate rows for the inverted form) prices the
  inverted join at ~4.3 TiB of shuffle by the 32 B/pair model,
  proving the chooser's refusal is load-bearing at the octave where
  executing either exact formulation is output-bound (projected
  ~255M output pairs, ~4 h single-box wall at the measured
  per-pair rate — a cluster-width job, not a probe).
- IVFPQ @ 320x runs separately via tools/ann_scale_probe.py 320
  (ANN_SCALE_PROBE_320x.json) — its replica is the noisy variant
  (genuine near-neighbors, non-degenerate top-k).

Run with SPARK_DRIVER_MEMORY=48g. Usage:
    python tools/scale_probe_320x.py [out.json] [section ...]
sections: near_dedup simhash ngram (default: all three).
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
# SPARK_GRAFT_PROBE_SCALE divides every octave (smoke-testing the
# tool at /8 or /16 before paying for the real run);
# SPARK_GRAFT_PROBE_F_<SECTION> pins one section's factor outright
# (e.g. F_SIMHASH=320 once the 160x cell proves the octave is cheap)
_DIV = int(os.environ.get("SPARK_GRAFT_PROBE_SCALE", "1"))
FACTORS = {
    k: int(os.environ.get(f"SPARK_GRAFT_PROBE_F_{k.upper()}", v // _DIV))
    for k, v in {
        "near_dedup": 320, "simhash": 160, "ngram": 80, "chooser": 320,
    }.items()
}
DOC_TABLES = {"documents"}


def _docs(spark, factor: int):
    out_dir = f"/tmp/scale_probe_docs_{factor}x"
    marker = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(marker):
        replicate(factor, out_dir, tables=DOC_TABLES)
    return spark.read.parquet(marker)


def _heap_cell(dedup, docs, est_pairs: int) -> dict:
    """The executor-sizing prediction vs the live JVM, recorded per
    cell (VERDICT r11 item 4)."""
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(F.split("text", r"\s+"))).alias("w"),
    ).first()
    required = dedup.sublinear_heap_requirement(
        stats["n"], float(stats["w"]), est_pairs
    )
    heap = dedup._runtime_heap_bytes(docs.sparkSession)
    return {
        "heap_required_model_gib": round(required / (1 << 30), 2),
        "heap_live_gib": round(heap / (1 << 30), 2),
        "heap_headroom_ok": bool(heap >= required),
    }


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE_320x.json"
    sections = set(sys.argv[2:]) or {"near_dedup", "simhash", "ngram"}

    spark = build_session(app_name="scale-probe-320x")
    spark.sparkContext.setLogLevel("ERROR")
    from elb_log_to_mysql_spark.operators import dedup

    n_base = spark.read.parquet(
        os.path.join(SRC, "documents.parquet")
    ).count()
    report: dict = {"factors": FACTORS, "base_docs": n_base}

    if "near_dedup" in sections:
        f = FACTORS["near_dedup"]
        docs = _docs(spark, f)
        nd = dedup.near_dedup_minhash(docs, threshold=0.6).persist()
        n_nd, t_nd = timed(nd.count)
        min_j = nd.agg(F.min("jaccard")).first()[0]
        nd.unpersist()
        clone_floor = n_base * math.comb(f, 2)
        report["near_dedup"] = {
            "factor": f,
            "docs": docs.count(),
            "found_pairs": n_nd,
            "sec": t_nd,
            "min_emitted_jaccard": min_j,
            "precision_1": bool(min_j is not None and min_j >= 0.6),
            "clone_pair_floor": clone_floor,
            "floor_met": n_nd >= clone_floor,
            # linearity vs the 160x anchor: pairs grow ~4x per
            # doubling on this replica, wall must track pairs
            "sec_per_mpair": round(t_nd / (n_nd / 1e6), 2),
            **_heap_cell(dedup, docs, n_nd),
        }
        _flush(report, out_json)

    if "simhash" in sections:
        f = FACTORS["simhash"]
        docs = _docs(spark, f)
        sp = dedup.simhash_near_pairs(docs).persist()
        n_sp, t_sp = timed(sp.count)
        max_h = sp.agg(F.max("hamming")).first()[0]
        sp.unpersist()
        clone_floor = n_base * math.comb(f, 2)
        key = "simhash" if f == 160 // _DIV else f"simhash_{f}x"
        report[key] = {
            "factor": f,
            "docs": docs.count(),
            "found_pairs": n_sp,
            "sec": t_sp,
            "max_emitted_hamming": max_h,
            "precision_1": bool(max_h is not None and max_h <= 3),
            "clone_pair_floor": clone_floor,
            "floor_met": n_sp >= clone_floor,
            "sec_per_mpair": round(t_sp / (n_sp / 1e6), 2),
            **_heap_cell(dedup, docs, n_sp),
        }
        _flush(report, out_json)

    if "ngram" in sections:
        f = FACTORS["ngram"]
        docs = _docs(spark, f)
        strategy, stats = dedup.choose_jaccard_strategy(docs)
        # run the chosen twin directly (ngram_jaccard_pairs_auto would
        # re-run the chooser's stats job we just timed separately)
        chosen_fn = (
            dedup.ngram_jaccard_pairs_prefix
            if strategy == "prefix"
            else dedup.ngram_jaccard_pairs
        )
        ng = chosen_fn(docs, threshold=0.5).persist()
        n_ng, t_ng = timed(ng.count)
        min_j = ng.agg(F.min("jaccard")).first()[0]
        ng.unpersist()
        clone_floor = n_base * math.comb(f, 2)
        cell = {
            "factor": f,
            "docs": docs.count(),
            "chooser": strategy,
            "chooser_stats": stats,
            "found_pairs": n_ng,
            "sec": t_ng,
            "min_emitted_jaccard": min_j,
            "precision_1": bool(min_j is not None and min_j >= 0.5),
            "clone_pair_floor": clone_floor,
            "floor_met": n_ng >= clone_floor,
            "sec_per_mpair": round(t_ng / (n_ng / 1e6), 2),
            **_heap_cell(dedup, docs, n_ng),
        }
        report["ngram_auto"] = cell
        # chooser-only arithmetic at 320x: the decision a 100 TB
        # deployment actually consumes at the octave where execution
        # is output-bound on one box
        docs320 = _docs(spark, FACTORS["chooser"])
        t0 = time.perf_counter()
        strategy320, stats320 = dedup.choose_jaccard_strategy(docs320)
        t_choose = round(time.perf_counter() - t0, 2)
        report["ngram_chooser_320x"] = {
            "factor": FACTORS["chooser"],
            "docs": docs320.count(),
            "chooser": strategy320,
            "chooser_stats": stats320,
            "chooser_sec": t_choose,
            "output_pair_floor": n_base * math.comb(FACTORS["chooser"], 2),
            "inverted_shuffle_tib_by_model": round(
                stats320.get("est_pairs", 0)
                * dedup._HEAP_BYTES_PER_PAIR / (1 << 40), 2
            ),
        }
        _flush(report, out_json)

    print(json.dumps(report, indent=1))
    spark.stop()


def _flush(report: dict, out_json: str) -> None:
    """Incremental write: a killed run keeps its finished sections."""
    if os.path.exists(out_json):
        with open(out_json) as fh:
            prior = json.load(fh)
        prior.update(report)
        report = {**prior, **report}
    with open(out_json, "w") as fh:
        json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
