"""Concurrent-stream throughput harness (TPC-style throughput test).

A single-stream bench measures latency; a cluster serves many users.
This runs the headline query set as N concurrent streams (threads
sharing one SparkSession — Spark schedules their jobs FIFO across the
shared executor pool) and reports the throughput ratio:

    sequential_total / concurrent_wall  ≈ effective parallel speedup

A ratio near N means queries interleave cleanly (no driver-side
serialization, no contended broadcast/cache locks); a ratio near 1
means something serializes the streams. Streams run DISJOINT query
orders (stream i starts at offset i·|Q|/N) so identical stages don't
artificially share scan caches at the same instant.

Both passes run fully WARM: an untimed full pass over the headline
set precedes the sequential reference, so neither measurement pays
codegen/JIT, parquet-footer, or Python-worker startup — without it
the sequential pass runs cold and the speedup is overstated.

Usage: python tools/throughput.py [streams] [out.json]
Writes {"streams": N, "sequential_sec": S, "concurrent_sec": C,
        "work_speedup": completed_work_fraction*N*S/C,
        "per_stream_completed": [...], "errors": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, OVERRIDES, materialize  # noqa: E402
from elb_log_to_mysql_spark.queries import QUERIES  # noqa: E402
from elb_log_to_mysql_spark.session import build_session  # noqa: E402


def run_stream(spark, sf_dir, order, errors, idx, completed=None):
    done = 0
    try:
        for name in order:
            fn = OVERRIDES.get(name, QUERIES[name])
            materialize(fn(spark, sf_dir))
            done += 1
    except Exception as ex:  # noqa: BLE001 — record, don't kill the run
        errors[idx] = f"{type(ex).__name__}: {ex}"[:200]
    finally:
        if completed is not None:
            completed[idx] = done


def main() -> None:
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_json = sys.argv[2] if len(sys.argv) > 2 else "THROUGHPUT.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = build_session(app_name="throughput")
    spark.sparkContext.setLogLevel("ERROR")

    # full untimed warm pass: EVERY headline query compiles its plan,
    # reads its footers, and forks its Python workers here, so the
    # sequential reference and the concurrent pass are equally warm
    # (a cold sequential pass inflates the speedup)
    warm_errors: dict[int, str] = {}
    run_stream(spark, sf_dir, HEADLINE, warm_errors, 0)

    # sequential reference: one pass over the headline set
    t0 = time.perf_counter()
    seq_errors: dict[int, str] = {}
    run_stream(spark, sf_dir, HEADLINE, seq_errors, 0)
    sequential = time.perf_counter() - t0

    # concurrent: N streams, rotated orders, shared session
    errors: dict[int, str] = {}
    completed: dict[int, int] = {}
    threads = []
    t0 = time.perf_counter()
    for i in range(n_streams):
        off = i * len(HEADLINE) // n_streams
        order = HEADLINE[off:] + HEADLINE[:off]
        t = threading.Thread(
            target=run_stream, args=(spark, sf_dir, order, errors, i, completed)
        )
        t.start()
        threads.append(t)
    for t in threads:
        t.join()
    concurrent = time.perf_counter() - t0
    # credit only COMPLETED work: an aborted stream must not inflate
    # the speedup next to its error record
    work_fraction = sum(completed.values()) / (n_streams * len(HEADLINE))

    report = {
        "streams": n_streams,
        "queries_per_stream": len(HEADLINE),
        "sf_dir": sf_dir,
        "sequential_sec": round(sequential, 2),
        "concurrent_sec": round(concurrent, 2),
        # speedup credits only completed work across the N streams
        "work_speedup": round(
            work_fraction * n_streams * sequential / concurrent, 2
        ),
        "per_stream_completed": [completed.get(i, 0) for i in range(n_streams)],
        "errors": {**{f"warm{k}": v for k, v in warm_errors.items()},
                   **{f"seq{k}": v for k, v in seq_errors.items()},
                   **{f"s{k}": v for k, v in errors.items()}},
    }
    with open(out_json, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
