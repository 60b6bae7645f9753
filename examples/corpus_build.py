"""Runnable front door for the corpus-curation pipeline.

`main.py` is the reference-parity ETL entrypoint (ELB logs → MySQL);
this is its twin for the LLM-corpus surface: point it at a documents
parquet (schema: doc_id BIGINT, text STRING, source STRING, ...) and
it runs the full five-stage build — Gopher quality gate → exact
fingerprint dedup → benchmark decontamination → exact-quota mixture →
deterministic global training order — and writes the selected corpus
(with `mix_rank` and `pos`) plus the per-document `curation_audit`
lineage table.

The whole build is a pure function of (input, quotas, salt): rerun it
anywhere, at any parallelism, and byte-identical selections come
back, so a cluster loss mid-build costs a rerun, never a divergence.

Usage:
    python examples/corpus_build.py \
        --input  /root/testdata/sf0.01/documents.parquet \
        --output /tmp/corpus_build \
        --quota  src0=12 --quota src1=8 --quota src3=100

Writes <output>/selection.parquet and <output>/audit.parquet.

Incremental (daily-cadence) mode: pass --existing with the accepted
pool from a previous run and --benchmark with the fixed eval-suite
parquet; --input is then the NEW ingest batch only. The batch is
curated against the pool (quality gate, within-batch + vs-pool exact
dedup, benchmark decontamination — all text-heavy work batch-scaled)
and the mixture + training order are re-derived over the updated
pool. <output>/pool.parquet is the updated accepted pool to feed the
next run. With id-ordered batches the selection is IDENTICAL to a
one-shot run over the union (the incremental_corpus_pipeline oracle
proves this per round).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elb_log_to_mysql_spark.operators.pipeline import (  # noqa: E402
    corpus_pipeline,
    curation_audit,
)
from elb_log_to_mysql_spark.session import build_session  # noqa: E402
from elb_log_to_mysql_spark.sources.tables import load_table  # noqa: E402


def parse_quota(kv: str) -> tuple[str, int]:
    name, _, n = kv.partition("=")
    if not n.isdigit():
        raise argparse.ArgumentTypeError(f"--quota wants name=N, got {kv!r}")
    return name, int(n)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument(
        "--quota", action="append", type=parse_quota, required=True,
        metavar="SOURCE=N", help="exact per-source doc quota (repeatable)",
    )
    ap.add_argument("--bench-mod", type=int, default=97)
    ap.add_argument("--ngram", type=int, default=5)
    ap.add_argument("--salt", default="seed42")
    ap.add_argument(
        "--existing", default=None,
        help="accepted-pool parquet from a previous run (incremental mode)",
    )
    ap.add_argument(
        "--benchmark", default=None,
        help="eval-suite parquet (required with --existing)",
    )
    args = ap.parse_args(argv)
    if (args.existing is None) != (args.benchmark is None):
        ap.error("--existing and --benchmark go together")
    quotas = dict(args.quota)

    spark = build_session(app_name="corpus-build")
    spark.sparkContext.setLogLevel("WARN")
    # the shared loader handles nanosecond-timestamp parquet and layout
    # quirks; fall back to a bare read for arbitrary user parquet
    try:
        sf_dir, name = os.path.split(args.input)
        docs = load_table(spark, sf_dir, name.removesuffix(".parquet"))
    except Exception:  # noqa: BLE001
        docs = spark.read.parquet(args.input)

    sel_path = os.path.join(args.output, "selection.parquet")
    if args.existing is not None:
        from elb_log_to_mysql_spark.operators.pipeline import (
            incremental_accept,
            incremental_corpus_pipeline,
        )

        pool = spark.read.parquet(args.existing)
        bench = spark.read.parquet(args.benchmark)
        accepted = incremental_accept(
            docs, pool, bench, ngram=args.ngram
        )
        # feed the already-built `accepted` plan in so the batch
        # curation (quality gate, dedup joins, decontamination) is
        # planned once for both the selection and the pool update
        selection = incremental_corpus_pipeline(
            docs, pool, bench, quotas, salt=args.salt, ngram=args.ngram,
            accepted=accepted,
        )
        # On a daily cadence --existing IS <output>/pool.parquet from
        # the previous run, and `pool`/`selection` read it lazily —
        # writing pool.parquet directly would overwrite an input of
        # its own plan. Materialize the selection first (it reads the
        # old pool), stage the updated pool beside it, then swap.
        pool_path = os.path.join(args.output, "pool.parquet")
        staging = pool_path + ".staging"
        selection.write.mode("overwrite").parquet(sel_path)
        pool.unionByName(accepted).write.mode("overwrite").parquet(staging)
        if os.path.exists(pool_path):
            shutil.rmtree(pool_path)
        os.replace(staging, pool_path)
        n_sel = spark.read.parquet(sel_path).count()
        n_pool = spark.read.parquet(pool_path).count()
        print(
            f"selected {n_sel} docs (pool now {n_pool}) -> {sel_path}; "
            f"next run: --existing {pool_path}"
        )
        spark.stop()
        return 0

    selection = corpus_pipeline(
        docs, quotas, bench_mod=args.bench_mod, ngram=args.ngram,
        salt=args.salt,
    )
    audit = curation_audit(
        docs, quotas, bench_mod=args.bench_mod, ngram=args.ngram,
        salt=args.salt,
    )
    audit_path = os.path.join(args.output, "audit.parquet")
    selection.write.mode("overwrite").parquet(sel_path)
    audit.write.mode("overwrite").parquet(audit_path)
    # Emit the incremental-cadence handoff alongside the selection:
    # pool.parquet is the one-shot ACCEPTED set (quality-kept dedup
    # survivors that cleared decontamination — exactly what folding
    # batches through incremental_accept converges to, per its
    # equivalence contract), with ORIGINAL document columns as the
    # pool schema requires; benchmark.parquet materializes the
    # bench_mod slice the bootstrap decontaminated against, so the
    # next run is simply:
    #   --existing <output>/pool.parquet --benchmark <output>/benchmark.parquet
    # Without these the advertised incremental mode had no entry
    # point from a bootstrap build.
    pool_path = os.path.join(args.output, "pool.parquet")
    bench_path = os.path.join(args.output, "benchmark.parquet")
    eligible = spark.read.parquet(audit_path).filter(
        "dedup_survivor AND decontaminated"
    ).select("doc_id")
    docs.join(eligible, "doc_id").write.mode("overwrite").parquet(pool_path)
    docs.filter(
        (F.col("doc_id") % args.bench_mod) == 0
    ).write.mode("overwrite").parquet(bench_path)
    n_sel = spark.read.parquet(sel_path).count()
    n_all = spark.read.parquet(audit_path).count()
    n_pool = spark.read.parquet(pool_path).count()
    print(
        f"selected {n_sel} of {n_all} docs -> {sel_path} "
        f"(pool {n_pool} -> {pool_path}; next run: --existing {pool_path} "
        f"--benchmark {bench_path})"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
