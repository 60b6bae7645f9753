"""Vectorized-kernel equivalence: the Arrow/numpy kernels must agree
with their JVM higher-order-function reference implementations and
with plain Python oracles."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from elb_log_to_mysql_spark.functions.vectorops import (
    lsh_bucket_ids,
    minhash_signatures,
    pairwise_cosine,
)
from elb_log_to_mysql_spark.operators.similarity import _hyperplanes, lsh_bucket
from elb_log_to_mysql_spark.sources.tables import load_table


def test_lsh_bucket_ids_match_hof_reference(spark, sf_dir):
    """numpy matmul buckets == the per-plane JVM HOF buckets for every
    vector and table (sign boundaries are identical on this data)."""
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    planes = _hyperplanes(4, 4, 64)
    both = emb.select(
        "vec_id",
        lsh_bucket_ids(F.col("embedding"), planes).alias("fast"),
        F.array(
            *[lsh_bucket(F.col("embedding"), planes[t]) for t in range(4)]
        ).alias("ref"),
    ).collect()
    for r in both:
        assert list(r.fast) == list(r.ref), r.vec_id


def test_minhash_signatures_python_oracle(spark):
    """Kernel signatures equal a per-row pure-Python evaluation of the
    same multiply-shift family."""
    rows = [(1, [5, 17, 900]), (2, [123456789]), (3, list(range(50)))]
    df = spark.createDataFrame(rows, "doc_id long, shingles array<long>")
    got = {
        r.doc_id: list(r.sig)
        for r in df.select(
            "doc_id", minhash_signatures(F.col("shingles"), 8).alias("sig")
        ).collect()
    }
    rng = np.random.RandomState(42)
    a = (rng.randint(0, 2**63, size=8).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.randint(0, 2**63, size=8).astype(np.uint64)
    for doc_id, shingles in rows:
        expect = []
        for i in range(8):
            # the kernel mins in the unsigned domain, then reinterprets
            vals = [np.uint64(np.int64(s).view(np.uint64)) * a[i] + b[i] for s in shingles]
            expect.append(int(min(vals).view(np.int64)))
        assert got[doc_id] == expect, doc_id


def test_pairwise_cosine_python_oracle(spark):
    import math

    df = spark.createDataFrame(
        [([1.0, 0.0, 2.0], [0.5, 1.0, -1.0]), ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0])],
        "a array<double>, b array<double>",
    )
    got = [r.c for r in df.select(pairwise_cosine("a", "b").alias("c")).collect()]
    dot = 1 * 0.5 + 0 + 2 * -1
    exp = dot / (math.sqrt(5) * math.sqrt(2.25))
    assert abs(got[0] - exp) < 1e-12
    assert got[1] == 0.0  # zero vector guarded, not NaN


def test_pairwise_cosine_matches_jvm_reference(spark, sf_dir):
    """Arrow kernel vs the JVM HOF cosine expression: equal to 1e-12
    on real embeddings (summation order differs; ranks never flip at
    observed neighbor separations)."""
    from elb_log_to_mysql_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    a = emb.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("ida") == F.col("idb") - 1)
    both = pairs.select(
        pairwise_cosine("va", "vb").alias("fast"),
        cosine(F.col("va"), F.col("vb")).alias("ref"),
    ).collect()
    assert both
    for r in both:
        assert abs(r.fast - r.ref) < 1e-12
