"""Vectorized-kernel equivalence: the Arrow/numpy mapInPandas stages
must agree with their JVM higher-order-function reference
implementations and with plain Python oracles."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from elb_log_to_mysql_spark.functions.vectorops import (
    minhash_sig_rows,
    with_lsh_buckets,
    with_pairwise_cosine,
)
from elb_log_to_mysql_spark.operators.similarity import _hyperplanes, lsh_bucket
from elb_log_to_mysql_spark.sources.tables import load_table


def test_lsh_bucket_stage_matches_hof_reference(spark, sf_dir):
    """numpy matmul buckets == the per-plane JVM HOF buckets for every
    vector and table (sign boundaries are identical on this data)."""
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    planes = _hyperplanes(4, 4, 64)
    both = (
        with_lsh_buckets(emb.select("vec_id", "embedding"), "embedding", planes)
        .select(
            "vec_id",
            F.col("_bks").alias("fast"),
            F.array(
                *[lsh_bucket(F.col("embedding"), planes[t]) for t in range(4)]
            ).alias("ref"),
        )
        .collect()
    )
    for r in both:
        assert list(r.fast) == list(r.ref), r.vec_id


def test_minhash_sig_rows_python_oracle(spark):
    """Signer-stage signatures equal a per-row pure-Python evaluation
    of the same multiply-shift family."""
    rows = [(1, [5, 17, 900]), (2, [123456789]), (3, list(range(50)))]
    df = spark.createDataFrame(rows, "doc_id long, shingles array<long>")
    got = {
        r.doc_id: list(r.sig)
        for r in minhash_sig_rows(df, num_hashes=8).collect()
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
    got = [
        r.c
        for r in with_pairwise_cosine(df, "a", "b", out="c").collect()
    ]
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
    both = with_pairwise_cosine(pairs, "va", "vb", out="fast").select(
        "fast",
        cosine(F.col("va"), F.col("vb")).alias("ref"),
    ).collect()
    assert both
    for r in both:
        assert abs(r.fast - r.ref) < 1e-12


def test_no_scalar_pandas_udf_in_expression_position():
    """The round-13 structural invariant: ZERO scalar pandas UDFs in
    the package. Every Arrow kernel is a mapInPandas/mapInArrow stage
    (its own physical operator); the only remaining @pandas_udf
    decorations are GROUPED_AGG aggregates (operators/groupmap.py),
    which plan as AggregateInPandas, never as a projection
    expression — so the concurrent-planning codegen-fallback race
    (THROUGHPUT_r11 known_flake) is structurally impossible
    engine-wide."""
    import pathlib
    import re

    import elb_log_to_mysql_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    offenders = []
    for path in root.rglob("*.py"):
        text = path.read_text()
        for m in re.finditer(r"@pandas_udf\(", text):
            # the decorated function's return annotation decides the
            # eval type: Series -> scalar (forbidden), scalar -> agg
            tail = text[m.end() : m.end() + 400]
            if "-> pd.Series" in tail or "-> pd.DataFrame" in tail:
                offenders.append(str(path.relative_to(root)))
    assert offenders == [], offenders


def test_arrow_stage_rejects_output_name_collisions(spark):
    """ADVICE r13: an arrow_stage output name shadowing a surviving
    input column must fail loudly at plan-build time, not as an
    executor-side Arrow column-count mismatch."""
    import pytest

    from elb_log_to_mysql_spark.functions.vectorops import arrow_stage

    df = spark.range(4).select(
        F.col("id"), F.array(F.lit(1.0), F.lit(2.0)).alias("v")
    )
    with pytest.raises(ValueError, match="collide with"):
        arrow_stage(df, [("v", "double", lambda pdf: [0.0] * len(pdf))])
    with pytest.raises(ValueError, match="duplicate output"):
        arrow_stage(
            df,
            [
                ("a", "double", lambda pdf: [0.0] * len(pdf)),
                ("a", "double", lambda pdf: [1.0] * len(pdf)),
            ],
        )
    # dropping the consumed input clears the collision
    ok = arrow_stage(
        df, [("v", "double", lambda pdf: [0.0] * len(pdf))], drop=("v",)
    )
    assert ok.columns == ["id", "v"]
    assert ok.count() == 4
