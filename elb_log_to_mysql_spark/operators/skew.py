"""Skew-resilient aggregation via explicit salting.

A plain `groupBy(hot_key)` hashes every row of a hot key to ONE
reduce task; at 100 TB a single key holding 1% of the data serializes
1 TB through one core. Spark's partial (map-side) aggregation already
absorbs most of this for algebraic aggregates, and AQE splits skewed
*join* partitions — but a custom two-stage salted aggregation is the
portable fix when the combiner alone is not enough (e.g. heavy
per-group state, or a sink that itself keys on the group).

Stage 1 groups by (key, salt) — the hot key fans out over `n_salts`
reducers; stage 2 re-aggregates the tiny per-salt partials. Because
every partial is an exact decimal (functions/numeric.py), the
two-stage result is bit-identical to the one-stage plan, which is
what lets the oracle check it with a plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from elb_log_to_mysql_spark.functions.numeric import DET_DECIMAL


def salted_agg(
    df: DataFrame,
    key: str,
    value: Column | str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact sum/count/min/max of `value` per `key`, salted 2-stage.

    Deterministic: the salt derives from row content (hash of all
    columns), not rand(), so retried tasks land rows in the same
    bucket and the plan is replayable.
    """
    value = F.col(value) if isinstance(value, str) else value
    dec = value.cast(DET_DECIMAL)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(dec).alias("_psum"),
        F.count(F.lit(1)).alias("_pcnt"),
        F.min(value).alias("_pmin"),
        F.max(value).alias("_pmax"),
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").cast("double").alias("value_sum"),
        F.sum("_pcnt").alias("n_rows"),
        F.min("_pmin").alias("value_min"),
        F.max("_pmax").alias("value_max"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resilient equi-join WITHOUT relying on AQE's skew split:
    the big side fans each row to a content-derived salt, the small
    side replicates once per salt, and the join runs on (key, salt) —
    a hot key's rows spread over `n_salts` reduce tasks instead of
    serializing through one.

    This is the portable fix when AQE can't help (non-shuffle joins it
    won't split, writers keyed downstream, engines without runtime
    re-plan) and the explicit form of what AQE's OptimizeSkewedJoin
    does adaptively. Join-result equivalence: every big row meets
    every matching small row exactly once (the big row exists under
    ONE salt; the small side has exactly one replica with that salt),
    so the output multiset is identical to the plain join — which is
    exactly what the oracle checks. Cost: the small side is
    `n_salts`x duplicated — it must remain the SMALL side; salts are
    content-derived (not rand()), so retried tasks replay
    deterministically.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts))
    )
    salts = F.explode(
        F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)])
    )
    salted_small = small.withColumn("_salt", salts)
    out = salted_big.join(
        salted_small,
        (F.col(big_key) == F.col(small_key))
        & (salted_big["_salt"] == salted_small["_salt"]),
    )
    return out.drop("_salt")
