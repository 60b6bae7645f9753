"""Grouped map operator (applyInPandas) — arbitrary per-group Python.

Spark's built-in aggregates cover algebraic functions; applyInPandas
is the escape hatch for holistic per-group computations (exact
medians, per-group model fits, custom resampling). Each group streams
to Python as ONE pandas frame via Arrow, so at scale the contract is:
group cardinality bounded (a group must fit in executor memory), and
the shuffle is the same single hash partition a groupBy would do.

The example profile keeps every output exactly checkable: counts are
ints and the median is over integer cents, whose midpoint average is
an exact double (x.0/x.5) — bit-equal to any engine's median.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_types", T.LongType()),
        T.StructField("median_cents", T.DoubleType()),
    ]
)


def _profile_one(pdf: pd.DataFrame) -> pd.DataFrame:
    cents = np.round(pdf["value"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(pdf)],
            "n_types": [pdf["event_type"].nunique()],
            "median_cents": [float(np.median(cents))],
        }
    )


def user_profile_groupmap(events: DataFrame) -> DataFrame:
    """Per-user profile with an exact (holistic) median — one Arrow
    round-trip per group, single shuffle on user_id.

    This is the applyInPandas DEMONSTRATOR. The production twin is
    `user_profile_builtin` (identical output): Spark's own exact
    `percentile` is also holistic but stays JVM-side
    (ObjectHashAggregate), with no Arrow transfer and no whole-group
    pandas materialization per task — reserve applyInPandas for logic
    built-ins genuinely can't express (model fits, custom resampling).
    """
    return events.select("user_id", "event_type", "value").groupBy(
        "user_id"
    ).applyInPandas(_profile_one, PROFILE_SCHEMA)


def user_profile_builtin(events: DataFrame) -> DataFrame:
    """The same per-user profile as pure built-in aggregates: count,
    distinct count, and exact median via `percentile(cents, 0.5)` over
    integer cents (midpoint of two ints is an exact double, so the
    result is bit-equal to the pandas twin and any engine's median)."""
    from pyspark.sql import functions as F

    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.select("user_id", "event_type", cents.alias("cents"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.percentile("cents", F.lit(0.5)).cast("double").alias("median_cents"),
        )
    )


def gini_udaf():
    """Custom aggregate (pandas grouped-agg UDF): Gini coefficient of
    integer cents per group.

    The UDAF surface the reference lacks entirely (SURVEY §2.1 "no
    UDAF/UDTF"). Exactness: values are integer cents, the formula is
    G = (2·Σ i·x_(i) ) / (n·Σx) - (n+1)/n over the sorted sample —
    both numerator sums are exact integers, so the one double division
    is bit-deterministic and oracle-checkable with window SQL.

    Race-class note: this is a GROUPED_AGG pandas UDF in aggregate
    position — it plans as its own AggregateInPandas physical
    operator, never as a PythonUDF expression inside a projection, so
    it is structurally outside the scalar-UDF concurrent-planning
    race the engine eliminated in rounds 12-13 (see
    functions/vectorops.py module docstring).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _gini(value: pd.Series) -> float:
        cents = np.sort(
            np.round(value.to_numpy(dtype=np.float64) * 100).astype(np.int64)
        )
        n = len(cents)
        total = int(cents.sum())
        if n == 0 or total == 0:
            return 0.0
        weighted = int((np.arange(1, n + 1, dtype=np.int64) * cents).sum())
        return (2.0 * weighted) / (n * total) - (n + 1.0) / n

    return _gini


def gini_by_type(events: DataFrame) -> DataFrame:
    """Per-event-type value inequality via the custom UDAF — one
    shuffle, partial-agg-free (holistic aggregate: Spark ships each
    group's values to one reducer, which is the UDAF contract).

    Spark refuses to mix pandas grouped-agg UDFs with JVM aggregates
    in one agg(), so the row count rides as a second pandas UDAF.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _n(value: pd.Series) -> int:
        return len(value)

    return events.groupBy("event_type").agg(
        _n(F.col("value")).alias("n_events"),
        gini_udaf()(F.col("value")).alias("gini_cents"),
    )
