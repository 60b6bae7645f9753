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
    round-trip per group, single shuffle on user_id."""
    return events.select("user_id", "event_type", "value").groupBy(
        "user_id"
    ).applyInPandas(_profile_one, PROFILE_SCHEMA)
