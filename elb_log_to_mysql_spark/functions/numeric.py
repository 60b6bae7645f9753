"""Deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent; on a distributed engine the
combine order varies run to run and differs from any single-node
oracle. For every double aggregate the engine therefore sums an exact
DECIMAL image of the per-row value and converts once at the end:

    CAST(SUM(CAST(expr AS DECIMAL(28,8))) AS DOUBLE)

Decimal addition is associative/commutative, so the result is
bit-identical regardless of partitioning, parallelism, or AQE
re-planning — and matches a DuckDB oracle evaluating the same
expression. The per-row double->decimal rounding (8 dp) is itself
deterministic. This is the engine-wide contract for reproducible
aggregates at 1000-executor scale, not a test convenience.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DET_DECIMAL = "decimal(28,8)"

# SQL-text twin of dsum for oracle strings.
#
# The oracle's final decimal->double hop goes THROUGH a string:
# DuckDB's direct DECIMAL(28,8)->DOUBLE cast double-rounds once the
# scaled int128 exceeds 2^53 (observed: 5240486462.58993500 at sf0.1
# converts one ulp off), while decimal->string is exact and
# string->double is correctly rounded — matching Spark's
# BigDecimal.doubleValue(), which rounds correctly from the exact
# decimal. STRING (not VARCHAR) because a few queries reuse this
# template as Spark SQL text, and STRING parses in BOTH dialects;
# the detour is value-neutral on the Spark side.
DSUM_SQL = "CAST(CAST(SUM(CAST({expr} AS DECIMAL(28,8))) AS STRING) AS DOUBLE)"
DAVG_SQL = (
    "CAST(CAST(SUM(CAST({expr} AS DECIMAL(28,8))) AS STRING) AS DOUBLE) / COUNT(*)"
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Order-independent double sum (exact decimal internally)."""
    return F.sum(_c(col).cast(DET_DECIMAL)).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic mean: exact decimal sum, one double division."""
    return dsum(col) / F.count(F.lit(1))
