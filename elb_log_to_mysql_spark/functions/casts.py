"""Permissive scalar casts with reference-parity semantics.

Reference semantics (/root/reference/etl_elb_log_to_mysql.py:43-50):

- ``to_int`` uses ``str.isdigit()``: only non-negative all-digit
  strings parse; ``"-1"``, ``"-"``, ``""`` -> 0.  ALB emits ``-1``/``-``
  sentinels on connection failures, so negative byte/status values are
  deliberately coerced to 0 — a bare Spark cast would give -1 instead.
- ``to_float`` is a plain float() with 0.0 fallback: ``-1`` passes
  through as -1.0 (so summed processing times can be negative).

Both are pure column expressions (whole-stage codegen, no Python),
and use try_-style constructs so they behave identically under ANSI.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DIGITS_ONLY = "^[0-9]+$"


def safe_int(col: Column | str) -> Column:
    """Digits-only cast to long; anything else (incl. ``-1``) -> 0."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.rlike(_DIGITS_ONLY), c.cast("long")).otherwise(F.lit(0))


def safe_float(col: Column | str) -> Column:
    """Cast to double; unparseable -> 0.0; negatives pass through."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("double"), F.lit(0.0))
