"""Safe-cast parity with the reference's to_int/to_float semantics
(/root/reference/etl_elb_log_to_mysql.py:43-50; tests/test_utils.py:4-12)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elb_log_to_mysql_spark.functions.casts import safe_float, safe_int


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("123", 123),
        ("0", 0),
        ("-1", 0),     # the sentinel quirk: isdigit() rejects the minus
        ("-", 0),
        ("", 0),
        ("12.5", 0),   # non-digit -> 0
        ("abc", 0),
        (None, 0),
    ],
)
def test_safe_int(spark, raw, expected):
    assert _eval(spark, safe_int(F.lit(raw))) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("1.5", 1.5),
        ("-1", -1.0),   # negatives PASS for floats (etl:46-50)
        ("-1.25", -1.25),
        ("0.000", 0.0),
        ("-", 0.0),
        ("", 0.0),
        ("abc", 0.0),
        (None, 0.0),
    ],
)
def test_safe_float(spark, raw, expected):
    assert _eval(spark, safe_float(F.lit(raw))) == expected
