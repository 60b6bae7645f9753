"""Cross-engine rounding regression for sql_interface_percentile.

A 2-decimal-price median over an even-count group interpolates to an
exact half-cent; the nearest double sits 1 ulp off x.xx5, where Spark's
ROUND (HALF_UP on the shortest decimal repr: x.xx4999... -> down) and
DuckDB's (std::round(x*100)/100: product rounds to exactly .5 -> up)
disagree. sf0.001's R group hits this (raw median 52724.244999999995).
The query spells the cent rounding ROUND(x*100, 0)/100 so both engines
round the identical IEEE product; these tests pin that form and the
cross-engine value agreement at the boundary SF.
"""

from __future__ import annotations

import duckdb
import pytest

from elb_log_to_mysql_spark.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_percentile_sql_uses_engine_agnostic_cent_rounding():
    sql = ORACLE_SQL["sql_interface_percentile"]
    assert "* 100, 0) / 100" in sql
    assert "), 2)" not in sql  # no ROUND(double, 2) on the interpolated value


def test_percentile_cross_engine_exact_at_boundary_sf(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    duck = {
        r[0]: r[1:]
        for r in con.execute(ORACLE_SQL["sql_interface_percentile"]).fetchall()
    }
    sdf = QUERIES["sql_interface_percentile"](spark, SF_DIR)
    got = {r[0]: (r[1], r[2], r[3]) for r in sdf.collect()}
    assert got == duck  # exact doubles, no tolerance
    # the half-cent boundary case this form exists for
    assert got["R"][0] == pytest.approx(52724.25, abs=0.0)
