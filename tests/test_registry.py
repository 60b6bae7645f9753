"""Registry contract guards (no Spark execution): every oracle has a
matching query, and every oracle SQL string binds cleanly in DuckDB
against the test tables — catches dialect/binder errors in seconds
instead of a full compare_oracle run."""

from __future__ import annotations

import duckdb
import pytest

from elb_log_to_mysql_spark.queries import ORACLE_SQL, QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_every_oracle_key_has_a_query():
    missing = set(ORACLE_SQL) - set(QUERIES)
    assert not missing, f"oracle without query: {sorted(missing)}"


def test_registry_is_nontrivially_large():
    # the coverage contract: SQL-checkable operators dominate
    assert len(QUERIES) >= 90
    assert len(ORACLE_SQL) >= 80


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_sql_binds_in_duckdb(con, name):
    # EXPLAIN parses, binds, and plans without executing
    con.execute(f"EXPLAIN {ORACLE_SQL[name]}")
