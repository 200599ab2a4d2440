"""Smoke + oracle-parity tests for the declared query surface.

Every ``QUERIES`` entry must run at sf0.001 and produce a stable schema;
entries with an oracle are hash-compared against DuckDB at sf0.001
(the driver repeats this at sf0.01).
"""

from __future__ import annotations

import duckdb
import pytest

from datagouv_tools_spark.queries import ORACLE, QUERIES
from datagouv_tools_spark.sources.catalog import TESTDATA_TABLES, table_path

import sys

sys.path.insert(0, "/root/repo/tools")
from paritycheck import compare  # noqa: E402


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * "
            f"FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    duck_pdf = duck.execute(ORACLE[name]).df()
    problems = compare(spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"
