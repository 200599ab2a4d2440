"""Distributed PostgreSQL read (sources/pg_read.py).

Unit layer: slice grammar + schema mapping without a server. Live
layer: write a DataFrame through the COPY sink, read it back with
executor-parallel key-range slices, and require exact equality —
the full north-star read-transform-write loop against a real server.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datagouv_tools_spark.sources.pg_read import (
    _fetch_slice_sql,
    read_pg_parallel,
    slice_predicates,
)


def test_slice_predicates_tile_the_line():
    preds = slice_predicates("k", 0, 100, 4)
    assert preds == [
        '"k" < 25 OR "k" IS NULL',
        '"k" >= 25 AND "k" < 50',
        '"k" >= 50 AND "k" < 75',
        '"k" >= 75',
    ]
    # bounds never filter: first slice is unbounded below, last above
    assert "OR" in preds[0] and preds[-1] == '"k" >= 75'


def test_slice_predicates_degenerate_cases():
    assert slice_predicates("k", 0, 10, 1) == ["TRUE"]
    # more partitions than span: collapses rather than emitting empty slices
    preds = slice_predicates("k", 5, 7, 8)
    assert preds == ['"k" < 6 OR "k" IS NULL', '"k" >= 6']
    # identifier quoting survives embedded quotes
    assert '"we""ird"' in slice_predicates('we"ird', 0, 10, 2)[0]


def test_fetch_slice_sql_pushes_projection_and_predicate():
    sql = _fetch_slice_sql("orders", ["o_orderkey", "o_totalprice"], '"k" >= 7')
    assert sql == (
        'SELECT "o_orderkey", "o_totalprice" FROM "orders" WHERE "k" >= 7'
    )
    # no predicate → no WHERE
    assert _fetch_slice_sql("t", ["a"], None) == 'SELECT "a" FROM "t"'


def test_read_pg_parallel_roundtrip_live(spark, pg_dsn):
    """COPY-write a typed DataFrame, read it back with 3 parallel
    slices, compare row-for-row (ints, decimals, dates, timestamps,
    bools, NULLs, empty-vs-NULL strings all survive the loop)."""
    from datagouv_tools_spark.sinks.pg_copy import _connect, staged_copy

    df = spark.createDataFrame(
        [
            (1, "plain", "10.50", "2024-01-15", "2024-01-15 10:30:00", True, 1.5),
            (2, "", "0.01", "2024-02-29", "2024-02-29 23:59:59", False, -2.25),
            (3, None, None, None, None, None, None),
            (4, 'q"uote,\nline', "-99999.99", "1999-12-31", "1999-12-31 00:00:00", True, 0.0),
        ],
        "id int, label string, amount string, d string, ts string, flag boolean, x double",
    ).select(
        "id",
        "label",
        F.col("amount").cast(T.DecimalType(10, 2)).alias("amount"),
        F.to_date("d").alias("d"),
        F.to_timestamp("ts").alias("ts"),
        "flag",
        "x",
    )
    staged_copy(df, pg_dsn, "dg_spark_read_rt", num_partitions=2)
    try:
        got = read_pg_parallel(
            spark, pg_dsn, "dg_spark_read_rt", partition_column="id", num_partitions=3
        )
        # inferred schema matches what the DDL emitted
        by_name = {f.name: f.dataType for f in got.schema.fields}
        assert by_name["id"] == T.IntegerType()
        assert by_name["amount"] == T.DecimalType(10, 2)
        assert by_name["d"] == T.DateType()
        assert by_name["flag"] == T.BooleanType()
        # ids span 1..4 → stride ceil(4/3)=2 collapses to 2 real slices
        assert got.rdd.getNumPartitions() == 2
        left = {r["id"]: r.asDict() for r in df.collect()}
        right = {r["id"]: r.asDict() for r in got.collect()}
        # timestamp column may infer as NTZ; compare as naive datetimes
        assert set(left) == set(right)
        for k in left:
            for c, v in left[k].items():
                assert right[k][c] == v, (k, c, v, right[k][c])
    finally:
        conn = _connect(pg_dsn)
        try:
            cur = conn.cursor()
            cur.execute('DROP TABLE "dg_spark_read_rt"')
            cur.close()
            conn.commit()
        finally:
            conn.close()


def test_read_pg_parallel_pushdown_and_bounds_never_drop_rows(spark, pg_dsn):
    """Projection + predicate reach the server (only requested data
    returns), and deliberately-wrong bounds still return every
    matching row — the Spark-JDBC slice contract."""
    from datagouv_tools_spark.sinks.pg_copy import _connect, staged_copy

    df = spark.createDataFrame(
        [(i, f"u{i % 3}", i * 10) for i in range(1, 51)],
        "id int, grp string, val int",
    )
    staged_copy(df, pg_dsn, "dg_spark_read_pd", num_partitions=2)
    try:
        got = read_pg_parallel(
            spark,
            pg_dsn,
            "dg_spark_read_pd",
            partition_column="id",
            num_partitions=4,
            columns=["id", "val"],
            predicate="val >= 200",
            lower_bound=20,  # wrong on purpose: true range is 1..50
            upper_bound=30,
        )
        assert got.columns == ["id", "val"]
        rows = sorted((r.id, r.val) for r in got.collect())
        assert rows == [(i, i * 10) for i in range(20, 51)]
    finally:
        conn = _connect(pg_dsn)
        try:
            cur = conn.cursor()
            cur.execute('DROP TABLE "dg_spark_read_pd"')
            cur.close()
            conn.commit()
        finally:
            conn.close()


def test_read_pg_parallel_empty_table_and_no_partition_column(spark, pg_dsn):
    from datagouv_tools_spark.sinks.pg_copy import _connect, staged_copy

    df = spark.createDataFrame([], "id int, s string")
    # staged_copy of an empty frame still creates the table
    staged_copy(df, pg_dsn, "dg_spark_read_empty", num_partitions=1)
    try:
        got = read_pg_parallel(
            spark, pg_dsn, "dg_spark_read_empty", partition_column="id"
        )
        assert got.count() == 0
        single = read_pg_parallel(spark, pg_dsn, "dg_spark_read_empty")
        assert single.count() == 0
    finally:
        conn = _connect(pg_dsn)
        try:
            cur = conn.cursor()
            cur.execute('DROP TABLE "dg_spark_read_empty"')
            cur.close()
            conn.commit()
        finally:
            conn.close()


def test_read_pg_parallel_unknown_column_raises(spark, pg_dsn):
    from datagouv_tools_spark.sinks.pg_copy import _connect, staged_copy

    df = spark.createDataFrame([(1, "a")], "id int, s string")
    staged_copy(df, pg_dsn, "dg_spark_read_cols", num_partitions=1)
    try:
        with pytest.raises(ValueError, match="nope"):
            read_pg_parallel(spark, pg_dsn, "dg_spark_read_cols", columns=["id", "nope"])
        with pytest.raises(ValueError, match="not found"):
            read_pg_parallel(spark, pg_dsn, "dg_spark_no_such_table")
    finally:
        conn = _connect(pg_dsn)
        try:
            cur = conn.cursor()
            cur.execute('DROP TABLE "dg_spark_read_cols"')
            cur.close()
            conn.commit()
        finally:
            conn.close()


def test_north_star_loop_parquet_copy_readback(spark, sf_dir, pg_dsn):
    """The full north-star loop at real (sf0.001) data shape: parquet
    scan → DataFrame transform → distributed COPY into PostgreSQL →
    executor-parallel read-back → aggregate equality with the
    original. Timestamps go through NTZ on both legs."""
    from datagouv_tools_spark.sinks.pg_copy import _connect, staged_copy

    orders = (
        spark.read.parquet(sf_dir + "/orders.parquet")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast(T.DecimalType(18, 2)).alias("o_totalprice"),
        )
    )
    staged_copy(orders, pg_dsn, "dg_spark_orders_rt", num_partitions=4)
    try:
        back = read_pg_parallel(
            spark,
            pg_dsn,
            "dg_spark_orders_rt",
            partition_column="o_orderkey",
            num_partitions=6,
        )
        want = orders.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("s"),
            F.countDistinct("o_custkey").alias("c"),
        ).collect()[0]
        got = back.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("s"),
            F.countDistinct("o_custkey").alias("c"),
        ).collect()[0]
        assert (got.n, got.s, got.c) == (want.n, want.s, want.c)
        assert back.rdd.getNumPartitions() == 6
    finally:
        conn = _connect(pg_dsn)
        try:
            cur = conn.cursor()
            cur.execute('DROP TABLE "dg_spark_orders_rt"')
            cur.close()
            conn.commit()
        finally:
            conn.close()


def test_slice_predicates_tile_exactly_property():
    """Every integer key (and NULL) matches EXACTLY one slice — the
    property that makes wrong bounds skew but never drop/duplicate."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(-1000, 1000),
        st.integers(1, 2000),
        st.integers(1, 40),
        st.integers(-3000, 3000),
    )
    def check(lower, span, n, probe):
        preds = slice_predicates("k", lower, lower + span, n)

        def matches(pred: str, v) -> bool:
            # evaluate the SQL fragment in Python (same operators)
            import re

            if pred == "TRUE":
                return True
            if v is None:
                return "IS NULL" in pred
            clauses = re.findall(r'"k" (>=|<) (-?\d+)', pred)
            joiner_and = " AND " in pred
            results = [
                (v >= int(b)) if op == ">=" else (v < int(b))
                for op, b in clauses
            ]
            return all(results) if joiner_and else any(results)

        hits = sum(1 for p in preds if matches(p, probe))
        assert hits == 1, (preds, probe)
        assert sum(1 for p in preds if matches(p, None)) == 1

    check()
