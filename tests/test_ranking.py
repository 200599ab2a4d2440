"""Distributed two-pass rank (operators/ranking.py): value-equivalence
with the global row_number, and the plan guarantee (no single-partition
exchange) that is the operator's whole point."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datagouv_tools_spark.operators.ranking import distributed_row_number


def _global_rank(df, order_cols):
    return df.withColumn(
        "__rn", F.row_number().over(Window.orderBy(*order_cols))
    )


def test_rank_equals_global_row_number_on_customer(spark):
    """Real-data equivalence: rank customers by (name, custkey) both
    ways; every (id, rank) pair must match across many range
    partitions (num_ranges > 1 forces real offset carries)."""
    from datagouv_tools_spark.sources.catalog import load_table

    cust = load_table(spark, "/root/testdata/sf0.01", "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("key")
    )
    got = {
        (r["id"], r["__rn"])
        for r in distributed_row_number(
            cust, [F.col("key"), F.col("id")], num_ranges=7
        ).collect()
    }
    want = {
        (r["id"], r["__rn"])
        for r in _global_rank(cust, [F.col("key"), F.col("id")]).collect()
    }
    assert got == want and len(got) > 100


def test_rank_handles_duplicate_sort_keys_and_tiny_partitions(spark):
    """Heavy ties on the sort key (range boundaries may split equal
    keys) and more ranges than rows (empty partitions) both preserve
    the exact (key, id) total order."""
    rows = [(i, f"k{i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, "id bigint, key string")
    got = sorted(
        (r["id"], r["__rn"])
        for r in distributed_row_number(
            df, [F.col("key"), F.col("id")], num_ranges=64
        ).collect()
    )
    want = sorted(
        (r["id"], r["__rn"])
        for r in _global_rank(df, [F.col("key"), F.col("id")]).collect()
    )
    assert got == want


def test_rank_empty_input(spark):
    df = spark.createDataFrame([], "id bigint, key string")
    assert (
        distributed_row_number(df, [F.col("key"), F.col("id")]).count() == 0
    )


def test_sorted_neighborhood_plan_has_no_single_partition_exchange(spark):
    """The r6 scale fix: sorted_neighborhood_pairs must not funnel the
    corpus through one task. The analyzed plan of the full query chain
    may contain no 'Exchange SinglePartition' (the bounded offset
    carry is a broadcast, the rank shuffle is range-parallel)."""
    from datagouv_tools_spark.operators.fuzzy import sorted_neighborhood_pairs
    from datagouv_tools_spark.sources.catalog import load_table

    cust = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("key")
    )
    pairs = sorted_neighborhood_pairs(
        cust, "key", "id", F.col("key"), window=5, max_distance=1
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert pairs.count() >= 0  # chain executes end-to-end


def test_sorted_neighborhood_pairs_unchanged_by_rank_swap(spark):
    """Pair-set equivalence on real names: the distributed rank must
    yield the exact same neighborhood pair set as a global-rank
    reimplementation run side by side."""
    from datagouv_tools_spark.operators.fuzzy import sorted_neighborhood_pairs
    from datagouv_tools_spark.sources.catalog import load_table

    cust = load_table(spark, "/root/testdata/sf0.01", "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("key")
    )
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in sorted_neighborhood_pairs(
            cust, "key", "id", F.col("key"), window=5, max_distance=1
        ).collect()
    }

    ranked = _global_rank(cust, [F.col("key"), F.col("id")])
    a = ranked.select(
        F.col("id").alias("id_a"),
        F.col("key").alias("__ka"),
        "__rn",
        F.explode(F.sequence(F.lit(1), F.lit(5))).alias("__off"),
    ).select("id_a", "__ka", (F.col("__rn") + F.col("__off")).alias("__rn"))
    b = ranked.select(
        F.col("id").alias("id_b"), F.col("key").alias("__kb"), "__rn"
    )
    want = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in a.join(b, "__rn")
        .withColumn("distance", F.levenshtein("__ka", "__kb"))
        .filter(F.col("distance") <= 1)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "distance",
        )
        .distinct()
        .collect()
    }
    assert got == want and len(got) > 0


def test_rank_cumsum_equals_global_window(spark):
    """distributed_rank_cumsum must reproduce the single-task
    SUM() OVER (ORDER BY ...) and row_number exactly, including under
    heavy sort-key ties and negative values."""
    from datagouv_tools_spark.operators.ranking import distributed_rank_cumsum

    rows = [(i, (i * 37) % 11 - 5, f"g{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, v bigint, key string")
    got = sorted(
        (r["id"], r["__rn"], r["__cum"])
        for r in distributed_rank_cumsum(
            df, [F.col("key"), F.col("id")], "v", num_ranges=9
        ).collect()
    )
    w = Window.orderBy("key", "id")
    want = sorted(
        (r["id"], r["__rn"], r["__cum"])
        for r in df.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "__cum",
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint"),
        )
        .collect()
    )
    assert got == want


def test_rank_cumsum_plan_has_no_single_partition_window(spark):
    from datagouv_tools_spark.operators.ranking import distributed_rank_cumsum

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).cast("bigint").alias("v")
    )
    out = distributed_rank_cumsum(df, [F.col("v"), F.col("id")], "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert out.count() == 100


def test_rank_total_and_inline_carry_matches_broadcast_path(spark):
    """The two carry paths (inline literal CASE ≤64 ranges, broadcast
    join above) produce identical ranks, and the returned total equals
    the row count."""
    from datagouv_tools_spark.operators.ranking import (
        _INLINE_CARRY_MAX,
        distributed_row_number_total,
    )

    rows = [(i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    inline, n1 = distributed_row_number_total(
        df, [F.col("v"), F.col("id")], num_ranges=8
    )
    joined, n2 = distributed_row_number_total(
        df, [F.col("v"), F.col("id")], num_ranges=_INLINE_CARRY_MAX + 16
    )
    assert n1 == n2 == 500
    assert sorted((r["id"], r["__rn"]) for r in inline.collect()) == sorted(
        (r["id"], r["__rn"]) for r in joined.collect()
    )


def test_ntile_small_input_no_divide_by_zero(spark):
    """n < n_buckets: every row lands in its own singleton bucket and
    the clamped ELSE divisor never raises under ANSI mode."""
    from datagouv_tools_spark.operators.ranking import distributed_ntile

    df = spark.createDataFrame([(1,), (2,), (3,)], "id bigint")
    got = {
        (r["id"], r["b"])
        for r in distributed_ntile(
            df, 5, [F.col("id")], bucket_col="b"
        ).collect()
    }
    assert got == {(1, 1), (2, 2), (3, 3)}


def test_ntile_matches_window_ntile_across_sizes(spark):
    """Literal (q, r) NTILE arithmetic == Spark's NTILE window for
    remainder-heavy and exact-multiple sizes."""
    from datagouv_tools_spark.operators.ranking import distributed_ntile

    for n, k in ((23, 5), (25, 5), (7, 3)):
        df = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
        got = {
            (r["id"], r["b"])
            for r in distributed_ntile(
                df, k, [F.col("id")], bucket_col="b"
            ).collect()
        }
        want = {
            (r["id"], r["b"])
            for r in df.select(
                "id", F.ntile(k).over(Window.orderBy("id")).alias("b")
            ).collect()
        }
        assert got == want, (n, k)


def test_pin_input_preserves_values(spark):
    """pin_input only changes materialization, never values."""
    df = spark.createDataFrame(
        [(i, (i * 13) % 7) for i in range(60)], "id bigint, v bigint"
    )
    a = sorted(
        (r["id"], r["__rn"])
        for r in distributed_row_number(
            df, [F.col("v"), F.col("id")], pin_input=True
        ).collect()
    )
    b = sorted(
        (r["id"], r["__rn"])
        for r in distributed_row_number(
            df, [F.col("v"), F.col("id")], pin_input=False
        ).collect()
    )
    assert a == b


def test_round_checkpointer_releases_previous_round(spark):
    """RoundCheckpointer unpersists round N-1's blocks once round N is
    materialized, and never touches the latest round."""
    from datagouv_tools_spark.operators.ckpt import RoundCheckpointer

    def persistent_ids():
        return set(spark.sparkContext._jsc.getPersistentRDDs().keys())

    base = persistent_ids()
    ck = RoundCheckpointer()
    df = ck(spark.range(100))
    first = persistent_ids() - base
    assert len(first) == 1
    df = ck(df.withColumn("x", F.col("id") + 1))
    second = persistent_ids() - base
    # first round's block set is gone, second round's remains
    assert first.isdisjoint(second) and len(second) == 1
    assert df.count() == 100
    ck.release()
    assert persistent_ids() - base == set()
