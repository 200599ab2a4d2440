"""Scale guardrails: assert plan properties, not just results.

Each test pins a property that keeps a query viable at 100 TB —
pushdown reaching the scan, column pruning, broadcast joins staying
broadcast, shuffle counts not growing. A refactor that silently
de-optimizes fails here instead of in production.
"""

from __future__ import annotations

from datagouv_tools_spark import queries as q
from datagouv_tools_spark.plans.inspect import (
    exchange_count,
    has_broadcast_hash_join,
    physical_plan,
    pushed_filters,
    read_schemas,
)


def test_q1_scan_prunes_and_pushes(spark, sf_dir):
    df = q.QUERIES["q1_pricing_summary"](spark, sf_dir)
    schemas = read_schemas(df)
    assert len(schemas) == 1
    # 6 needed columns only — never the other 5 of lineitem's 11
    for col in ("l_orderkey", "l_partkey", "l_suppkey", "l_comment"):
        assert col not in schemas[0]
    assert any("l_shipdate" in f for f in pushed_filters(df))
    # one shuffle for the agg (+ optional range exchange for the sort)
    assert exchange_count(df) <= 2


def test_q3_dims_broadcast(spark, sf_dir):
    df = q.QUERIES["q3_shipping_priority"](spark, sf_dir)
    assert has_broadcast_hash_join(df)
    assert any("c_mktsegment" in f for f in pushed_filters(df))


def test_q5_star_join_single_fact_shuffle(spark, sf_dir):
    df = q.QUERIES["q5_local_supplier_volume"](spark, sf_dir)
    plan = physical_plan(df)
    # every dim joins as broadcast; the fact side may shuffle for the
    # orders⋈lineitem join + final agg + sort, but no more
    assert plan.count("BroadcastHashJoin") >= 3
    assert exchange_count(df) <= 4


def test_asof_join_is_single_shuffle(spark, sf_dir):
    df = q.QUERIES["events_asof_click_view"](spark, sf_dir)
    # one hash exchange for the keyed window (+ range exchange for the
    # final orderBy); crucially NO join exchange and no nested loop
    plan = physical_plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert exchange_count(df) <= 2


def test_range_join_builds_local_relation(spark, sf_dir):
    df = q.QUERIES["orders_price_tier_rangejoin"](spark, sf_dir)
    plan = physical_plan(df)
    # literal dim must stay JVM-side: a Python RDD scan here costs
    # seconds of Py4J overhead per run (see queries.py)
    assert "ExistingRDD" not in plan
    assert "LocalTableScan" in plan


def test_dedup_fingerprint_prunes_documents(spark, sf_dir):
    df = q.QUERIES["doc_fingerprint_dedup"](spark, sf_dir)
    schemas = read_schemas(df)
    assert len(schemas) == 1
    assert "doc_id" not in schemas[0]  # only source + text are needed
