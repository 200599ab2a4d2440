"""Streaming materialized-join maintenance (streaming/join_maintain.py):
equality with from-scratch joins, redelivery idempotence, and the
crash-window commit protocol."""

from __future__ import annotations

from pyspark.sql import functions as F

from datagouv_tools_spark.streaming.join_maintain import (
    join_maintain_batch,
    read_join_store,
)

KEY = ["k"]
ACOLS = ["an"]
BCOLS = ["bn"]


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "side string, op string, k bigint, an string, bn string"
    )


def _apply(spark, root, batch_id, rows, run="r1"):
    join_maintain_batch(
        _batch(spark, rows), root, run, batch_id, KEY, ACOLS, BCOLS
    )


def _view(spark, root):
    df = read_join_store(spark, root, "view")
    return sorted((r["k"], r["an"], r["bn"]) for r in df.collect())


def _stores_consistent(spark, root):
    a = read_join_store(spark, root, "a")
    b = read_join_store(spark, root, "b")
    v = _view(spark, root)
    joined = sorted(
        (r["k"], r["an"], r["bn"]) for r in a.join(b, KEY).collect()
    )
    assert v == joined
    return v


B0 = [
    ("a", "I", 1, "a1", None),
    ("a", "I", 2, "a2", None),
    ("b", "I", 1, None, "b1"),
    ("b", "I", 1, None, "b1x"),
    ("b", "I", 2, None, "b2"),
]
# update a2, delete b1, insert order+lineitem 3 together in one batch
B1 = [
    ("a", "D", 2, "a2", None),
    ("a", "I", 2, "a2v2", None),
    ("b", "D", 1, None, "b1"),
    ("a", "I", 3, "a3", None),
    ("b", "I", 3, None, "b3"),
]
AFTER_B0 = [(1, "a1", "b1"), (1, "a1", "b1x"), (2, "a2", "b2")]
AFTER_B1 = [(1, "a1", "b1x"), (2, "a2v2", "b2"), (3, "a3", "b3")]


def test_join_maintain_matches_from_scratch(spark, tmp_path):
    root = str(tmp_path / "jm")
    _apply(spark, root, 0, B0)
    assert _stores_consistent(spark, root) == AFTER_B0
    _apply(spark, root, 1, B1)
    assert _stores_consistent(spark, root) == AFTER_B1


def test_join_maintain_redelivery_is_noop(spark, tmp_path):
    root = str(tmp_path / "jm")
    _apply(spark, root, 0, B0)
    _apply(spark, root, 1, B1)
    _apply(spark, root, 1, B1)  # at-least-once redelivery
    _apply(spark, root, 0, B0)  # stale replay from an old offset
    assert _stores_consistent(spark, root) == AFTER_B1


def test_join_maintain_crash_window_heals(spark, tmp_path):
    """A died write (version dir without _COMMIT) is invisible to
    readers and superseded by the redelivery."""
    root = str(tmp_path / "jm")
    _apply(spark, root, 0, B0)
    # simulate a crash mid-commit of batch 1: data written, no marker
    torn = tmp_path / "jm" / "v1" / "view"
    torn.mkdir(parents=True)
    (torn / "part-junk.parquet").write_bytes(b"torn")
    assert _stores_consistent(spark, root) == AFTER_B0  # reader ignores v1
    _apply(spark, root, 1, B1)  # redelivery commits as v2
    assert _stores_consistent(spark, root) == AFTER_B1


def test_join_maintain_same_batch_insert_delete_nets_out(spark, tmp_path):
    root = str(tmp_path / "jm")
    _apply(spark, root, 0, B0)
    _apply(
        spark,
        root,
        1,
        [("a", "I", 9, "a9", None), ("a", "D", 9, "a9", None)],
    )
    assert _stores_consistent(spark, root) == AFTER_B0
