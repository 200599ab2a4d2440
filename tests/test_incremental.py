"""Incremental rollup maintenance (operators/incremental.py): the
contract is equality with a full recompute over the post-delta base,
across inserts, deletes, delete-the-extremum, delete-the-whole-group,
and re-insert-after-delete — plus a randomized property sweep."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datagouv_tools_spark.operators.incremental import (
    aggregate_base,
    apply_delta,
    dirty_keys,
    maintain_rollup,
)


def _mk_base(spark, rows):
    return spark.createDataFrame(rows, "k string, v int")


def _mk_delta(spark, rows):
    return spark.createDataFrame(rows, "k string, v int, op string")


def _apply_ops(base_rows, delta_rows):
    """Multiset semantics reference: each delete removes ONE matching
    (k, v) instance."""
    out = list(base_rows)
    for k, v, op in delta_rows:
        if op == "D":
            out.remove((k, v))
        else:
            out.append((k, v))
    return out


def _norm(df):
    return {
        tuple(r[c] for c in ("k",)): (r["n"], r["total"], r["vmin"], r["vmax"])
        for r in df.collect()
    }


def _check(spark, base_rows, delta_rows):
    base = _mk_base(spark, base_rows)
    delta = _mk_delta(spark, delta_rows)
    after_rows = _apply_ops(base_rows, delta_rows)
    base_after = _mk_base(spark, after_rows) if after_rows else _mk_base(
        spark, []
    ).filter(F.lit(False))
    rollup = aggregate_base(base, "k", "v")
    maintained = maintain_rollup(rollup, delta, base_after, "k", "v")
    full = aggregate_base(base_after, "k", "v")
    assert _norm(maintained) == _norm(full)


def test_insert_only_delta(spark):
    _check(
        spark,
        [("a", 1), ("a", 5), ("b", 3)],
        [("a", 7, "I"), ("c", 2, "I")],
    )


def test_delete_non_extremum_never_touches_base(spark):
    base_rows = [("a", 1), ("a", 3), ("a", 5)]
    base = _mk_base(spark, base_rows)
    delta = _mk_delta(spark, [("a", 3, "D")])
    rollup = aggregate_base(base, "k", "v")
    # not dirty: min=1 and max=5 survive, algebra suffices
    assert dirty_keys(rollup, delta, "k", "v").count() == 0
    merged = apply_delta(rollup, delta, "k", "v")
    got = _norm(merged)
    assert got[("a",)] == (2, Decimal("6.000000"), 1, 5)


def test_delete_the_minimum_marks_dirty_and_recomputes(spark):
    base_rows = [("a", 1), ("a", 3), ("a", 5), ("b", 9)]
    delta_rows = [("a", 1, "D")]
    base = _mk_base(spark, base_rows)
    rollup = aggregate_base(base, "k", "v")
    delta = _mk_delta(spark, delta_rows)
    dk = dirty_keys(rollup, delta, "k", "v")
    assert [r.k for r in dk.collect()] == ["a"]
    _check(spark, base_rows, delta_rows)


def test_delete_duplicate_of_minimum_keeps_surviving_copy(spark):
    _check(spark, [("a", 1), ("a", 1), ("a", 4)], [("a", 1, "D")])


def test_delete_whole_group_removes_it(spark):
    base_rows = [("a", 2), ("b", 3)]
    delta_rows = [("a", 2, "D")]
    base = _mk_base(spark, base_rows)
    rollup = aggregate_base(base, "k", "v")
    maintained = maintain_rollup(
        rollup,
        _mk_delta(spark, delta_rows),
        _mk_base(spark, _apply_ops(base_rows, delta_rows)),
        "k",
        "v",
    )
    assert set(_norm(maintained)) == {("b",)}


def test_update_as_delete_plus_insert(spark):
    _check(
        spark,
        [("a", 10), ("a", 20)],
        [("a", 20, "D"), ("a", 25, "I")],
    )


def test_reinsert_after_full_delete(spark):
    _check(
        spark,
        [("a", 4)],
        [("a", 4, "D"), ("a", 6, "I"), ("a", 2, "I")],
    )


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 9)),
        min_size=1,
        max_size=12,
    ),
    st.data(),
)
def test_property_delta_maintenance_equals_recompute(spark, base_pairs, data):
    base_rows = [(k, v) for k, v in base_pairs]
    n_ops = data.draw(st.integers(0, 6))
    cur = list(base_rows)
    delta_rows = []
    for _ in range(n_ops):
        if cur and data.draw(st.booleans()):
            victim = data.draw(st.sampled_from(cur))
            cur.remove(victim)
            delta_rows.append((victim[0], victim[1], "D"))
        else:
            k = data.draw(st.sampled_from("abc"))
            v = data.draw(st.integers(0, 9))
            cur.append((k, v))
            delta_rows.append((k, v, "I"))
    _check(spark, base_rows, delta_rows)


def test_delta_inserts_then_deletes_its_own_maximum(spark):
    """Regression (hypothesis-found): a delta inserting a new maximum
    into a group and deleting it again must mark the group dirty
    against the CANDIDATE extremum, not the stored one — otherwise the
    rollup reports the deleted value as max."""
    # group absent from the stored rollup entirely
    _check(
        spark,
        [("b", 0)],
        [
            ("a", 1, "I"),
            ("a", 0, "I"),
            ("a", 0, "I"),
            ("b", 0, "D"),
            ("a", 0, "I"),
            ("a", 1, "D"),
        ],
    )
    # group present, delta raises then removes the max
    _check(
        spark,
        [("a", 5), ("a", 1)],
        [("a", 10, "I"), ("a", 10, "D")],
    )
    # ...and the min-side twin
    _check(
        spark,
        [("a", 5), ("a", 8)],
        [("a", 1, "I"), ("a", 1, "D")],
    )


# ---------------------------------------------------------------------------
# maintain_join — materialized equi-join view maintenance
# ---------------------------------------------------------------------------


def _mj(spark, a_rows, b_rows, da_rows, db_rows):
    from datagouv_tools_spark.operators.incremental import maintain_join

    a = spark.createDataFrame(a_rows, "k bigint, an string")
    b = spark.createDataFrame(b_rows, "k bigint, bn string")
    da = spark.createDataFrame(da_rows or [], "k bigint, an string, op string")
    db = spark.createDataFrame(db_rows or [], "k bigint, bn string, op string")
    view = a.join(b, "k")
    got = maintain_join(view, a, b, da, db, "k")
    return sorted((r["k"], r["an"], r["bn"]) for r in got.collect())


def _scratch_join(spark, a_rows, b_rows, da_rows, db_rows):
    def apply(rows, drows):
        out = [tuple(r) for r in rows]
        for r in drows or []:
            if r[-1] == "D":
                out.remove(tuple(r[:-1]))
            else:
                out.append(tuple(r[:-1]))
        return out

    a2, b2 = apply(a_rows, da_rows), apply(b_rows, db_rows)
    return sorted(
        (ka, an, bn) for ka, an in a2 for kb, bn in b2 if ka == kb
    )


def _check_join(spark, a_rows, b_rows, da_rows, db_rows):
    assert _mj(spark, a_rows, b_rows, da_rows, db_rows) == _scratch_join(
        spark, a_rows, b_rows, da_rows, db_rows
    )


def test_join_ivm_one_sided_insert_and_delete(spark):
    a = [(1, "a1"), (2, "a2")]
    b = [(1, "b1"), (1, "b1x"), (2, "b2")]
    _check_join(spark, a, b, [(3, "a3", "I"), (2, "a2", "D")], None)
    _check_join(spark, a, b, None, [(1, "b1", "D"), (2, "b2b", "I")])


def test_join_ivm_both_sides_same_key(spark):
    """ΔA⋈ΔB: a new order and its new lineitems arrive in one batch;
    deleting both halves of an existing joined row nets exactly -1."""
    a = [(1, "a1")]
    b = [(1, "b1")]
    _check_join(spark, a, b, [(9, "a9", "I")], [(9, "b9", "I"), (9, "b9x", "I")])
    _check_join(spark, a, b, [(1, "a1", "D")], [(1, "b1", "D")])


def test_join_ivm_update_is_delete_plus_insert(spark):
    """An update (delete old image + insert new) replaces the payload
    without touching sibling rows of the same join key."""
    a = [(1, "a1")]
    b = [(1, "b1"), (1, "b2")]
    _check_join(spark, a, b, None, [(1, "b1", "D"), (1, "b1v2", "I")])


def test_join_ivm_tombstone_spares_full_row_siblings(spark):
    """Regression for the short-key tombstone bug: two b-rows share the
    join key; deleting one must not evict the survivor."""
    a = [(1, "a1")]
    b = [(1, "b_dead"), (1, "b_alive")]
    got = _mj(spark, a, b, None, [(1, "b_dead", "D")])
    assert got == [(1, "a1", "b_alive")]


def test_join_ivm_deleted_order_blocks_new_lineitem(spark):
    """A lineitem insert for an order deleted in the same batch must
    not surface (t2 gives +1, ΔA⋈ΔB gives -1 → net 0)."""
    a = [(1, "a1")]
    b = [(1, "b1")]
    _check_join(spark, a, b, [(1, "a1", "D")], [(1, "b_new", "I")])
