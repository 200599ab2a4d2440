"""Continuously maintain a materialized equi-join view from a
two-sided CDC stream.

The batch operator (``operators/incremental.maintain_join``) proves
the signed delta algebra: ΔV = ΔA⋈B + A⋈ΔB + ΔA⋈ΔB, three delta-sized
joins, never a re-join of the bases. The STREAMING maintainer adds the
two obligations foreachBatch imposes:

- **Multi-relation atomicity.** One micro-batch must move THREE
  relations (the A snapshot, the B snapshot, the view) together — a
  crash that lands A but not the view would desynchronize them
  forever. So a commit is ONE new ``v{N}`` directory containing all
  three relations plus the batch tag, made visible by a ``_COMMIT``
  marker written LAST; readers resolve the highest committed version.
  Any crash window leaves either the complete previous version (died
  before the marker → the orphan dir is superseded on redelivery) or
  the complete next one — never a torn mix.
- **At-least-once redelivery.** The committed tag carries
  (run_key, batch_id); a redelivered batch sees tag.seq ≥ its own id
  and skips. Within one delivery the signed algebra is already
  chain-safe at full-row granularity: delete(old)+insert(new) of one
  logical row applies both images, insert+delete of the same full row
  nets to zero.

Consistency contract (tested): after any prefix of batches — including
replays and a crash-window redelivery — the stored view equals
``a_store ⋈ b_store`` equals a from-scratch join over the surviving
changelog.

Batch format: one CDC row per change with ``side`` ∈ {a, b} naming the
source relation (the usual one-topic-per-database multiplex, table
name as a column), ``op`` ∈ {I, D}, the join key, and that side's
payload columns (the other side's NULL).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datagouv_tools_spark.operators.incremental import maintain_join

__all__ = [
    "join_maintain_batch",
    "foreach_batch_join_maintainer",
    "read_join_store",
]


def _fs(spark, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _versions(spark, root: str) -> list[tuple[int, str, bool]]:
    fs, jroot = _fs(spark, root)
    if not fs.exists(jroot):
        return []
    out = []
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        if name.startswith("v") and name[1:].isdigit():
            p = f"{root}/{name}"
            ok = fs.exists(
                spark._jvm.org.apache.hadoop.fs.Path(f"{p}/_COMMIT")
            )
            out.append((int(name[1:]), p, ok))
    return out


def _read_tag(spark, path: str) -> dict:
    fs, _ = _fs(spark, path)
    jtag = spark._jvm.org.apache.hadoop.fs.Path(f"{path}/tag.json")
    stream = fs.open(jtag)
    try:
        raw = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return json.loads(raw.decode("utf-8"))


def _current(spark, root: str) -> tuple[str, dict] | None:
    committed = [(n, p) for n, p, ok in _versions(spark, root) if ok]
    if not committed:
        return None
    path = max(committed)[1]
    return path, _read_tag(spark, path)


def read_join_store(
    spark: SparkSession, root: str, relation: str = "view"
) -> DataFrame | None:
    """The named relation (``a`` / ``b`` / ``view``) of the highest
    committed version, or None before the first commit."""
    cur = _current(spark, root)
    if cur is None:
        return None
    path = f"{cur[0]}/{relation}"
    spark.catalog.refreshByPath(path)
    return spark.read.parquet(path)


def _signed_apply(store: DataFrame, delta: DataFrame, op_col: str) -> DataFrame:
    """Post-batch base snapshot: net the batch per FULL row, evict net
    deletes, append net inserts — the base-store half of the view's
    signed algebra (a replayed-within-batch insert+delete nets out)."""
    cols = store.columns
    net = (
        delta.select(
            *cols,
            F.when(F.col(op_col) == "D", F.lit(-1))
            .otherwise(F.lit(1))
            .cast("bigint")
            .alias("__s"),
        )
        .groupBy(*cols)
        .agg(F.sum("__s").alias("__net"))
    )
    removals = net.filter(F.col("__net") < 0).select(*cols)
    additions = net.filter(F.col("__net") > 0).select(*cols)
    return store.join(F.broadcast(removals), cols, "left_anti").unionByName(
        additions
    )


def join_maintain_batch(
    batch: DataFrame,
    root: str,
    run_key: str,
    batch_id: int,
    key_cols: list[str],
    a_cols: list[str],
    b_cols: list[str],
    side_col: str = "side",
    op_col: str = "op",
) -> None:
    """Fold one CDC micro-batch into the join store at ``root``.

    ``a_cols`` / ``b_cols`` are each side's payload columns (key
    excluded). The view's columns are key + a_cols + b_cols.
    """
    spark = batch.sparkSession
    versions = _versions(spark, root)  # one listing serves both uses
    committed = [(n, p) for n, p, ok in versions if ok]
    if committed:
        path = max(committed)[1]
        tag = _read_tag(spark, path)
        if tag.get("run") == run_key and int(tag.get("seq", -1)) >= batch_id:
            return  # redelivered batch: already committed
        a_old = spark.read.parquet(f"{path}/a")
        b_old = spark.read.parquet(f"{path}/b")
        view = spark.read.parquet(f"{path}/view")
        nxt = max(n for n, _, _ in versions) + 1
    else:
        a_old = b_old = view = None
        nxt = 0

    da = batch.filter(F.col(side_col) == "a").select(
        *key_cols, *a_cols, op_col
    )
    db = batch.filter(F.col(side_col) == "b").select(
        *key_cols, *b_cols, op_col
    )
    if a_old is None:
        a_old = da.filter(F.lit(False)).drop(op_col)
        b_old = db.filter(F.lit(False)).drop(op_col)
        view = a_old.join(b_old, key_cols)

    new_a = _signed_apply(a_old, da, op_col)
    new_b = _signed_apply(b_old, db, op_col)
    new_view = maintain_join(view, a_old, b_old, da, db, key_cols, op_col)

    target = f"{root}/v{nxt}"
    # The three relation writes are independent jobs over the SAME
    # committed v{N-1} inputs — submit them concurrently (Spark's
    # scheduler interleaves their stages across the executor pool;
    # atomicity is unaffected because the _COMMIT marker still goes
    # last, after ALL three have landed).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [
            pool.submit(
                lambda df, p: df.write.mode("overwrite").parquet(p),
                df,
                f"{target}/{rel}",
            )
            for df, rel in ((new_a, "a"), (new_b, "b"), (new_view, "view"))
        ]
        for f in futs:
            f.result()
    fs, _ = _fs(spark, root)
    tag_path = spark._jvm.org.apache.hadoop.fs.Path(f"{target}/tag.json")
    out = fs.create(tag_path, True)
    try:
        out.write(
            bytearray(
                json.dumps({"run": run_key, "seq": batch_id}).encode("utf-8")
            )
        )
    finally:
        out.close()
    commit = spark._jvm.org.apache.hadoop.fs.Path(f"{target}/_COMMIT")
    fs.create(commit, True).close()
    # prune only AFTER the new version is committed
    for n, p, _ok in _versions(spark, root):
        if n != nxt:
            fs.delete(spark._jvm.org.apache.hadoop.fs.Path(p), True)


def foreach_batch_join_maintainer(
    root: str,
    run_key: str,
    key_cols: list[str],
    a_cols: list[str],
    b_cols: list[str],
    side_col: str = "side",
    op_col: str = "op",
):
    """``foreachBatch`` adapter: ``writeStream.foreachBatch(this)``."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        join_maintain_batch(
            batch,
            root,
            run_key,
            int(batch_id),
            key_cols,
            a_cols,
            b_cols,
            side_col,
            op_col,
        )

    return apply
