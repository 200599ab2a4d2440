"""Continuously maintain mergeable sketches from a document stream.

The batch sketches (`operators/sketches.py`) earn their keep in
streaming: because merge is exact and state is CONSTANT-SIZE, a
micro-batch updates the store by reading ~KBs, never the corpus — the
sketch-sized analog of the rollup maintainers. Per batch:

    new_cells = stored_cells  ⊕  cells(batch)       (⊕ = ADD for CMS,
                                                      MIN for MinCount)

Idempotence uses the in-state tag design proven by
``streaming/rollup_maintain.delta_maintain_batch``: every store row
carries the (run_key, batch id) that last wrote it, so the
applied-marker commits atomically with the state, and a redelivered
batch sees its own tag and skips. The CMS add is NOT idempotent by
itself (re-adding double-counts — unlike the rollup's id-membership
deltas there are no ids to probe), which is exactly why the tag is
load-bearing here.

Durability: the store is VERSIONED, never overwritten in place. A
plain ``mode("overwrite")`` of the store directory deletes the
accumulated state before the new job commits — a crash mid-write would
lose EVERYTHING, and the at-least-once redelivery would rebuild the
sketch from only the redelivered batch: a silent permanent undercount
that breaks the "never undercounts" contract. Instead each commit
writes a fresh ``v{N}`` subdirectory (N strictly increasing), readers
resolve to the highest version whose ``_SUCCESS`` marker exists, and
older versions are pruned only AFTER the new one is fully committed.
Every crash window therefore leaves a complete previous version in
place: a died write leaves an ignored marker-less dir that the
redelivery supersedes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datagouv_tools_spark.operators.sketches import cms_cells

__all__ = [
    "cms_maintain_batch",
    "foreach_batch_cms_maintainer",
    "read_cms",
    "cms_estimate",
    "mincount_maintain_batch",
    "read_mincount",
    "mincount_estimate",
    "histogram_maintain_batch",
    "foreach_batch_histogram_maintainer",
    "read_histogram",
]


def _fs(spark, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _versions(spark, store_path: str) -> list[tuple[int, str, bool]]:
    """All ``v{N}`` subdirs as (N, path, committed) — committed means
    the Spark job's ``_SUCCESS`` marker exists."""
    fs, root = _fs(spark, store_path)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("v") and name[1:].isdigit():
            p = f"{store_path}/{name}"
            ok = fs.exists(spark._jvm.org.apache.hadoop.fs.Path(f"{p}/_SUCCESS"))
            out.append((int(name[1:]), p, ok))
    return out


def _read_current(spark, store_path: str) -> DataFrame | None:
    """The highest COMMITTED version of the store, or None."""
    committed = [(n, p) for n, p, ok in _versions(spark, store_path) if ok]
    if not committed:
        return None
    path = max(committed)[1]
    spark.catalog.refreshByPath(path)
    return spark.read.parquet(path)


def _commit_version(df: DataFrame, store_path: str) -> None:
    """Write ``df`` as the store's next version, then prune the rest.
    The write reads the previous version's files, which stay in place
    until after this commit — no checkpoint needed, no crash window in
    which the accumulated state is gone."""
    spark = df.sparkSession
    existing = _versions(spark, store_path)
    nxt = max((n for n, _, _ in existing), default=-1) + 1
    target = f"{store_path}/v{nxt}"
    df.write.mode("overwrite").parquet(target)
    fs, _ = _fs(spark, store_path)
    for _n, p, _ok in existing:
        fs.delete(spark._jvm.org.apache.hadoop.fs.Path(p), True)


def cms_maintain_batch(
    batch_tokens: DataFrame,
    store_path: str,
    run_key: str,
    batch_id: int,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
) -> None:
    """Fold one micro-batch of token occurrences into the CMS store."""
    spark = batch_tokens.sparkSession
    stored = _read_current(spark, store_path)
    if stored is not None:
        tag = stored.select("__run", "__seq").first()
        if tag is not None and tag["__run"] == run_key and int(tag["__seq"]) >= batch_id:
            return
        old = stored.select("i", "idx", F.col("c").alias("__oc"))
    else:
        old = None

    inc = cms_cells(batch_tokens, token_col, depth, width).select(
        "i", "idx", F.col("c").alias("__ic")
    )
    if old is not None:
        merged = (
            old.join(inc, ["i", "idx"], "full_outer")
            .select(
                "i",
                "idx",
                (
                    F.coalesce("__oc", F.lit(0)) + F.coalesce("__ic", F.lit(0))
                ).cast("bigint").alias("c"),
            )
        )
    else:
        merged = inc.select("i", "idx", F.col("__ic").cast("bigint").alias("c"))
    out = (
        merged.withColumn("__run", F.lit(run_key))
        .withColumn("__seq", F.lit(int(batch_id)).cast("bigint"))
        .withColumn("__width", F.lit(width))
    )
    _commit_version(out, store_path)


def foreach_batch_cms_maintainer(
    store_path: str,
    checkpoint: str,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
):
    """``writeStream.foreachBatch`` callback: each micro-batch must be
    (or be transformable to) a frame with ``token_col`` rows."""
    from datagouv_tools_spark.streaming.index_ingest import run_key_for_checkpoint

    rk = run_key_for_checkpoint(checkpoint)

    def run(batch: DataFrame, batch_id: int) -> None:
        cms_maintain_batch(
            batch, store_path, rk, int(batch_id), token_col, depth, width
        )

    return run


def read_cms(spark, store_path: str) -> DataFrame | None:
    """The maintained cells, sans tag columns; ``None`` if the store
    has never committed a version (mirrors ``read_counters``)."""
    cur = _read_current(spark, store_path)
    if cur is None:
        return None
    return cur.drop("__run", "__seq", "__width")


def cms_estimate(spark, store_path: str, tokens: list[str]) -> dict[str, int]:
    """Point estimates for ``tokens`` from the maintained store
    (min over depth rows; never undercounts)."""
    from datagouv_tools_spark.operators.sketches import cms_index

    raw = _read_current(spark, store_path)
    if raw is None:
        raise FileNotFoundError(
            f"CMS store at {store_path!r} has no committed version"
        )
    meta = raw.select(F.max("i"), F.first("__width")).first()
    depth, width = int(meta[0]) + 1, int(meta[1])
    cells = raw.drop("__run", "__seq", "__width")
    probes = (
        spark.createDataFrame([(t,) for t in tokens], "tok string")
        .select("tok", F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i"))
        .select("tok", "i", cms_index(F.col("tok"), F.col("i"), width).alias("idx"))
    )
    got = (
        probes.join(cells, ["i", "idx"], "left")
        .groupBy("tok")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est"))
        .collect()
    )
    return {r["tok"]: int(r["est"]) for r in got}


# --- MinCount distinct sketch ---------------------------------------------
#
# The designed contrast with the CMS above: the MinCount merge is MIN,
# which is IDEMPOTENT — folding the same batch twice cannot change a
# bucket minimum — so replay safety needs no tag at all. The tag
# column is still written (observability: which batch last touched the
# store) but is never consulted for skipping.


def mincount_maintain_batch(
    batch: DataFrame,
    store_path: str,
    group_cols: list[str],
    key_col: str,
    run_key: str,
    batch_id: int,
    n_buckets: int = 64,
) -> None:
    """Fold one micro-batch of keys into the per-group MinCount store
    (rows: group cols + b + mv)."""
    from datagouv_tools_spark.operators.sketches import mincount_buckets

    spark = batch.sparkSession
    inc = mincount_buckets(batch, group_cols, F.col(key_col), n_buckets).select(
        *group_cols, "b", F.col("mv").alias("__imv")
    )
    stored = _read_current(spark, store_path)
    if stored is not None:
        old = stored.select(*group_cols, "b", F.col("mv").alias("__omv"))
        merged = old.join(inc, [*group_cols, "b"], "full_outer").select(
            *group_cols,
            "b",
            F.least("__omv", "__imv").alias("mv"),
        )
    else:
        merged = inc.select(*group_cols, "b", F.col("__imv").alias("mv"))
    out = merged.withColumn("__run", F.lit(run_key)).withColumn(
        "__seq", F.lit(int(batch_id)).cast("bigint")
    )
    _commit_version(out, store_path)


def read_mincount(spark, store_path: str) -> DataFrame | None:
    """The maintained MinCount buckets, sans tag columns; ``None`` if
    the store has never committed a version (mirrors
    ``read_counters``)."""
    cur = _read_current(spark, store_path)
    if cur is None:
        return None
    return cur.drop("__run", "__seq")


def mincount_estimate(spark, store_path: str) -> DataFrame:
    """Per-group distinct estimates from the maintained buckets (the
    events_distinct_sketch estimator: Σ_b (2^53/(m_b+1) − 1), scaled
    ×1000 integer-exact)."""
    cells = read_mincount(spark, store_path)
    if cells is None:
        raise FileNotFoundError(
            f"MinCount store at {store_path!r} has no committed version"
        )
    group_cols = [c for c in cells.columns if c not in ("b", "mv")]
    return (
        cells.withColumn(
            "em",
            F.expr("9007199254740992000 DIV (mv + 1) - 1000").cast("decimal(38,0)"),
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("em").alias("est_distinct_mille"),
        )
    )


# --- fixed-bin histogram sketch -------------------------------------------
#
# Same replay discipline as the CMS: the bin-wise ADD merge is NOT
# idempotent, so the (run_key, batch id) tag is load-bearing, and the
# versioned store makes the accumulated distribution survive every
# crash window.


def histogram_maintain_batch(
    batch: DataFrame,
    store_path: str,
    group_cols: list[str],
    value_col: str,
    run_key: str,
    batch_id: int,
    bin_width: float = 25.0,
    n_bins: int = 20,
) -> None:
    """Fold one micro-batch of values into the per-group histogram
    store (rows: group cols + b + c)."""
    from datagouv_tools_spark.operators.sketches import histogram_cells

    spark = batch.sparkSession
    stored = _read_current(spark, store_path)
    if stored is not None:
        tag = stored.select("__run", "__seq").first()
        if (
            tag is not None
            and tag["__run"] == run_key
            and int(tag["__seq"]) >= batch_id
        ):
            return
        old = stored.select(*group_cols, "b", F.col("c").alias("__oc"))
    else:
        old = None
    inc = histogram_cells(
        batch, group_cols, F.col(value_col), bin_width, n_bins
    ).select(*group_cols, "b", F.col("c").alias("__ic"))
    if old is not None:
        merged = old.join(inc, [*group_cols, "b"], "full_outer").select(
            *group_cols,
            "b",
            (
                F.coalesce("__oc", F.lit(0)) + F.coalesce("__ic", F.lit(0))
            ).cast("bigint").alias("c"),
        )
    else:
        merged = inc.select(*group_cols, "b", F.col("__ic").cast("bigint").alias("c"))
    out = merged.withColumn("__run", F.lit(run_key)).withColumn(
        "__seq", F.lit(int(batch_id)).cast("bigint")
    )
    _commit_version(out, store_path)


def read_histogram(spark, store_path: str) -> DataFrame | None:
    """The maintained histogram cells, sans tag columns — feed to
    ``operators.sketches.histogram_quantiles`` for estimates.
    ``None`` if the store has never committed a version."""
    cur = _read_current(spark, store_path)
    if cur is None:
        return None
    return cur.drop("__run", "__seq")


def foreach_batch_histogram_maintainer(
    store_path: str,
    checkpoint: str,
    group_cols: list[str],
    value_col: str,
    bin_width: float = 25.0,
    n_bins: int = 20,
):
    """``writeStream.foreachBatch`` callback wiring
    :func:`histogram_maintain_batch` (run key from the checkpoint path,
    the CMS/index-ingest convention)."""
    from datagouv_tools_spark.streaming.index_ingest import run_key_for_checkpoint

    rk = run_key_for_checkpoint(checkpoint)

    def run(batch: DataFrame, batch_id: int) -> None:
        histogram_maintain_batch(
            batch, store_path, group_cols, value_col, rk, int(batch_id),
            bin_width, n_bins,
        )

    return run
