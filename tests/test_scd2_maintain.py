"""streaming/scd2_maintain: stream == batch intervals, and redelivery
is a no-op (the foreachBatch at-least-once obligation)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datagouv_tools_spark.sources.catalog import load_table
from datagouv_tools_spark.streaming.scd2_maintain import (
    read_intervals,
    scd2_batch,
)


def _batch_islands(ev):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    grp = marked.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("island"),
    )
    return grp.groupBy("user_id", "event_type", "island").agg(
        F.min("ts").alias("valid_from"),
        F.max("ts").alias("valid_to"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


def _sorted(df):
    cols = ["user_id", "island", "event_type"]
    return [tuple(r) for r in df.orderBy(*cols).collect()]


def test_scd2_stream_equals_batch_and_redelivery_noop(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    split_ts = ev.agg(F.percentile_approx("ts", 0.5, 1000000)).collect()[0][0]
    cols = ["user_id", "event_type", "ts", "event_id"]
    b1 = ev.filter(F.col("ts") < split_ts).select(*cols)
    b2 = ev.filter(F.col("ts") >= split_ts).select(*cols)
    base, iv = str(tmp_path / "base"), str(tmp_path / "iv")

    scd2_batch(spark, b1, base, iv, n_buckets=4)
    scd2_batch(spark, b2, base, iv, n_buckets=4)
    got = _sorted(read_intervals(spark, iv))
    want = _sorted(_batch_islands(ev))
    assert got == want

    # redeliver batch 2 (at-least-once): stores must not change
    scd2_batch(spark, b2, base, iv, n_buckets=4)
    assert _sorted(read_intervals(spark, iv)) == want

    # redeliver batch 1 out of order: still a no-op (id membership)
    scd2_batch(spark, b1, base, iv, n_buckets=4)
    assert _sorted(read_intervals(spark, iv)) == want
