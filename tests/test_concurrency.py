"""The distributed prefix-sum sweep-line (events_session_concurrency)
must equal a naive single-window global running sum — including
sessions that span day boundaries (the cross-day carry path)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _deltas(spark, spans):
    rows = []
    for uid, sno, s, e in spans:
        rows.append((uid, sno, s, 1))
        rows.append((uid, sno, e, -1))
    return spark.createDataFrame(
        rows, "user_id long, session_no long, ts timestamp, delta int"
    ).withColumn("day", F.date_trunc("day", F.col("ts")))


def test_two_phase_prefix_equals_global_window(spark):
    d0 = dt.datetime(2024, 3, 1)
    spans = [
        # overnight session: opens day 1, closes day 2 (carry != 0)
        (1, 1, d0 + dt.timedelta(hours=23), d0 + dt.timedelta(hours=25)),
        (2, 1, d0 + dt.timedelta(hours=23, minutes=30), d0 + dt.timedelta(hours=26)),
        # back-to-back at the same instant (boundary-inclusive tie)
        (3, 1, d0 + dt.timedelta(hours=2), d0 + dt.timedelta(hours=3)),
        (4, 1, d0 + dt.timedelta(hours=3), d0 + dt.timedelta(hours=4)),
        # second day activity on top of the carried-over sessions
        (5, 1, d0 + dt.timedelta(hours=24, minutes=30), d0 + dt.timedelta(hours=27)),
    ]
    deltas = _deltas(spark, spans)

    order = [F.col("ts"), F.desc("delta"), F.col("user_id"), F.col("session_no")]
    naive = deltas.withColumn(
        "run",
        F.sum("delta").over(
            Window.orderBy(*order).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    wday = (
        Window.partitionBy("day")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    woff = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        deltas.groupBy("day")
        .agg(F.sum("delta").alias("dsum"))
        .withColumn("offset", F.coalesce(F.sum("dsum").over(woff), F.lit(0)))
        .select("day", "offset")
    )
    two_phase = (
        deltas.withColumn("run0", F.sum("delta").over(wday))
        .join(F.broadcast(offs), "day")
        .withColumn("run", F.col("run0") + F.col("offset"))
    )

    key = lambda r: (r.ts, -r.delta, r.user_id, r.session_no)  # noqa: E731
    got = {key(r): r.run for r in two_phase.collect()}
    want = {key(r): r.run for r in naive.collect()}
    assert got == want
    # the overnight carry really exercises a non-zero offset
    assert any(r.offset != 0 for r in offs.collect())
