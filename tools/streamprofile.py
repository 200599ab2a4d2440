"""Per-batch cost breakdown for the two heaviest streaming queries.

Replays `doc_scrub_stream`'s scrub gate and `orders_join_ivm_stream`'s
join maintainer at two scale factors and prints, per micro-batch, the
input row count and the engine-reported durations (addBatch = the
foreachBatch body, triggerExecution = whole batch) straight from
``StreamingQuery.recentProgress`` — the evidence for whether per-batch
cost scales with rows (genuine data work) or is fixed (harness).

Usage: python tools/streamprofile.py [sf_dir ...]   (default: sf0.01 sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _progress_rows(q) -> list[dict]:
    out = []
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else json.loads(p.json)
        out.append(
            {
                "batch": d.get("batchId"),
                "rows": d.get("numInputRows"),
                "addBatch_ms": (d.get("durationMs") or {}).get("addBatch"),
                "trigger_ms": (d.get("durationMs") or {}).get(
                    "triggerExecution"
                ),
            }
        )
    return out


def profile_scrub(spark, sf_dir: str) -> dict:
    from datagouv_tools_spark.queries import _scrub_stream_fixture
    from datagouv_tools_spark.streaming.scrub_gate import stream_scrub

    src = _scrub_stream_fixture(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="scrubprof_")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    t0 = time.perf_counter()
    q = stream_scrub(
        stream, f"{tmp}/store", f"{tmp}/out", f"{tmp}/ckpt", seg_len=8,
        n_buckets=8,
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    batches = _progress_rows(q)
    shutil.rmtree(tmp, ignore_errors=True)
    return {"query": "doc_scrub_stream", "sf_dir": sf_dir, "wall_s": round(wall, 2), "batches": batches}


def profile_join_ivm(spark, sf_dir: str) -> dict:
    from datagouv_tools_spark.queries import _join_ivm_stream_fixture
    from datagouv_tools_spark.streaming.join_maintain import (
        foreach_batch_join_maintainer,
    )

    src = _join_ivm_stream_fixture(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="ivmprof_")
    stream = (
        spark.readStream.schema(
            "side string, op string, o_orderkey bigint, "
            "o_orderpriority string, l_linenumber int, l_extendedprice double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    t0 = time.perf_counter()
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_join_maintainer(
                f"{tmp}/store",
                tmp,
                ["o_orderkey"],
                ["o_orderpriority"],
                ["l_linenumber", "l_extendedprice"],
            )
        )
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    batches = _progress_rows(q)
    shutil.rmtree(tmp, ignore_errors=True)
    return {"query": "orders_join_ivm_stream", "sf_dir": sf_dir, "wall_s": round(wall, 2), "batches": batches}


def main() -> None:
    from datagouv_tools_spark.session import get_spark

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark()
    # engine warm-up so the first profiled stream doesn't carry the
    # one-time micro-batch class-loading cost (see bench.py)
    from pyspark.sql import functions as F

    from datagouv_tools_spark.streaming.source import (
        read_events_stream,
        run_to_memory,
    )

    run_to_memory(
        read_events_stream(spark, sf_dirs[0])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n")),
        output_mode="complete",
    ).collect()

    results = []
    for sf_dir in sf_dirs:
        for fn in (profile_scrub, profile_join_ivm):
            r = fn(spark, sf_dir)
            results.append(r)
            print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
