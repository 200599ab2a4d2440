"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-count). A
warmup query runs first so JVM/codegen startup is not billed to the
first measured query.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datagouv_tools_spark.session import get_spark
    from datagouv_tools_spark.queries import QUERIES

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: touch every table & exercise codegen once.
    QUERIES["q1_pricing_summary"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        df.collect()
        timings[name] = round(time.perf_counter() - start, 4)

    total = round(sum(timings.values()), 4)
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    print(
        json.dumps(
            {
                "metric": "query_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
