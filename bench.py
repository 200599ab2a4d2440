"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "batch_total": N, "streaming_total": N, "queries_min": {...}, "repeats": 3}

Methodology (hardened in round 3 per VERDICT r02 "What's wrong" #1):

- A warmup query runs first so JVM/codegen startup is not billed to the
  first measured query.
- Every query is executed ``REPEATS`` times; the reported number is the
  MEDIAN (robust to transient contention on a shared box), with the MIN
  kept alongside in ``queries_min`` so a reader can spot noise
  (median >> min ⇒ contention, not code).
- Variance pinning (round 7, per VERDICT r06 "What's wrong" #5): the
  cross-round regression signal is ``queries_min`` / ``batch_total_min``
  — the min over repeats is the least contaminated estimate of the
  plan's real cost on a noisy shared box (same-code totals swung ±20%+
  across r6 runs; medians absorb ambient load, minima don't). Queries
  whose median/min ratio exceeds ``NOISE_RATIO`` get up to
  ``EXTRA_REPEATS`` additional samples so their min is drawn from a
  larger pool, and the run records its load context (loadavg before and
  after, cpu count) so a reader can tell a loaded run from a quiet one.
- Streaming replays (micro-batch availableNow pipelines, ~2-9 s of
  fixed per-batch overhead regardless of data volume) run LAST and are
  totalled separately in ``streaming_total`` so suite-total comparisons
  across rounds track the batch engine, not micro-batch scheduling.
"""

from __future__ import annotations

import json
import os
import statistics
import time

REPEATS = 3
# median/min above this ratio ⇒ the samples are contention-polluted:
# draw extra repeats so the reported min comes from a larger pool.
NOISE_RATIO = 1.5
EXTRA_REPEATS = 2


def _is_streaming(name: str) -> bool:
    return "stream" in name


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datagouv_tools_spark.session import get_spark
    from datagouv_tools_spark.queries import QUERIES

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: touch every table & exercise codegen once; the timing is
    # discarded so JVM start is excluded from all measurements.
    QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
    # Streaming-engine warmup: the FIRST streaming query in a session
    # pays ~2-3 s of one-time micro-batch-engine class loading (r7
    # profile: identical query 4.1 s cold → 0.85 s warm). Run one
    # throwaway tiny stream so that cost never lands in any measured
    # sample — it would otherwise pollute the first streaming query's
    # MIN, which is now the cross-round regression signal.
    from pyspark.sql import functions as _F

    from datagouv_tools_spark.streaming.source import (
        read_events_stream,
        run_to_memory,
    )

    run_to_memory(
        read_events_stream(spark, sf_dir).groupBy("event_type").agg(
            _F.count(_F.lit(1)).alias("n")
        ),
        output_mode="complete",
    ).collect()

    ordered = [n for n in QUERIES if not _is_streaming(n)] + [
        n for n in QUERIES if _is_streaming(n)
    ]

    load_before = os.getloadavg()

    medians: dict[str, float] = {}
    minima: dict[str, float] = {}
    n_samples: dict[str, int] = {}
    for name in ordered:
        fn = QUERIES[name]
        samples: list[float] = []
        for _ in range(REPEATS):
            start = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - start)
        extra = 0
        while (
            extra < EXTRA_REPEATS
            and statistics.median(samples) > NOISE_RATIO * min(samples)
        ):
            start = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - start)
            extra += 1
        medians[name] = round(statistics.median(samples), 4)
        minima[name] = round(min(samples), 4)
        n_samples[name] = len(samples)

    batch_total = round(sum(v for n, v in medians.items() if not _is_streaming(n)), 4)
    streaming_total = round(sum(v for n, v in medians.items() if _is_streaming(n)), 4)
    batch_total_min = round(
        sum(v for n, v in minima.items() if not _is_streaming(n)), 4
    )
    streaming_total_min = round(
        sum(v for n, v in minima.items() if _is_streaming(n)), 4
    )
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    payload = {
        "metric": "query_suite_total",
        "value": round(batch_total + streaming_total, 4),
        "unit": "sec",
        "queries": medians,
        "queries_min": minima,
        "batch_total": batch_total,
        "streaming_total": streaming_total,
        # regression signal: compare THESE across rounds, not medians
        "batch_total_min": batch_total_min,
        "streaming_total_min": streaming_total_min,
        "repeats": REPEATS,
        # actual per-query sample pool (REPEATS + noise-triggered
        # extras) — minima from larger pools are distinguishable
        "max_repeats": REPEATS + EXTRA_REPEATS,
        "queries_samples": n_samples,
        "load_context": {
            "loadavg_before": [round(x, 2) for x in load_before],
            "loadavg_after": [round(x, 2) for x in os.getloadavg()],
            "cpus": os.cpu_count(),
        },
        "sf": sf,
    }
    print(json.dumps(payload))
    # The driver's BENCH_r{N}.json keeps only the tail of stdout, which
    # truncates the first ~50 per-query entries out of the stored
    # record; a sidecar file preserves every row so rounds can be
    # compared query-for-query.
    full_path = os.environ.get("SPARK_GRAFT_BENCH_FULL", "bench_full.json")
    with open(full_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
