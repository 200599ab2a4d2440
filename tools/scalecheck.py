#!/usr/bin/env python
"""Scaling-curve harness: run queries at sf0.001 / sf0.01 / sf0.1 and
report how wall time grows across 100× data.

The number that matters for the 100 TB argument is the RATIO between
scale factors, not the absolute seconds: a query whose median is flat
across 100× is dominated by fixed scheduling cost (its data term is
safely sub-linear at these sizes); one whose time grows ~100× is
linear; anything growing faster than the data is a red flag that the
plan has a quadratic term. Output is one JSON line per query plus a
summary — append interesting rows to SCALE.md.

Usage:
    python tools/scalecheck.py                  # a curated default set
    python tools/scalecheck.py q1_pricing_summary doc_dedup_pipeline
    python tools/scalecheck.py --all            # every non-streaming query
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "doc_dedup_pipeline",
    "doc_cluster_dedup_scalable",
    "hybrid_dedup_clusters",
    "emb_pq_codes",
    "emb_ivfpq_topk_indexed",
    "events_distinct_sketch",
    "doc_token_cms",
    "lineitem_bloom_prefilter",
    "orders_incremental_rollup",
    "events_zorder_cells",
    "doc_pps_sample",
]

SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main(argv: list[str]) -> int:
    from datagouv_tools_spark import queries as q
    from datagouv_tools_spark.session import get_spark

    if "--all" in argv:
        names = [n for n in q.QUERIES if "stream" not in n]
    elif argv:
        names = argv
    else:
        names = DEFAULT
    unknown = [n for n in names if n not in q.QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("scalecheck", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    flagged = []
    report: dict[str, dict] = {}
    for name in names:
        fn = q.QUERIES[name]
        row: dict = {"query": name}
        for sf in SFS:
            d = f"/root/testdata/{sf}"
            fn(spark, d).collect()  # warmup (codegen + file listing)
            ts = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, d).collect()
                ts.append(time.time() - t0)
            row[sf] = round(sorted(ts)[1], 3)
            # min is the least contention-polluted sample on this box
            # (±2x ambient swings, SCALE.md §20) — the RATIO verdict
            # keys off minima so a loaded moment at one sf doesn't
            # fake a superlinear curve.
            row[sf + "_min"] = round(min(ts), 3)
        ratio = row["sf0.1_min"] / max(row["sf0.001_min"], 1e-9)
        row["x100_ratio"] = round(ratio, 2)
        # 100x data growing >50x wall = the data term is ~linear and
        # already dominant; >150x = super-linear, investigate the plan
        row["verdict"] = (
            "flat" if ratio < 3 else "sublinear" if ratio < 50 else
            "linear" if ratio < 150 else "SUPERLINEAR"
        )
        if row["verdict"] == "SUPERLINEAR":
            flagged.append(name)
        report[name] = row
        print(json.dumps(row))
    summary = {
        "n": len(names),
        "superlinear": flagged,
        "verdicts": {
            v: sum(1 for r in report.values() if r["verdict"] == v)
            for v in ("flat", "sublinear", "linear", "SUPERLINEAR")
        },
        "load_context": {
            "loadavg": [round(x, 2) for x in os.getloadavg()],
            "cpus": os.cpu_count(),
        },
    }
    print(json.dumps({"summary": summary}))
    out = os.environ.get("SPARK_GRAFT_SCALECURVES")
    if out is None and "--all" in argv:
        out = "SCALECURVES.json"
    if out:
        with open(out, "w") as fh:
            json.dump({"summary": summary, "queries": report}, fh, indent=1)
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
