#!/usr/bin/env python
"""py4j round-trip census per query BUILD (VERDICT r11 next-round #4).

Every Column operator / F.lit / conf access is one py4j socket
round-trip (~250-350 µs measured); a query builder that loops over
wide literals pays thousands per build — on every bench repeat, and as
driver-side job-submission latency in production. This counts
``send_command`` invocations on the live gateway while each query's
DataFrame is CONSTRUCTED (no action), the same methodology as the r11
census (OPTIMIZATION_r11.md §10).

Usage: python tools/rpccensus.py [query ...]      # default: all batch
Writes RPCCENSUS.json {query: n_round_trips_per_build}, prints the
top offenders. Builds that run bounded driver jobs (iterative inits)
include those jobs' py4j control traffic — comparable across runs of
the same tool, which is how before/after deltas are read.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    from datagouv_tools_spark.queries import QUERIES
    from datagouv_tools_spark.session import get_spark

    names = [a for a in argv if not a.startswith("--")]
    if not names:
        names = [n for n in QUERIES if "stream" not in n]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("rpccensus")
    spark.sparkContext.setLogLevel("ERROR")

    client = spark.sparkContext._gateway._gateway_client
    counter = {"n": 0}
    orig = client.send_command

    def counted(*args, **kwargs):
        counter["n"] += 1
        return orig(*args, **kwargs)

    client.send_command = counted
    try:
        # one throwaway build so table-load memos don't bill the first
        QUERIES[names[0]](spark, sf_dir)
        census: dict[str, int] = {}
        for name in names:
            counter["n"] = 0
            QUERIES[name](spark, sf_dir)
            census[name] = counter["n"]
            print(f"{name}: {census[name]}", file=sys.stderr)
    finally:
        client.send_command = orig

    out = os.environ.get("SPARK_GRAFT_RPCCENSUS", "RPCCENSUS.json")
    with open(out, "w") as fh:
        json.dump(
            {
                "total": sum(census.values()),
                "queries": dict(
                    sorted(census.items(), key=lambda kv: -kv[1])
                ),
            },
            fh,
            indent=1,
        )
    top = sorted(census.items(), key=lambda kv: -kv[1])[:12]
    print(json.dumps({"total": sum(census.values()), "top": top}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
