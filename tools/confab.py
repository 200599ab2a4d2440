"""Interleaved conf A/B: time a query subset with a session-mutable SQL
conf set toggled on/off inside ONE SparkSession, ABBA pass order, so
ambient load drift cancels (same methodology as ``bench.py --against``,
which cannot see conf-only changes because both arms share the session).

Usage:
  python tools/confab.py "k=v[,k=v...]" query [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_AB_PASSES (default 3).

Only session-mutable confs (spark.sql.*) can be A/B'd this way; a core
conf (spark.io.*, spark.executor.*) needs separate processes and is out
of scope here.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    confs = dict(kv.split("=", 1) for kv in sys.argv[1].split(","))
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("SPARK_GRAFT_AB_PASSES", "3"))

    from datagouv_tools_spark.queries import QUERIES
    from datagouv_tools_spark.session import get_spark

    spark = get_spark("confab")
    spark.sparkContext.setLogLevel("ERROR")
    base = {k: spark.conf.get(k, None) for k in confs}

    def set_arm(on: bool) -> None:
        for k in confs:
            v = confs[k] if on else base[k]
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    times: dict[str, dict[str, list[float]]] = {
        arm: {n: [] for n in names} for arm in ("on", "off")
    }
    for p in range(-1, passes):  # pass -1 = warmup, untimed
        seq = ["on", "off"] if p % 2 == 0 else ["off", "on"]
        for arm in seq:
            set_arm(arm == "on")
            for name in names:
                start = time.perf_counter()
                QUERIES[name](spark, sf_dir).collect()
                dt = time.perf_counter() - start
                if p >= 0:
                    times[arm][name].append(dt)
    set_arm(False)
    rows = {}
    for name in names:
        on = round(min(times["on"][name]), 4)
        off = round(min(times["off"][name]), 4)
        rows[name] = {
            "on_min": on,
            "off_min": off,
            "ratio_on_over_off": round(on / off, 3) if off else None,
        }
    total_on = round(sum(v["on_min"] for v in rows.values()), 4)
    total_off = round(sum(v["off_min"] for v in rows.values()), 4)
    print(
        json.dumps(
            {
                "confs": confs,
                "passes": passes,
                "total_on": total_on,
                "total_off": total_off,
                "total_ratio": round(total_on / total_off, 4) if total_off else None,
                "queries": rows,
            },
            indent=1,
            sort_keys=True,
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
