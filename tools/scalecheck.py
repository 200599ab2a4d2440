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
    python tools/scalecheck.py --x1000          # 1000x tail for the
        # sublinear set (VERDICT r10 #5): synthesizes an sf1-equivalent
        # dataset once (10x replication of sf0.1 with per-replica key
        # remapping + name/text salting, so FKs stay shard-consistent
        # and blocking/dedup queries see unique-ish entities instead of
        # pathological clones), times sf0.001 vs sf1, and merges
        # x1000_ratio/x1000_verdict into SCALECURVES.json.
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

# the 12 sublinear verdicts from the r10 full sweep — the queries
# whose asymptote the 100x window resolves least
X1000_DEFAULT = [
    "revenue_cube",
    "events_session_stats",
    "events_gap_sessions",
    "customer_name_fuzzy_pairs",
    "small_quantity_revenue",
    "orders_lineitem_join_size_sketch",
    "doc_segment_dedup",
    "doc_boilerplate_scrub",
    "customer_entity_resolution",
    "doc_heavy_hitters_verified",
    "part_association_rules",
    "doc_retrieval_rrf",
]

SF1_DIR = "/tmp/spark_graft_sf1_v1"


def ensure_sf1() -> str:
    """Materialize the sf1-equivalent dataset (10x sf0.1) once.

    Replication, not regeneration: every table crossed with
    range(10); surrogate keys get a per-replica stride of
    (max_key + 1) so each replica is a self-consistent FK shard
    (orders of replica 3 point at customers of replica 3); names and
    document text get a replica suffix so blocking keys and dedup
    fingerprints see ~unique entities — pure clones would hand the
    fuzzy/dedup queries 10x-deep identical blocks, a distribution
    real 10x data does not have."""
    import duckdb

    done = os.path.join(SF1_DIR, "_DONE")
    if os.path.exists(done):
        return SF1_DIR
    os.makedirs(SF1_DIR, exist_ok=True)
    con = duckdb.connect()
    src = "/root/testdata/sf0.1"

    def stride(table: str, key: str) -> int:
        return con.execute(
            f"SELECT max({key}) + 1 FROM "
            f"read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]

    plain = {"region": None, "nation": None}
    ko, kc, kp, ks = (
        stride("orders", "o_orderkey"),
        stride("customer", "c_custkey"),
        stride("part", "p_partkey"),
        stride("supplier", "s_suppkey"),
    )
    ke, ku = stride("events", "event_id"), stride("events", "user_id")
    kd, kv = stride("documents", "doc_id"), stride("embeddings", "vec_id")
    selects = {
        "customer": f"c_custkey + r.rep * {kc} AS c_custkey, "
        "c_name || ' r' || r.rep AS c_name, c_nationkey, c_acctbal, "
        "c_mktsegment",
        "supplier": f"s_suppkey + r.rep * {ks} AS s_suppkey, "
        "s_name || ' r' || r.rep AS s_name, s_nationkey, s_acctbal",
        "part": f"p_partkey + r.rep * {kp} AS p_partkey, "
        "p_name || ' r' || r.rep AS p_name, p_brand, p_type, p_size, "
        "p_retailprice",
        "orders": f"o_orderkey + r.rep * {ko} AS o_orderkey, "
        f"o_custkey + r.rep * {kc} AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority",
        "lineitem": f"l_orderkey + r.rep * {ko} AS l_orderkey, "
        f"l_partkey + r.rep * {kp} AS l_partkey, "
        f"l_suppkey + r.rep * {ks} AS l_suppkey, l_linenumber, "
        "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        "l_linestatus, l_shipdate",
        "events": f"event_id + r.rep * {ke} AS event_id, ts, "
        f"user_id + r.rep * {ku} AS user_id, event_type, value, props",
        "documents": f"doc_id + r.rep * {kd} AS doc_id, "
        "text || ' r' || r.rep AS text, lang, source, n_chars",
        "embeddings": f"vec_id + r.rep * {kv} AS vec_id, embedding, "
        "label",
    }
    for table in plain:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet'))"
            f" TO '{SF1_DIR}/{table}.parquet' (FORMAT parquet)"
        )
    for table, sel in selects.items():
        con.execute(
            f"COPY (SELECT {sel} FROM "
            f"read_parquet('{src}/{table}.parquet'), "
            "range(0, 10) r(rep)"
            f") TO '{SF1_DIR}/{table}.parquet' (FORMAT parquet)"
        )
    with open(done, "w") as fh:
        fh.write("ok\n")
    return SF1_DIR


def x1000_main(argv: list[str]) -> int:
    from datagouv_tools_spark import queries as q
    from datagouv_tools_spark.session import get_spark

    names = [a for a in argv if not a.startswith("--")] or X1000_DEFAULT
    sf1 = ensure_sf1()
    spark = get_spark("scalecheck", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    rows = {}
    flagged = []
    for name in names:
        fn = q.QUERIES[name]
        row = {"query": name}
        for label, d in (("sf0.001", "/root/testdata/sf0.001"), ("sf1", sf1)):
            fn(spark, d).collect()  # warmup
            ts = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).collect()
                ts.append(time.time() - t0)
            row[label + "_min"] = round(min(ts), 3)
        ratio = row["sf1_min"] / max(row["sf0.001_min"], 1e-9)
        row["x1000_ratio"] = round(ratio, 2)
        # 1000x data: <3 = still overhead-bound; <500 sublinear; <1500
        # ~linear; beyond that the plan has a super-linear term
        row["x1000_verdict"] = (
            "flat" if ratio < 3 else "sublinear" if ratio < 500 else
            "linear" if ratio < 1500 else "SUPERLINEAR"
        )
        if row["x1000_verdict"] == "SUPERLINEAR":
            flagged.append(name)
        rows[name] = row
        print(json.dumps(row))
    out = os.environ.get("SPARK_GRAFT_SCALECURVES", "SCALECURVES.json")
    if os.path.exists(out):
        with open(out) as fh:
            data = json.load(fh)
        for name, row in rows.items():
            data.setdefault("queries", {}).setdefault(name, {}).update(
                {k: v for k, v in row.items() if k.startswith("x1000")
                 or k == "sf1_min"}
            )
        data.setdefault("summary", {})["x1000"] = {
            "n": len(rows),
            "superlinear": flagged,
            "verdicts": {
                v: sum(
                    1 for r in rows.values() if r["x1000_verdict"] == v
                )
                for v in ("flat", "sublinear", "linear", "SUPERLINEAR")
            },
        }
        with open(out, "w") as fh:
            json.dump(data, fh, indent=1)
    print(json.dumps({"x1000_superlinear": flagged}))
    return 1 if flagged else 0


def main(argv: list[str]) -> int:
    from datagouv_tools_spark import queries as q
    from datagouv_tools_spark.session import get_spark

    if "--x1000" in argv:
        return x1000_main([a for a in argv if a != "--x1000"])
    if "--all" in argv:
        names = [n for n in q.QUERIES if "stream" not in n]
    elif [a for a in argv if not a.startswith("--")]:
        names = [a for a in argv if not a.startswith("--")]
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
    if out is None and "--merge" in argv:
        # refresh a few changed queries in place without clobbering
        # the full-sweep record (r11)
        out = "SCALECURVES.json"
        if os.path.exists(out):
            with open(out) as fh:
                prior = json.load(fh)
            merged = prior.get("queries", {})
            merged.update(report)
            with open(out, "w") as fh:
                json.dump(
                    {"summary": prior.get("summary", summary),
                     "queries": merged},
                    fh, indent=1,
                )
            return 1 if flagged else 0
    if out:
        with open(out, "w") as fh:
            json.dump({"summary": summary, "queries": report}, fh, indent=1)
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
