"""Matched engine/DuckDB bench windows (VERDICT r13 #5 / r14 #6).

Each window: calm probes -> one full bench.py run (engine) -> one
same-session DuckDB regen of every oracle (tools/duckdb_bench.py
protocol, inline) -> calm probes again.  Probes time two reference
queries (one heavy, one trivial) so a window polluted by background
load is visible in the record instead of silently skewing the ratio.

Output: BENCH_r{N}_windows.json with the same shape as
BENCH_r13_windows.json — per-window engine totals + per-query seconds,
the same-session DuckDB totals, matched ratios, and the documented
composite (min per query across engine windows vs min per query across
DuckDB regens).

Usage: python tools/bench_windows.py [--windows 5] [--round 15]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBES = ["dedup_components", "nation_volume"]


def run_probes() -> dict:
    """Time the probe queries in a fresh short-lived session."""
    code = r"""
import json, sys, time
sys.path.insert(0, %r)
from data__converter_spark.session import get_spark
from data__converter_spark.workloads import QUERIES
sf = %r
spark = get_spark("probe", extra_conf={"spark.ui.showConsoleProgress": "false"})
out = {}
for name in %r:
    t0 = time.time()
    QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 2)
print("PROBE_JSON " + json.dumps(out))
spark.stop()
""" % (REPO, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
       PROBES)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600,
    )
    for line in r.stdout.splitlines():
        if line.startswith("PROBE_JSON "):
            return json.loads(line[len("PROBE_JSON "):])
    raise RuntimeError(f"probe failed: {r.stdout[-500:]} {r.stderr[-500:]}")


def run_engine_bench() -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in reversed(r.stdout.splitlines()):
        line = line.strip()
        if line.startswith('{"metric"'):
            return json.loads(line)
    raise RuntimeError(f"bench failed: {r.stdout[-800:]} {r.stderr[-800:]}")


def run_duckdb() -> dict:
    import duckdb

    from data__converter_spark.workloads import ORACLES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 32}")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    timings: dict[str, float | None] = {}
    for name, sql in ORACLES.items():
        times = []
        try:
            for _ in range(3):
                t0 = time.time()
                con.execute(sql).fetchall()
                times.append(time.time() - t0)
            timings[name] = round(min(times), 3)
        except Exception as e:  # recorded, not fatal
            timings[name] = None
            print(f"# duckdb {name}: ERROR {e}", file=sys.stderr)
    con.close()
    return timings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--round", type=int, default=15)
    args = ap.parse_args()

    record: dict = {
        "note": (
            f"Round-{args.round} engine windows at sf0.1, full registry, "
            "one bench.py run per window (best-of-3 passes per query "
            "inside), each paired with a SAME-SESSION DuckDB regen of "
            "every oracle (best-of-3 per query, 32 threads) and calm "
            "probes before/after. Composite = min per query across "
            "engine windows vs min per query across DuckDB regens "
            "(the documented r10-r13 form)."
        ),
        "windows": {},
    }
    eng_q: dict[str, list[float]] = {}
    duck_q: dict[str, list[float]] = {}
    for w in range(args.windows):
        t_w = time.time()
        pb = run_probes()
        eng = run_engine_bench()
        duck = run_duckdb()
        pa = run_probes()
        duck_total = round(
            sum(v for v in duck.values() if v is not None), 1
        )
        record["windows"][f"w{w}"] = {
            "value": eng["value"],
            "n_queries": eng.get("n_queries"),
            "pass_totals": eng.get("pass_totals"),
            "duckdb_same_session_total": duck_total,
            "matched_ratio": round(eng["value"] / duck_total, 2),
            "probes_before": pb,
            "probes_after": pa,
            "queries": eng["queries"],
            "duckdb_queries": duck,
            "window_wall_s": round(time.time() - t_w, 1),
        }
        for k, v in eng["queries"].items():
            eng_q.setdefault(k, []).append(v)
        for k, v in duck.items():
            if v is not None:
                duck_q.setdefault(k, []).append(v)
        out = os.path.join(REPO, f"BENCH_r{args.round}_windows.json")
        with open(out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"window w{w}: engine {eng['value']} / duckdb {duck_total} "
              f"= {eng['value']/duck_total:.2f}x", flush=True)

    # composite: engine min per bench row (incl. _other) vs duckdb min
    # per query — engine buckets the fast tail into _other, so compare
    # totals built the same way: engine total = sum of row minima;
    # duckdb total = sum of per-query minima.
    eng_total = round(sum(min(v) for v in eng_q.values()), 1)
    duck_total = round(sum(min(v) for v in duck_q.values()), 1)
    record["composite_min_per_query"] = {
        "engine_total": eng_total,
        "duckdb_min_total": duck_total,
        "ratio": round(eng_total / duck_total, 2),
        "note": (
            "min per engine bench row (named rows + _other) across all "
            "windows vs min per oracle query across all same-session "
            "DuckDB regens"
        ),
    }
    out = os.path.join(REPO, f"BENCH_r{args.round}_windows.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["composite_min_per_query"]))


if __name__ == "__main__":
    main()
