"""Per-query DuckDB timings of the oracle SQL suite — the baseline
ledger behind BASELINE.md's 2× bar.

Runs every ORACLES entry against DuckDB (32 threads) at the given
sf dir and prints one JSON object {query: seconds}. Queries named in
--skip are recorded as null. (Historical: dedup_ngram_jaccard's
oracle was the quadratic doc-pair self-join until round 10 — ~17 min
at sf0.1, carried as a round-1 constant; it is now the same Σdf²
inverted-postings form the engine uses, ~2 s, so nothing is skipped
by default.)

Usage: python tools/duckdb_bench.py [sf_dir] [--skip q1,q2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    import duckdb

    argv = sys.argv[1:]
    args: list[str] = []
    skip: set[str] = set()
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--skip":  # space-separated form: --skip q1,q2
            i += 1
            if i < len(argv):
                skip |= set(argv[i].split(","))
        elif a.startswith("--skip="):
            skip |= set(a.split("=", 1)[1].split(","))
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    from data__converter_spark.workloads import ORACLES

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 32}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    # Best-of-N per query (default 3) — the SAME protocol as the
    # engine's bench.py, so the two ledgers are symmetric: both report
    # steady-state plan cost, neither leaks first-touch noise into the
    # comparison. Override with DUCKDB_BENCH_PASSES=1 for the old
    # single-pass behavior.
    passes = max(1, int(os.environ.get("DUCKDB_BENCH_PASSES", "3")))
    timings: dict[str, float | None] = {}
    for name, sql in ORACLES.items():
        if name in skip:
            timings[name] = None
            continue
        times: list[float] = []
        try:
            for _ in range(passes):
                t0 = time.time()
                con.execute(sql).fetchall()
                times.append(time.time() - t0)
            timings[name] = round(min(times), 3)
        except Exception as e:
            timings[name] = None
            print(f"# {name}: ERROR {e}", file=sys.stderr)
    total = sum(v for v in timings.values() if v is not None)
    print(json.dumps({"sf_dir": sf_dir, "total_timed_s": round(total, 1),
                      "passes": passes, "skipped": sorted(skip),
                      "queries": timings}))


if __name__ == "__main__":
    main()
