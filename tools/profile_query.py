"""Per-query measurement harness for the optimization rounds.

Times named queries (noop sink, same methodology as bench.py), counts
the Spark jobs each invocation submits (the local-mode per-job floor is
the dominant term for composed lifecycle queries), and dumps
``explain("formatted")`` to plans/<tag>/<query>_<suffix>.txt.

Usage:
  python tools/profile_query.py [--passes N] [--plans plans/r14] \
      [--suffix before] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from data__converter_spark.scale import release_persisted
    from data__converter_spark.session import get_spark
    from data__converter_spark.workloads import QUERIES

    spark = get_spark(
        "profile", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    sc = spark.sparkContext

    # Warm identically to bench.py so pass minima are comparable.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{args.sf_dir}/orders.parquet").limit(1000)
    warm = (
        orders.join(orders.select("o_orderkey"), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .select("o_orderstatus", F.row_number().over(Window.orderBy("n")).alias("r"))
    )
    warm.write.format("noop").mode("overwrite").save()
    orders.limit(8).mapInPandas(lambda it: it, orders.schema).write.format(
        "noop"
    ).mode("overwrite").save()

    def n_jobs() -> int:
        # DAGScheduler.nextJobId is the total jobs submitted so far.
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    out = {}
    for name in args.queries:
        fn = QUERIES[name]
        times, jobs = [], []
        for i in range(args.passes):
            sc.setJobDescription(f"{name} pass {i}")
            j0 = n_jobs()
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            jobs.append(n_jobs() - j0)
            release_persisted()
            if args.plans and i == 0:
                # For stateful lifecycle queries the df above is already
                # the final frame — explain it directly (re-deriving
                # would re-run the state build).
                os.makedirs(args.plans, exist_ok=True)
                with open(
                    os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
                ) as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")))
        out[name] = {"times": times, "min": min(times), "jobs": jobs}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
