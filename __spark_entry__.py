"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship compare-diff summary at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 for the driver's DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data__converter_spark import workloads

SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: keyed full-outer diff of orders vs perturbed variant,
    classified added/deleted/changed/same with status counts."""
    return workloads.q_compare_diff_summary(spark, SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(workloads.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(workloads.ORACLES)
