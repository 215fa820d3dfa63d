"""SparkSession factory.

Defaults are sized for the local[32] test harness but the knobs are the
ones that matter on a real cluster too: AQE for runtime re-planning
(skew joins, partition coalescing), Arrow for any pandas-UDF hop, and a
shuffle-partition count matched to parallelism instead of the legacy 200.

At 100 TB the same settings hold: AQE coalesces the 32-way default up or
down per-stage, ``maxPartitionBytes`` keeps scan tasks ~128 MB, and
broadcast thresholds let small dimension tables skip the shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "data__converter_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Parameters mirror what a deployment would override: ``master`` from
    the cluster manager, ``shuffle_partitions`` sized to data volume
    (rule of thumb: total shuffle bytes / 128 MB), plus arbitrary conf.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # The driver's events table stores TIMESTAMP(NANOS) parquet,
        # which Spark rejects natively; read as int64 nanos and convert
        # via ts_col() where timestamp semantics are needed.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        # Headless engine: the status stores still populate with the UI
        # off, and the SQL store retains the PLAN STRING of every
        # execution (default 1000).  Long-lived sessions running many
        # composed-plan jobs (gate/bench/test harnesses) accumulate
        # driver heap they never serve — cap the retention.
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.ui.retainedJobs", "200")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "20000")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_warehouse"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ts_col(name: str = "ts"):
    """Nanosecond-epoch long column -> TimestampType (microsecond
    truncation — Spark's native precision)."""
    from pyspark.sql import functions as F

    return F.timestamp_micros((F.col(name) / 1000).cast("long"))


def load_events(spark: SparkSession, sf_dir: str):
    """events table with ``ts`` as a proper timestamp column.

    The events parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects unless ``nanosAsLong`` is on. External harnesses build
    their own SparkSession without our builder-time conf, so set it here
    on the *passed-in* session — it is a runtime-settable SQL conf.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ->ltz cast + date_format parity assume UTC; harness sessions
    # may not set it (runtime-settable, idempotent).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # Canonical ts type is TIMESTAMP (ltz): nanos-long (the driver's
    # TIMESTAMP(NANOS) files under the legacy conf) converts via
    # timestamp_micros; a TIMESTAMP_NTZ file casts (session tz is UTC)
    # — watermarks and streaming event time require ltz, and NTZ
    # refuses direct epoch casts in Spark 4.
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", ts_col("ts"))
    elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the driver-provided parquet tables from ``sf_dir``.

    Returns a dict name -> DataFrame. Lazy — nothing is scanned until an
    action; Catalyst prunes columns/predicates into the parquet reader.
    """
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
