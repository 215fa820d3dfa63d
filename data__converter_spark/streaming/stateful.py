"""Custom stateful streaming operators (applyInPandasWithState).

The escape hatch for semantics window aggregation can't express
(SURVEY §2.10): arbitrary per-key state evolving across micro-batches.
State is partitioned by key across executors — the shuffle on the
grouping key is the only data movement, and per-key state size is the
scaling invariant to watch (bounded here: one row of counters per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)


def running_user_totals(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Per-user running (count, sum(value)) maintained across batches.

    Streaming: applyInPandasWithState with GroupState per user_id.
    Batch: the equivalent groupBy aggregate (identical final answer —
    used by tests and the DuckDB oracle).
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F

        # Accumulate in exact integer cents (order-independent, no FP
        # drift) and convert once at the edge — the streaming path below
        # does the same, so stream/batch/oracle agree bit-for-bit.
        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)))
                .cast("double")
                / F.lit(100.0)
            ).alias("total_value"),
        )

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd

        n, total_cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            v = pdf["value"].fillna(0.0).to_numpy(dtype="float64")
            total_cents += int(np.floor(v * 100.0 + 0.5).sum())
        state.update((n, total_cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [float(total_cents) / 100.0],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
