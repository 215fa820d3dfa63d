"""Incremental aggregate maintenance (ivm.py): the merge of partial
states must equal the full recompute — the invariant the
`incremental_agg_orders` DuckDB oracle pins end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data__converter_spark.ivm import (
    aggregate_state,
    merge_states,
    refresh_incremental,
)

MEASURES = {
    "n": ("count", None),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_equals_full_recompute(spark):
    data = [(k, v) for k in ("a", "b", "c") for v in range(1, 7)]
    df = spark.createDataFrame(data, "k string, v long")
    full = aggregate_state(df, ["k"], MEASURES)
    left = aggregate_state(df.filter(F.col("v") <= 2), ["k"], MEASURES)
    mid = aggregate_state(
        df.filter((F.col("v") > 2) & (F.col("v") <= 4)), ["k"], MEASURES
    )
    right = aggregate_state(df.filter(F.col("v") > 4), ["k"], MEASURES)
    merged = merge_states([left, mid, right], ["k"], MEASURES)
    assert _rows(merged) == _rows(full)


def test_keys_in_one_state_pass_through(spark):
    a = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    b = spark.createDataFrame([("b", 3), ("c", 4)], "k string, v long")
    merged = merge_states(
        [aggregate_state(a, ["k"], MEASURES), aggregate_state(b, ["k"], MEASURES)],
        ["k"],
        MEASURES,
    )
    got = {r["k"]: (r["n"], r["total"], r["lo"], r["hi"]) for r in merged.collect()}
    assert got == {"a": (1, 1, 1, 1), "b": (2, 5, 2, 3), "c": (1, 4, 4, 4)}


def test_refresh_incremental_matches_rebuild(spark, orders):
    measures = {
        "n_orders": ("count", None),
        "max_price": ("max", "o_totalprice"),
        "first_order": ("min", "o_orderdate"),
    }
    split = F.lit("1996-01-01").cast("date")
    state = aggregate_state(
        orders.filter(F.col("o_orderdate") < split), ["o_custkey"], measures
    )
    merged = refresh_incremental(
        state, orders.filter(F.col("o_orderdate") >= split),
        ["o_custkey"], measures,
    )
    rebuilt = aggregate_state(orders, ["o_custkey"], measures)
    assert _rows(merged) == _rows(rebuilt)


def test_merge_plan_never_touches_base(spark):
    """The maintenance step's plan reads only the two state frames —
    no scan of the base table may appear (the whole point of IVM)."""
    base = spark.createDataFrame([("a", 1)], "k string, v long")
    state = aggregate_state(base, ["k"], MEASURES)
    state = spark.createDataFrame(state.collect(), state.schema)  # materialized
    delta = spark.createDataFrame([("a", 5), ("d", 2)], "k string, v long")
    out = refresh_incremental(state, delta, ["k"], MEASURES)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LocalRelation") + plan.count("LogicalRDD") <= 2


def test_non_mergeable_measure_rejected(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    with pytest.raises(ValueError, match="non-mergeable"):
        aggregate_state(df, ["k"], {"bad": ("avg", "v")})
