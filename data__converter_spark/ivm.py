"""Incremental aggregate (materialized-view) maintenance.

Beyond-reference warehouse op (SURVEY §7.1 M5 family): keep a keyed
aggregate table current by merging a small delta batch into the
standing state instead of re-scanning the base table.  This is the
shape a 100 TB pipeline actually runs: the state table is key-sized
(millions of rows, not billions), the delta is one ingest batch, and
the refresh cost is ``O(|delta| + |state|)`` with a single hash
exchange — the base table is never touched again.

Only *mergeable* measures are supported (sum / min / max, with count
expressed as ``sum(1)``), exactly the algebra Spark's own partial
aggregation uses map-side: merging two states is the same operation as
building one, so ``merge(state(A), state(B)) == state(A ∪ B)`` holds
by construction and is pinned both by pytest and by the DuckDB
full-recompute oracle (`incremental_agg_orders`).  Non-mergeable
aggregates (exact distinct, medians) need a sketch instead — see
``llmops.sketches`` (HLL/KMV) and ``stats.group_quantiles_disc``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# measure -> (build fn over raw rows, combine fn over partial states).
# For sum/min/max the two coincide; count REBUILDS as count(*) but
# COMBINES as sum — the classic count-combines-as-sum rule.
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "count": (lambda _c: F.count(F.lit(1)), F.sum),
}


def aggregate_state(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, Column | str | None]],
) -> DataFrame:
    """Build a mergeable aggregate state from raw rows.

    ``measures`` maps output column name -> (fn, input column) with fn
    in {sum, min, max, count} (count ignores the input).  One
    map-side-combining hash aggregate; the output is keyed and
    key-sized.
    """
    aggs = []
    for name, (fn, col) in measures.items():
        if fn not in _MERGEABLE:
            raise ValueError(f"non-mergeable measure {fn!r} for {name!r}")
        build, _combine = _MERGEABLE[fn]
        c = F.col(col) if isinstance(col, str) else col
        aggs.append(build(c).alias(name))
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    states: list[DataFrame],
    keys: list[str],
    measures: dict[str, tuple[str, Column | str | None]],
) -> DataFrame:
    """Merge aggregate states built by :func:`aggregate_state` over
    disjoint row sets: union the (small, key-sized) state frames and
    re-aggregate with each measure's COMBINE function — count combines
    as sum, sum/min/max combine as themselves.  Keys present in only
    one state pass through (union, not outer join, so there is no
    null-vs-absent asymmetry to patch up).  One hash exchange over
    key-sized input; the base table is not in the plan at all.
    """
    if not states:
        raise ValueError("merge_states needs at least one state")
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    aggs = []
    for name, (fn, _col) in measures.items():
        _build, combine = _MERGEABLE[fn]
        aggs.append(combine(F.col(name)).alias(name))
    return unioned.groupBy(*keys).agg(*aggs)


def refresh_incremental(
    state: DataFrame,
    delta_rows: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, Column | str | None]],
) -> DataFrame:
    """One maintenance step: aggregate the delta batch, merge it into
    the standing state.  Equivalent to rebuilding from base ∪ delta
    (pytest-pinned) at a cost independent of the base table's size."""
    return merge_states(
        [state, aggregate_state(delta_rows, keys, measures)], keys, measures
    )
