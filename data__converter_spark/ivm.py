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


def _combine_aggs(
    measures: dict[str, tuple[str, Column | str | None]],
) -> list[Column]:
    aggs = []
    for name, (fn, _col) in measures.items():
        _build, combine = _MERGEABLE[fn]
        aggs.append(combine(F.col(name)).alias(name))
    return aggs


def join_view_state(
    fact_state: DataFrame,
    dim: DataFrame,
    join_key: str,
    view_keys: list[str],
    measures: dict[str, tuple[str, Column | str | None]],
) -> DataFrame:
    """Build the JOIN-VIEW aggregate (e.g. revenue per nation =
    orders ⋈ customer grouped by nation) FROM THE FACT-SIDE STATE, not
    the fact table: the per-join-key partial aggregate joins the
    dimension and re-aggregates with each measure's COMBINE function
    (count combines as sum).  Both inputs are key-sized; the base fact
    is not in the plan."""
    joined = fact_state.join(dim, join_key)
    return joined.groupBy(*view_keys).agg(*_combine_aggs(measures))


def refresh_join_view(
    view_state: DataFrame,
    fact_state: DataFrame,
    dim: DataFrame,
    delta_fact: DataFrame,
    delta_dim: DataFrame,
    join_key: str,
    view_keys: list[str],
    measures: dict[str, tuple[str, Column | str | None]],
) -> tuple[DataFrame, DataFrame]:
    """One maintenance step for an aggregated JOIN view under inserts
    to BOTH sides — the classic delta-join identity
    ``Δ(F ⋈ D) = ΔF ⋈ (D ∪ ΔD)  ∪  F ⋈ ΔD`` restated over STATES so no
    term ever touches the base fact table:

    - new fact rows aggregate to a delta state and join the FULL
      dimension (old ∪ new — this term also covers ΔF ⋈ ΔD);
    - new dimension rows join the standing FACT-SIDE state — the
      key-sized partial aggregate stands in for every historical fact
      row, which is exactly why the fact state is maintained at all
      (a fact row whose dimension key arrives LATE is invisible in the
      view until this term picks it up — inner-join semantics
      preserved under out-of-order arrival);
    - both contributions merge into the view with COMBINE functions,
      and the delta state merges into the fact state for the next
      step.

    Requires insert-only deltas with ``delta_dim`` keys disjoint from
    ``dim`` (the CDC-upsert/SCD2 ops above handle mutation; fact-side
    deletes are :func:`refresh_with_retractions` below — signed
    states, sum/count only).  Every frame in
    the plan is delta- or key-sized: cost is
    ``O(|Δ| + |states| + |dim|)`` per step, independent of base-fact
    size — the property that makes nightly refresh at 100 TB a join
    of small tables.  Returns ``(new_view_state, new_fact_state)``;
    equivalence to the full rebuild is pinned by pytest and by the
    ``ivm_join_nation`` DuckDB full-recompute oracle.
    """
    delta_fs = aggregate_state(delta_fact, [join_key], measures)
    dim_full = dim.unionByName(delta_dim)
    contrib_a = delta_fs.join(dim_full, join_key)
    contrib_b = fact_state.join(delta_dim, join_key)
    delta_view = (
        contrib_a.select(*view_keys, *measures)
        .unionByName(contrib_b.select(*view_keys, *measures))
        .groupBy(*view_keys)
        .agg(*_combine_aggs(measures))
    )
    new_view = merge_states([view_state, delta_view], view_keys, measures)
    new_fact_state = merge_states([fact_state, delta_fs], [join_key], measures)
    return new_view, new_fact_state


def signed_state(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, Column | str | None]],
    sign_col: str | Column,
) -> DataFrame:
    """Build a SIGNED aggregate state from a delta batch that mixes
    inserts (+1) and retractions (-1).

    Only the abelian-group measures survive retraction: ``sum``
    contributes ``sign * value`` and ``count`` contributes ``sign`` —
    subtracting is just adding the inverse. ``min``/``max`` are
    rejected: they are semilattice-only (no inverse — retracting the
    current max needs the full group re-scanned; keep those in the
    insert-only path or a sketch).
    """
    s = F.col(sign_col) if isinstance(sign_col, str) else sign_col
    aggs = []
    for name, (fn, col) in measures.items():
        if fn == "sum":
            c = F.col(col) if isinstance(col, str) else col
            aggs.append(F.sum(s * c).alias(name))
        elif fn == "count":
            aggs.append(F.sum(s).alias(name))
        else:
            raise ValueError(
                f"measure {name!r} ({fn}) is not retractable — min/max "
                "have no inverse; use the insert-only path"
            )
    return df.groupBy(*keys).agg(*aggs)


def refresh_with_retractions(
    state: DataFrame,
    delta_rows: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, Column | str | None]],
    sign_col: str | Column,
    count_measure: str,
) -> DataFrame:
    """One maintenance step under inserts AND deletes: merge the
    signed delta state into the standing state, then DROP keys whose
    ``count_measure`` reaches exactly zero — a fully-retracted key
    must leave the view entirely (count 0 is 'absent', not 'present
    with zeros'; the full-recompute oracle has no such row, and
    neither may we).

    A NEGATIVE count (the caller retracted rows never inserted) stays
    IN the state — surfaced, not silently dropped: filtering it out
    would both hide the defect and break rebuild equivalence on the
    next step (the late matching insert must net the key back to
    exactly zero, which needs the -1 row still standing). Readers
    that must not see debt rows filter ``count_measure > 0``
    explicitly at the edge.

    Same cost shape as :func:`refresh_incremental`: one union + one
    hash exchange over key-sized frames; the base is never rescanned.
    Equivalence to the full rebuild over (base rows minus retracted
    rows) is pinned by pytest and the ``ivm_retract_orders`` oracle.
    """
    delta = signed_state(delta_rows, keys, measures, sign_col)
    merged = merge_states([state, delta], keys, measures)
    return merged.filter(F.col(count_measure) != 0)
