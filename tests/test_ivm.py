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


def test_join_view_refresh_equals_full_rebuild(spark):
    """refresh_join_view == full rebuild over (fact ∪ Δfact) ⋈
    (dim ∪ Δdim), including the late-dimension case: a base-fact row
    whose dim key arrives only in Δdim must surface via the
    fact_state ⋈ Δdim term."""
    from data__converter_spark.ivm import (
        join_view_state,
        refresh_join_view,
    )

    fact_rows = [  # (k, v)
        ("a", 10), ("a", 5), ("b", 7), ("c", 100),  # base; c's dim is LATE
    ]
    dfact_rows = [("a", 1), ("d", 3)]               # d's dim arrives in the same delta
    dim_rows = [("a", "g1"), ("b", "g2")]
    ddim_rows = [("c", "g1"), ("d", "g2")]

    measures = {
        "n": ("count", None),
        "s": ("sum", "v"),
        "mx": ("max", "v"),
    }
    fact = spark.createDataFrame(fact_rows, "k string, v long")
    dfact = spark.createDataFrame(dfact_rows, "k string, v long")
    dim = spark.createDataFrame(dim_rows, "k string, g string")
    ddim = spark.createDataFrame(ddim_rows, "k string, g string")

    fs = aggregate_state(fact, ["k"], measures)
    view = join_view_state(fs, dim, "k", ["g"], measures)
    new_view, new_fs = refresh_join_view(
        view, fs, dim, dfact, ddim, "k", ["g"], measures
    )
    got = {(r["g"], r["n"], r["s"], r["mx"]) for r in new_view.collect()}
    # full rebuild
    full = (
        fact.unionByName(dfact)
        .join(dim.unionByName(ddim), "k")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.max("v").alias("mx"),
        )
    )
    want = {(r["g"], r["n"], r["s"], r["mx"]) for r in full.collect()}
    assert got == want
    # the fact state advanced too: it must equal the full fact aggregate
    fs_want = {
        tuple(r)
        for r in aggregate_state(
            fact.unionByName(dfact), ["k"], measures
        ).collect()
    }
    assert {tuple(r) for r in new_fs.collect()} == fs_want


def test_join_view_refresh_never_rescans_base_fact(spark):
    """Both returned frames' plans contain only state/delta/dim
    relations — the base fact table is absent (delta-sized cost)."""
    from data__converter_spark.ivm import (
        join_view_state,
        refresh_join_view,
    )

    measures = {"n": ("count", None), "s": ("sum", "v")}
    base = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    fs0 = aggregate_state(base, ["k"], measures)
    fs = spark.createDataFrame(fs0.collect(), fs0.schema)  # materialized state
    dim = spark.createDataFrame([("a", "g")], "k string, g string")
    view0 = join_view_state(fs, dim, "k", ["g"], measures)
    view = spark.createDataFrame(view0.collect(), view0.schema)
    dfact = spark.createDataFrame([("a", 9)], "k string, v long")
    ddim = spark.createDataFrame([("b", "g")], "k string, g string")
    new_view, new_fs = refresh_join_view(
        view, fs, dim, dfact, ddim, "k", ["g"], measures
    )
    for frame, n_rel in ((new_view, 6), (new_fs, 2)):
        plan = frame._jdf.queryExecution().optimizedPlan().toString()
        # view plan: view + fact_state + dim + dfact + ddim(x2 — it
        # feeds both the full-dimension union and the fact-state
        # term); fact-state plan: fact_state + dfact.  A base-fact
        # rescan would add a relation beyond these bounds.
        assert (
            plan.count("LocalRelation") + plan.count("LogicalRDD") <= n_rel
        )


def test_retractions_equal_rebuild_and_drop_empty_keys(spark):
    from data__converter_spark.ivm import refresh_with_retractions

    measures = {"n": ("count", None), "s": ("sum", "v")}
    base = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 7), ("c", 3)], "k string, v long"
    )
    state = aggregate_state(base, ["k"], measures)
    # retract one of a's rows and ALL of c's
    retract = spark.createDataFrame(
        [("a", 5, -1), ("c", 3, -1)], "k string, v long, sign long"
    )
    out = {
        (r["k"], r["n"], r["s"])
        for r in refresh_with_retractions(
            state, retract, ["k"], measures, "sign", "n"
        ).collect()
    }
    # c is ABSENT, not present-with-zeros
    assert out == {("a", 1, 10), ("b", 1, 7)}


def test_mixed_insert_and_retract_in_one_batch(spark):
    from data__converter_spark.ivm import refresh_with_retractions

    measures = {"n": ("count", None), "s": ("sum", "v")}
    state = aggregate_state(
        spark.createDataFrame([("a", 10)], "k string, v long"), ["k"], measures
    )
    delta = spark.createDataFrame(
        [("a", 10, -1), ("a", 4, 1), ("d", 6, 1)], "k string, v long, sign long"
    )
    out = {
        (r["k"], r["n"], r["s"])
        for r in refresh_with_retractions(
            state, delta, ["k"], measures, "sign", "n"
        ).collect()
    }
    assert out == {("a", 1, 4), ("d", 1, 6)}


def test_min_max_rejected_as_non_retractable(spark):
    from data__converter_spark.ivm import signed_state

    df = spark.createDataFrame([("a", 1, 1)], "k string, v long, sign long")
    with pytest.raises(ValueError, match="not retractable"):
        signed_state(df, ["k"], {"mx": ("max", "v")}, "sign")


def test_over_retraction_stays_surfaced_and_nets_out(spark):
    """A retraction for a never-inserted key must NOT vanish: the -1
    row stays in the state (visible debt), and the late matching
    insert nets it back to exactly zero — at which point the key
    correctly disappears. Silently dropping the negative row would
    make the late insert resurrect the key at count 1, diverging from
    the full rebuild."""
    from data__converter_spark.ivm import refresh_with_retractions

    measures = {"n": ("count", None), "s": ("sum", "v")}
    state = aggregate_state(
        spark.createDataFrame([("a", 1)], "k string, v long"), ["k"], measures
    )
    # retract x before its insert ever arrived
    early_retract = spark.createDataFrame(
        [("x", 5, -1)], "k string, v long, sign long"
    )
    s1 = refresh_with_retractions(
        state, early_retract, ["k"], measures, "sign", "n"
    )
    got1 = {(r["k"], r["n"], r["s"]) for r in s1.collect()}
    assert ("x", -1, -5) in got1  # surfaced, not dropped
    # the late insert arrives: x nets to zero and leaves the state
    late_insert = spark.createDataFrame(
        [("x", 5, 1)], "k string, v long, sign long"
    )
    s2 = refresh_with_retractions(
        s1, late_insert, ["k"], measures, "sign", "n"
    )
    got2 = {(r["k"], r["n"], r["s"]) for r in s2.collect()}
    assert got2 == {("a", 1, 1)}


# ---------------------------------------------------------------------------
# retractable top-k extrema state
# ---------------------------------------------------------------------------


def _tk(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _signed(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, sign long")


def _state_map(state):
    return {
        r["k"]: (list(r["topk"]), r["n_rows"], r["needs_rescan"])
        for r in state.collect()
    }


def test_topk_state_build_and_bounds(spark):
    from data__converter_spark.ivm import topk_state

    rows = [("a", 10), ("a", 9), ("a", 9), ("a", 8), ("a", 1), ("b", 5)]
    got = _state_map(topk_state(_tk(spark, rows), ["k"], "v", 3))
    # duplicates kept with multiplicity, descending, capped at k
    assert got["a"] == ([10, 9, 9], 5, False)
    assert got["b"] == ([5], 1, False)


def test_topk_retraction_exact_within_window(spark):
    from data__converter_spark.ivm import (
        refresh_topk_with_retractions,
        topk_state,
    )

    st = topk_state(_tk(spark, [("a", 10), ("a", 9), ("a", 8)]), ["k"], "v", 3)
    # window holds ALL rows -> retracting the max stays exact, no flag
    out = refresh_topk_with_retractions(
        st, _signed(spark, [("a", 10, -1)]), ["k"], "v", "sign", 3
    )
    assert _state_map(out)["a"] == ([9, 8], 2, False)


def test_topk_flags_when_window_underfull_vs_survivors(spark):
    from data__converter_spark.ivm import (
        refresh_topk_with_retractions,
        repair_topk,
        topk_state,
    )

    base = _tk(spark, [("a", 10), ("a", 9), ("a", 8)])  # k=2: 8 forgotten
    st = topk_state(base, ["k"], "v", 2)
    assert _state_map(st)["a"] == ([10, 9], 3, False)
    out = refresh_topk_with_retractions(
        st, _signed(spark, [("a", 9, -1)]), ["k"], "v", "sign", 2
    )
    # window [10], but 2 rows survive and k=2 -> the forgotten 8 is
    # unknowable from state: flagged
    topk, n, flag = _state_map(out)["a"]
    assert (topk, n, flag) == ([10], 2, True)
    # repair rescans ONLY flagged keys from the surviving base
    surviving = _tk(spark, [("a", 10), ("a", 8)])
    fixed = _state_map(repair_topk(out, surviving, ["k"], "v", 2))
    assert fixed["a"] == ([10, 8], 2, False)


def test_topk_same_batch_refill_is_flagged_not_trusted(spark):
    """The adversarial case the two-phase check exists for: one batch
    retracts a stored value AND inserts a smaller one.  The merged
    window [10, 6] looks full (size == min(k, n_rows) == 2) but the
    true second-max is the forgotten 8 — the retraction-only
    intermediate ([10], vs 2 survivors) must flag."""
    from data__converter_spark.ivm import (
        refresh_topk_with_retractions,
        repair_topk,
        topk_state,
    )

    st = topk_state(_tk(spark, [("a", 10), ("a", 9), ("a", 8)]), ["k"], "v", 2)
    out = refresh_topk_with_retractions(
        st,
        _signed(spark, [("a", 9, -1), ("a", 6, 1)]),
        ["k"],
        "v",
        "sign",
        2,
    )
    topk, n, flag = _state_map(out)["a"]
    assert n == 3 and flag is True
    surviving = _tk(spark, [("a", 10), ("a", 8), ("a", 6)])
    assert _state_map(repair_topk(out, surviving, ["k"], "v", 2))["a"] == (
        [10, 8],
        3,
        False,
    )


def test_topk_insert_only_never_flags_and_untouched_pass_through(spark):
    from data__converter_spark.ivm import (
        refresh_topk_with_retractions,
        topk_state,
    )

    st = topk_state(
        _tk(spark, [("a", 5), ("a", 4), ("b", 7)]), ["k"], "v", 2
    )
    out = refresh_topk_with_retractions(
        st,
        _signed(spark, [("a", 6, 1), ("c", 1, 1)]),
        ["k"],
        "v",
        "sign",
        2,
    )
    got = _state_map(out)
    assert got["a"] == ([6, 5], 3, False)  # eviction of 4, no flag
    assert got["b"] == ([7], 1, False)     # untouched: byte-identical row
    assert got["c"] == ([1], 1, False)     # brand-new key from delta


def test_topk_full_retraction_drops_key_and_debt_stays(spark):
    from data__converter_spark.ivm import (
        refresh_topk_with_retractions,
        topk_state,
    )

    st = topk_state(_tk(spark, [("a", 3), ("b", 4)]), ["k"], "v", 2)
    out = refresh_topk_with_retractions(
        st,
        _signed(spark, [("a", 3, -1), ("z", 9, -1)]),
        ["k"],
        "v",
        "sign",
        2,
    )
    got = _state_map(out)
    assert "a" not in got                      # netted to zero: absent
    assert got["z"] == ([], -1, False)         # over-retraction debt row
    assert got["b"] == ([4], 1, False)


def test_topk_unflagged_matches_bruteforce_over_random_steps(spark):
    """Property-style sequence: after several mixed batches, every
    UNFLAGGED key's window equals the true top-min(k, n) of the
    surviving multiset, and every key whose window diverges is
    flagged."""
    import random

    from data__converter_spark.ivm import (
        refresh_topk_with_retractions,
        topk_state,
    )

    rnd = random.Random(42)
    k = 3
    live = {"a": [], "b": [], "c": []}
    base_rows = []
    for key in live:
        for _ in range(rnd.randint(3, 8)):
            v = rnd.randint(0, 20)
            live[key].append(v)
            base_rows.append((key, v))
    st = topk_state(_tk(spark, base_rows), ["k"], "v", k)
    for _step in range(3):
        batch = []
        for key in live:
            for _ in range(rnd.randint(0, 3)):
                if live[key] and rnd.random() < 0.5:
                    v = rnd.choice(live[key])
                    live[key].remove(v)
                    batch.append((key, v, -1))
                else:
                    v = rnd.randint(0, 20)
                    live[key].append(v)
                    batch.append((key, v, 1))
        if not batch:
            continue
        st = refresh_topk_with_retractions(
            st, _signed(spark, batch), ["k"], "v", "sign", k
        )
    got = _state_map(st)
    for key, vals in live.items():
        if not vals:
            assert key not in got
            continue
        want = sorted(vals, reverse=True)[: min(k, len(vals))]
        topk, n, flag = got[key]
        assert n == len(vals)
        if not flag:
            assert topk == want, f"unflagged key {key} diverged"


def test_topk_same_batch_insert_retract_cancels_exactly(spark):
    """Round-10 regression (hypothesis-found, VERDICT r10 #1): a batch
    containing insert(4) AND retract(4) over base {5,3} with k=2 must
    net to a no-op — the pre-fix cell arithmetic applied the negative
    leg against the stored multiplicity first (clamped at zero), so
    the retraction vanished and the insert leg re-added a phantom 4
    into an UNFLAGGED window ([5,4] where the truth is [5,3])."""
    from data__converter_spark.ivm import (
        refresh_topk_with_retractions,
        topk_state,
    )

    st = topk_state(_tk(spark, [("a", 5), ("a", 3)]), ["k"], "v", 2)
    out = refresh_topk_with_retractions(
        st, _signed(spark, [("a", 4, 1), ("a", 4, -1)]), ["k"], "v", "sign", 2
    )
    assert _state_map(out)["a"] == ([5, 3], 2, False)


def test_topk_flag_midpoint_uses_netted_negatives(spark):
    """The flag threshold's surviving-row midpoint must use the
    per-cell NETTED negative sum: over base {5,3,2} (k=2, window
    [5,3]) a batch of retract(5), retract(3), insert(9), retract(9)
    leaves one live row ({2}) outside the window — with the raw
    (un-netted) negative sum the midpoint reads zero and the empty
    window sails through unflagged."""
    from data__converter_spark.ivm import (
        refresh_topk_with_retractions,
        topk_state,
    )

    st = topk_state(_tk(spark, [("a", 5), ("a", 3), ("a", 2)]), ["k"], "v", 2)
    out = refresh_topk_with_retractions(
        st,
        _signed(spark, [("a", 5, -1), ("a", 3, -1), ("a", 9, 1), ("a", 9, -1)]),
        ["k"],
        "v",
        "sign",
        2,
    )
    topk, n, flag = _state_map(out)["a"]
    assert n == 1
    assert flag, "under-full window with a live survivor must flag"


def test_topk_all_cancelling_batch_leaves_key_untouched(spark):
    """A batch whose every cell nets to zero must not move the key at
    all — netted-zero cells are dropped before delta_keys, so the key
    rides the untouched anti-join fast path."""
    from data__converter_spark.ivm import (
        refresh_topk_with_retractions,
        topk_state,
    )

    st = topk_state(_tk(spark, [("a", 5), ("a", 3)]), ["k"], "v", 2)
    out = refresh_topk_with_retractions(
        st,
        _signed(spark, [("a", 7, 1), ("a", 7, -1), ("a", 3, 1), ("a", 3, -1)]),
        ["k"],
        "v",
        "sign",
        2,
    )
    assert _state_map(out)["a"] == ([5, 3], 2, False)
