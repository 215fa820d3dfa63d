"""SCD2 / interval-merge / weighted-sample invariants.

Oracle queries (scd2_user_status, interval_coverage,
weighted_sample_customers) pin cross-engine values; these tests pin the
structural guarantees the aggregates can't see: non-overlap, contiguity,
exactly-one-current, island disjointness, and sample determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data__converter_spark.stats import weighted_sample
from data__converter_spark.temporal import merge_intervals, scd2


def _scd2_fixture(spark):
    rows = [
        # user 1: A A B B A  -> versions A, B, A
        (1, 1, "2024-01-01 00:00:00", "A"),
        (2, 1, "2024-01-01 01:00:00", "A"),
        (3, 1, "2024-01-01 02:00:00", "B"),
        (4, 1, "2024-01-01 03:00:00", "B"),
        (5, 1, "2024-01-01 04:00:00", "A"),
        # user 2: single event -> one open version
        (6, 2, "2024-01-01 00:30:00", "X"),
        # user 3: duplicate timestamps, tiebreak on event_id: C then D
        (7, 3, "2024-01-01 00:00:00", "C"),
        (8, 3, "2024-01-01 00:00:00", "D"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_scd2_collapses_runs_and_orders_versions(spark):
    dim = scd2(
        _scd2_fixture(spark), "user_id", ["event_type"], "ts", "event_id"
    )
    got = {
        (r["user_id"], str(r["valid_from"]), str(r["valid_to"]), r["event_type"])
        for r in dim.collect()
    }
    assert (1, "2024-01-01 00:00:00", "2024-01-01 02:00:00", "A") in got
    assert (1, "2024-01-01 02:00:00", "2024-01-01 04:00:00", "B") in got
    assert (1, "2024-01-01 04:00:00", "None", "A") in got
    assert (2, "2024-01-01 00:30:00", "None", "X") in got
    # duplicate-ts pair: C's interval is zero-length, D stays open
    assert (3, "2024-01-01 00:00:00", "2024-01-01 00:00:00", "C") in got
    assert (3, "2024-01-01 00:00:00", "None", "D") in got
    assert len(got) == 6


def test_scd2_invariants_on_events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = scd2(ev, "user_id", ["event_type"], "ts", "event_id").cache()
    # exactly one open (current) version per user
    per_user = dim.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    assert per_user.filter(F.col("n_open") != 1).count() == 0
    # contiguity: every closed version's valid_to is the next valid_from
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    nxt = dim.withColumn("next_from", F.lead("valid_from").over(w))
    broken = nxt.filter(
        F.col("valid_to").isNotNull()
        & (F.col("valid_to") != F.col("next_from"))
    )
    assert broken.count() == 0
    # version count == number of state changes + 1 per user (collapse)
    total_versions = dim.count()
    assert total_versions <= ev.count()
    dim.unpersist()


def test_merge_intervals_islands_disjoint(spark):
    rows = [
        ("s", 0, 10), ("s", 5, 12), ("s", 12, 15),  # touching merges
        ("s", 20, 25),                                # gap -> new island
        ("t", 1, 2), ("t", 4, 5),                     # two islands
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = merge_intervals(df, "k", "s", "e")
    got = sorted(
        (r["k"], r["island_start"], r["island_end"], r["n_merged"])
        for r in out.collect()
    )
    assert got == [
        ("s", 0, 15, 3),
        ("s", 20, 25, 1),
        ("t", 1, 2, 1),
        ("t", 4, 5, 1),
    ]


def test_merge_intervals_conserves_rows(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey",
        F.col("l_shipdate").alias("e"),
        F.date_sub("l_shipdate", 30).alias("s"),
    )
    out = merge_intervals(li, "l_suppkey", "s", "e")
    assert (
        out.agg(F.sum("n_merged")).collect()[0][0] == li.count()
    )
    # islands within a key never overlap: sort by start, check gaps
    from pyspark.sql import Window

    w = Window.partitionBy("l_suppkey").orderBy("island_start")
    nxt = out.withColumn("next_start", F.lead("island_start").over(w))
    overlapping = nxt.filter(
        F.col("next_start").isNotNull()
        & (F.col("next_start") <= F.col("island_end"))
    )
    assert overlapping.count() == 0


def test_weighted_sample_k_per_group_and_deterministic(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    w = F.greatest(
        F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("long"), F.lit(1)
    )
    a = weighted_sample(cust, "c_nationkey", "c_custkey", w, k=3)
    sizes = a.groupBy("c_nationkey").count().collect()
    group_n = {
        r["c_nationkey"]: r["count"]
        for r in cust.groupBy("c_nationkey").count().collect()
    }
    for r in sizes:
        assert r["count"] == min(3, group_n[r["c_nationkey"]])
    # re-run is bit-identical (hash-derived u, no rand())
    b = weighted_sample(cust, "c_nationkey", "c_custkey", w, k=3)
    sa = {(r["c_nationkey"], r["sample_rank"], r["c_custkey"]) for r in a.collect()}
    sb = {(r["c_nationkey"], r["sample_rank"], r["c_custkey"]) for r in b.collect()}
    assert sa == sb


def test_weighted_sample_prefers_heavy_weights(spark):
    # one whale (weight 10^6) among 200 minnows (weight 1) per group:
    # the whale must appear in every group's top-3.
    rows = [(g, g * 1000 + i, 1_000_000 if i == 0 else 1)
            for g in range(5) for i in range(200)]
    df = spark.createDataFrame(rows, "g long, id long, w long")
    out = weighted_sample(df, "g", "id", F.col("w"), k=3)
    picked = {
        (r["g"], r["id"]) for r in out.collect() if r["id"] % 1000 == 0
    }
    assert picked == {(g, g * 1000) for g in range(5)}


def test_snapshot_at_picks_containing_version(spark):
    import datetime as _dt

    from data__converter_spark.temporal import scd2, snapshot_at

    rows = [
        (1, "a", _dt.datetime(2024, 1, 1), 1),
        (1, "b", _dt.datetime(2024, 1, 10), 2),
        (2, "x", _dt.datetime(2024, 1, 5), 3),
    ]
    df = spark.createDataFrame(rows, "k int, state string, ts timestamp, eid int")
    dim = scd2(df, "k", ["state"], "ts", "eid")
    # mid-interval: key 1 is still on "a"; key 2 already on "x"
    snap = {r["k"]: r["state"] for r in snapshot_at(dim, "2024-01-07 00:00:00").collect()}
    assert snap == {1: "a", 2: "x"}
    # exactly at a boundary: half-open [from, to) -> the NEW version wins
    snap2 = {r["k"]: r["state"] for r in snapshot_at(dim, "2024-01-10 00:00:00").collect()}
    assert snap2[1] == "b"
    # before any version of key 2
    snap3 = {r["k"]: r["state"] for r in snapshot_at(dim, "2024-01-03 00:00:00").collect()}
    assert 2 not in snap3 and snap3[1] == "a"


def test_scd2_apply_incremental_equals_full_rebuild(spark):
    """The operator's contract at every possible split point of a
    change stream: apply(scd2(prefix), suffix) == scd2(full)."""
    import datetime as _dt

    from data__converter_spark.temporal import scd2, scd2_apply

    rows = [
        (1, "a", _dt.datetime(2024, 1, 1), 1),
        (1, "a", _dt.datetime(2024, 1, 3), 2),   # no-op run
        (1, "b", _dt.datetime(2024, 1, 5), 3),
        (2, "x", _dt.datetime(2024, 1, 2), 4),
        (2, "y", _dt.datetime(2024, 1, 6), 5),
        (3, "q", _dt.datetime(2024, 1, 7), 6),   # key born in suffix
        (1, "b", _dt.datetime(2024, 1, 8), 7),   # no-op vs current
        (1, "c", _dt.datetime(2024, 1, 9), 8),
    ]
    df = spark.createDataFrame(rows, "k int, state string, ts timestamp, eid int")
    full = scd2(df, "k", ["state"], "ts", "eid")
    want = sorted(map(tuple, full.collect()))
    for split_day in (2, 4, 6, 7, 8, 9):
        cut = _dt.datetime(2024, 1, split_day)
        dim = scd2(df.filter(df.ts < cut), "k", ["state"], "ts", "eid")
        got = scd2_apply(
            dim, df.filter(df.ts >= cut), "k", ["state"], "ts", "eid"
        )
        assert sorted(map(tuple, got.collect())) == want, split_day


def test_scd2_apply_drops_late_and_collapses_noop(spark):
    """Late changes (at or before the current version's valid_from)
    never rewrite history; a change equal to the current state adds no
    version; untouched keys pass through untouched."""
    import datetime as _dt

    from data__converter_spark.temporal import scd2, scd2_apply

    base = spark.createDataFrame(
        [
            (1, "a", _dt.datetime(2024, 1, 1), 1),
            (1, "b", _dt.datetime(2024, 1, 5), 2),
            (9, "z", _dt.datetime(2024, 1, 1), 3),  # untouched key
        ],
        "k int, state string, ts timestamp, eid int",
    )
    dim = scd2(base, "k", ["state"], "ts", "eid")
    changes = spark.createDataFrame(
        [
            (1, "LATE", _dt.datetime(2024, 1, 4), 10),  # before current from
            (1, "LATE", _dt.datetime(2024, 1, 5), 11),  # AT current from
            (1, "b", _dt.datetime(2024, 1, 7), 12),     # no-op vs current
        ],
        "k int, state string, ts timestamp, eid int",
    )
    got = scd2_apply(dim, changes, "k", ["state"], "ts", "eid")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, dim.collect())
    )


def test_resample_ffill_gap_days_and_day_last(spark):
    """Gap days repeat the previous state with is_observed=false; an
    observation day reports the day's LAST state under the (ts,
    tiebreak) total order; spines are per-key lifetimes."""
    import datetime as _dt

    from data__converter_spark.temporal import resample_ffill

    rows = [
        (1, "a", _dt.datetime(2024, 1, 1, 9), 1),
        (1, "b", _dt.datetime(2024, 1, 1, 18), 2),   # same-day later wins
        (1, "c", _dt.datetime(2024, 1, 4, 0), 3),    # 2 gap days before
        (2, "x", _dt.datetime(2024, 2, 1), 4),       # 1-day lifetime
    ]
    df = spark.createDataFrame(rows, "k int, state string, ts timestamp, eid int")
    got = {
        (r["k"], str(r["day"])): (r["state"], r["is_observed"])
        for r in resample_ffill(df, "k", "ts", ["state"], "eid").collect()
    }
    assert got == {
        (1, "2024-01-01"): ("b", True),
        (1, "2024-01-02"): ("b", False),
        (1, "2024-01-03"): ("b", False),
        (1, "2024-01-04"): ("c", True),
        (2, "2024-02-01"): ("x", True),
    }


def test_resample_ffill_tiebreak_within_timestamp(spark):
    """Duplicate timestamps on the last day resolve by the tiebreak —
    the same total order as scd2."""
    import datetime as _dt

    from data__converter_spark.temporal import resample_ffill

    t = _dt.datetime(2024, 1, 1, 12)
    df = spark.createDataFrame(
        [(1, "lo", t, 5), (1, "hi", t, 9)],
        "k int, state string, ts timestamp, eid int",
    )
    (row,) = resample_ffill(df, "k", "ts", ["state"], "eid").collect()
    assert row["state"] == "hi" and row["is_observed"]


def test_decayed_sum_exact_dyadic_weights(spark):
    from data__converter_spark.temporal import decayed_sum

    rows = [
        # key 1: observations on day 0 (v=1, split across two rows)
        # and day 2 (v=100); window W=3 -> weights 4, 2, 1
        (1, "2024-01-01", 1),
        (1, "2024-01-01", 0),
        (1, "2024-01-03", 100),
        # key 2: single observation, independent of key 1
        (2, "2024-01-01", 7),
    ]
    df = spark.createDataFrame(rows, "k long, day string, v long").withColumn(
        "day", F.col("day").cast("date")
    )
    got = {
        (r["k"], str(r["day"]), r["decayed_scaled"])
        for r in decayed_sum(df, "k", "day", "v", window_days=3).collect()
    }
    assert got == {
        (1, "2024-01-01", 4),        # 1*4
        (1, "2024-01-02", 2),        # 1*2
        (1, "2024-01-03", 401),      # 1*1 + 100*4
        # 2024-01-04/05 dropped: past key 1's last observed day
        (2, "2024-01-01", 28),       # 7*4 only; key 2 ends day 1
    }
