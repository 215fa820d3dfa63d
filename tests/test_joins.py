"""Temporal joins: as-of (carry-forward window) and range join."""

from __future__ import annotations

import pyspark.sql.functions as F

from data__converter_spark.joins import asof_join, range_join


def _ts_df(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("ts", F.to_timestamp("ts")).filter(F.col("ts").isNotNull())


def test_asof_basic_and_ties(spark):
    left = _ts_df(
        spark,
        [(1, "2024-01-01 10:00:00", "L1"), (1, "2024-01-01 12:00:00", "L2"),
         (2, "2024-01-01 09:00:00", "L3")],
        "user_id long, ts string, lv string",
    )
    right = _ts_df(
        spark,
        [(1, "2024-01-01 09:30:00", 1.0),
         (1, "2024-01-01 12:00:00", 2.0),   # exact tie with L2 -> matches
         (2, "2024-01-01 09:30:00", 3.0)],  # after L3 -> no match
        "user_id long, ts string, rv double",
    )
    out = {r.lv: r.rv_right for r in asof_join(left, right, by="user_id").collect()}
    assert out == {"L1": 1.0, "L2": 2.0, "L3": None}


def test_asof_tolerance(spark):
    left = _ts_df(
        spark, [(1, "2024-01-01 10:00:00", "L1")], "user_id long, ts string, lv string"
    )
    right = _ts_df(
        spark, [(1, "2024-01-01 08:00:00", 7.0)], "user_id long, ts string, rv double"
    )
    loose = asof_join(left, right, by="user_id").collect()[0]
    assert loose.rv_right == 7.0
    tight = asof_join(left, right, by="user_id", tolerance="30 minutes").collect()[0]
    assert tight.rv_right is None and tight.ts_right is None


def test_range_join_window_bounds(spark):
    clicks = _ts_df(
        spark,
        [(1, "2024-01-01 10:00:00", 100)],
        "user_id long, ts string, click_id long",
    )
    purchases = _ts_df(
        spark,
        [(1, "2024-01-01 10:10:00", 200),   # inside
         (1, "2024-01-01 10:30:00", 201),   # boundary (inclusive)
         (1, "2024-01-01 11:00:00", 202),   # outside
         (1, "2024-01-01 09:59:00", 203)],  # before the click
        "user_id long, ts string, purchase_id long",
    )
    out = range_join(clicks, purchases, "user_id", within="30 minutes")
    got = sorted(r.to_purchase_id for r in out.collect())
    assert got == [200, 201]


def test_sessionize_matches_session_windows(spark):
    """Session counts from row-level sessionize equal the
    session-window aggregate's session count per user (same gap)."""
    from data__converter_spark.joins import sessionize
    from data__converter_spark.session import load_events
    from data__converter_spark.streaming.windows import session_agg

    ev = load_events(spark, "/root/testdata/sf0.001")
    by_rows = (
        sessionize(ev, gap_minutes=5)
        .groupBy("user_id")
        .agg(F.max("session_no").alias("n_sessions"))
    )
    by_windows = session_agg(ev, "5 minutes").groupBy("user_id").count()
    a = {r.user_id: r.n_sessions for r in by_rows.collect()}
    b = {r.user_id: r["count"] for r in by_windows.collect()}
    assert a == b


def test_sessionize_gap_boundaries(spark):
    from data__converter_spark.joins import sessionize

    df = _ts_df(
        spark,
        [
            (1, 7, "2024-01-01 10:00:00"),
            (2, 7, "2024-01-01 10:04:59"),  # < 5 min: same session
            (3, 7, "2024-01-01 10:10:01"),  # > 5 min gap: new session
            (4, 7, "2024-01-01 10:15:01"),  # exactly 5 min: NEW ([first, last+gap))
            (5, 8, "2024-01-01 10:00:00"),  # other user: own numbering
        ],
        "event_id long, user_id long, ts string",
    )
    out = {r.event_id: r.session_no for r in sessionize(df, gap_minutes=5).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 3, 5: 1}


def test_asof_forward_and_nearest(spark):
    left = _ts_df(
        spark,
        [(1, "2024-01-01 10:00:00", "L1"), (1, "2024-01-01 12:00:00", "L2")],
        "user_id long, ts string, lv string",
    )
    right = _ts_df(
        spark,
        [(1, "2024-01-01 09:00:00", 1.0),   # 1h before L1
         (1, "2024-01-01 10:30:00", 2.0),   # 30m after L1, 90m before L2
         (1, "2024-01-01 12:00:00", 3.0)],  # exact tie with L2
        "user_id long, ts string, rv double",
    )
    fwd = {
        r.lv: r.rv_right
        for r in asof_join(left, right, by="user_id", direction="forward").collect()
    }
    assert fwd == {"L1": 2.0, "L2": 3.0}  # ties match forward too
    near = {
        r.lv: r.rv_right
        for r in asof_join(left, right, by="user_id", direction="nearest").collect()
    }
    # L1: forward 10:30 (30m) beats backward 09:00 (1h); L2: exact tie
    assert near == {"L1": 2.0, "L2": 3.0}
    # nearest + tolerance: 10 minutes excludes everything around L1
    tight = {
        r.lv: r.rv_right
        for r in asof_join(
            left, right, by="user_id", direction="nearest", tolerance="10 minutes"
        ).collect()
    }
    assert tight == {"L1": None, "L2": 3.0}


def test_asof_nearest_backward_wins_ties(spark):
    left = _ts_df(
        spark, [(1, "2024-01-01 10:00:00", "L")], "user_id long, ts string, lv string"
    )
    right = _ts_df(
        spark,
        [(1, "2024-01-01 09:30:00", 1.0), (1, "2024-01-01 10:30:00", 2.0)],
        "user_id long, ts string, rv double",
    )
    near = asof_join(left, right, by="user_id", direction="nearest").collect()[0]
    assert near.rv_right == 1.0  # equidistant -> backward wins


def test_asof_nearest_on_date_column(spark):
    """DateType `on` cannot cast date->long; nearest must route through
    the datediff distance and agree with backward/forward semantics."""
    left = spark.sql(
        "SELECT 1 AS user_id, DATE'2024-03-10' AS ts, 'L' AS lv"
    )
    right = spark.sql(
        "SELECT 1 AS user_id, DATE'2024-03-01' AS ts, 10.0 AS rv "
        "UNION ALL SELECT 1, DATE'2024-03-12', 20.0"
    )
    near = asof_join(left, right, by="user_id", direction="nearest").collect()[0]
    assert near.rv_right == 20.0  # +2 days beats -9 days
    back = asof_join(left, right, by="user_id", direction="backward").collect()[0]
    assert back.rv_right == 10.0


def test_session_paths_order_and_truncation(spark):
    """Paths are (ts, id)-ordered regardless of input order, truncate
    at max_len, and ties in the top-N break on path text."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1, one session, deliberately out of order
        (3, 1, base + dt.timedelta(seconds=2), "c", 0.0, ""),
        (1, 1, base, "a", 0.0, ""),
        (2, 1, base + dt.timedelta(seconds=1), "b", 0.0, ""),
        # user 2: same path a>b>c in one session
        (4, 2, base, "a", 0.0, ""),
        (5, 2, base + dt.timedelta(seconds=1), "b", 0.0, ""),
        (6, 2, base + dt.timedelta(seconds=2), "c", 0.0, ""),
        # user 3: new session after the 5-min gap -> two length-1 paths
        (7, 3, base, "x", 0.0, ""),
        (8, 3, base + dt.timedelta(minutes=10), "y", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    from data__converter_spark.joins import session_paths

    got = {r["path"]: r["n_sessions"] for r in session_paths(ev).collect()}
    assert got == {"a>b>c": 2, "x": 1, "y": 1}
    # max_len truncation keeps the FIRST steps
    got2 = {
        r["path"]: r["n_sessions"]
        for r in session_paths(ev, max_len=2).collect()
    }
    assert got2 == {"a>b": 2, "x": 1, "y": 1}


def test_session_paths_subsecond_ordering(spark):
    """Events 200ms apart within one session must order by time, not by
    the id tie-break a second-truncated epoch would fall back to
    (regression: the sort key is microsecond epoch, ids deliberately
    anti-ordered)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (9, 1, base + dt.timedelta(milliseconds=200), "a", 0.0, ""),
        (3, 1, base + dt.timedelta(milliseconds=800), "b", 0.0, ""),
        (1, 1, base + dt.timedelta(milliseconds=900), "c", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    from data__converter_spark.joins import session_paths

    got = {r["path"]: r["n_sessions"] for r in session_paths(ev).collect()}
    assert got == {"a>b>c": 1}


def test_session_paths_custom_column_names(spark):
    """Every consumed column is a parameter: a frame with none of the
    default names works once id_col/type_col/by/on are supplied."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (30, 7, base + dt.timedelta(seconds=2), "pay"),
        (10, 7, base, "view"),
        (20, 7, base + dt.timedelta(seconds=1), "cart"),
    ]
    ev = spark.createDataFrame(
        rows, "eid long, uid long, at timestamp, kind string"
    )
    from data__converter_spark.joins import session_paths

    got = {
        r["path"]: r["n_sessions"]
        for r in session_paths(
            ev, by="uid", on="at", id_col="eid", type_col="kind"
        ).collect()
    }
    assert got == {"view>cart>pay": 1}


def test_entity_canonicalize_maps_every_record(spark):
    """Every record maps to exactly one canonical id; canonicals map to
    themselves; the map is idempotent (canonical of canonical = self)."""
    from data__converter_spark.workloads import q_entity_canonicalize

    rows = {
        r["c_custkey"]: r
        for r in q_entity_canonicalize(spark, "/root/testdata/sf0.001").collect()
    }
    assert rows  # non-empty
    canon = {k: r["canonical_id"] for k, r in rows.items()}
    for k, c in canon.items():
        assert canon[c] == c, f"canonical {c} of {k} is not a fixed point"
        assert rows[c]["is_canonical"]
        assert c <= k or rows[k]["is_canonical"] is False or c == k


def test_event_transitions_counts_and_milli_probs(spark):
    from data__converter_spark.joins import event_transitions

    rows = [
        # user 1: A -> B -> A -> B  (steps: A>B, B>A, A>B)
        (1, 1, "A"), (2, 1, "B"), (3, 1, "A"), (4, 1, "B"),
        # user 2: B -> B
        (5, 2, "B"), (6, 2, "B"),
    ]
    df = spark.createDataFrame(rows, "eid long, uid long, st string").withColumn(
        "ts", F.col("eid").cast("timestamp")
    )
    got = {
        tuple(r)
        for r in event_transitions(df, "uid", "ts", "st", tiebreak="eid")
        .select("from_state", "to_state", "n", "from_total", "prob_milli")
        .collect()
    }
    assert got == {
        ("A", "B", 2, 2, 1000),
        ("B", "A", 1, 2, 500),
        ("B", "B", 1, 2, 500),
    }


def test_event_transitions_duplicate_ts_resolved_by_tiebreak(spark):
    from data__converter_spark.joins import event_transitions

    rows = [(1, 1, "X"), (2, 1, "Y")]  # same ts; eid orders X before Y
    df = spark.createDataFrame(rows, "eid long, uid long, st string").withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    got = [
        (r["from_state"], r["to_state"])
        for r in event_transitions(df, "uid", "ts", "st", tiebreak="eid").collect()
    ]
    assert got == [("X", "Y")]
