"""Temporal join operators Spark's API lacks: as-of and range joins.

Both are compositions of existing DataFrame ops (no UDF, no Catalyst
rule — SURVEY's "custom operator" tier (a)):

- :func:`asof_join` — for each left row, the latest right row at or
  before its timestamp (per key, optional tolerance). Implemented with
  the union + carry-forward-window trick: tag sides, union, window per
  key ordered by time, ``last(value, ignorenulls=True)`` carries the
  most recent right values onto each left row. ONE shuffle on the key
  (the window), no join node at all — the shape that survives a
  billion-row fact table, vs. the naive inequality join whose
  worst case is per-key cross products.

- :func:`range_join` — pairs within a time window (attribution: each
  'to' event matched to 'from' events in the preceding ``within``
  interval). An equi-join on the key with the range as a post-filter;
  at scale add a coarse time-bucket to the join key (``bucket=True``)
  so a long-lived key's events don't all meet in one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of join (pandas ``merge_asof`` semantics) per ``by`` key;
    ties (equal timestamps) match in every direction.

    - ``backward`` (default): latest right row with ``right.on <= left.on``
    - ``forward``: earliest right row with ``right.on >= left.on``
    - ``nearest``: whichever of the two is closer (backward wins ties)

    ``tolerance`` (e.g. ``'30 minutes'``) nulls the matched values when
    the matched right timestamp is farther than the tolerance in the
    joined direction. Output: all left columns + ``{col}{suffix}`` for
    each of ``right_cols`` + ``{on}{suffix}`` (the matched right
    timestamp, null when no match).

    One shuffle on the ``by`` key for every direction: the tagged union
    sorts within the partition (ascending for backward, descending for
    forward, both sorts — same exchange — for nearest).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    by = [by] if isinstance(by, str) else (by or [])
    right_cols = right_cols or [
        c for c in right.columns if c != on and c not in set(by)
    ]
    left_cols = [c for c in left.columns if c != on and c not in set(by)]

    l_tag = left.select(
        *by,
        F.col(on),
        F.lit(1).alias("__is_left__"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}__") for c in right_cols],
        F.lit(None).cast(right.schema[on].dataType).alias("__r_ts__"),
    )
    r_tag = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__is_left__"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"__r_{c}__") for c in right_cols],
        F.col(on).alias("__r_ts__"),
    )
    u = l_tag.unionByName(r_tag)

    # right rows order before left rows at the same timestamp (in the
    # traversal direction) so an exact-timestamp match is visible to
    # the left row — inclusive <= / >=.
    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).desc(), F.col("__is_left__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    windows = {"backward": [("b", wb)], "forward": [("f", wf)]}.get(
        direction, [("b", wb), ("f", wf)]
    )
    carried = u.select(
        *by,
        F.col(on),
        "__is_left__",
        *left_cols,
        *[
            F.last(f"__r_{c}__", ignorenulls=True).over(w).alias(f"__{d}_{c}__")
            for d, w in windows
            for c in right_cols
        ],
        *[
            F.last("__r_ts__", ignorenulls=True).over(w).alias(f"__{d}_ts__")
            for d, w in windows
        ],
    )
    out = carried.filter(F.col("__is_left__") == 1).drop("__is_left__")

    def tol_ok(d: str) -> Column:
        ts = F.col(f"__{d}_ts__")
        ok = ts.isNotNull()
        if tolerance is not None:
            bound = F.expr(f"INTERVAL {tolerance}")
            ok = ok & (
                (ts >= F.col(on) - bound)
                if d == "b"
                else (ts <= F.col(on) + bound)
            )
        return ok

    if direction in ("backward", "forward"):
        d = direction[0]
        in_tol = tol_ok(d)
        picked_ts = F.col(f"__{d}_ts__")
        picked = {c: F.col(f"__{d}_{c}__") for c in right_cols}
    else:
        ok_b, ok_f = tol_ok("b"), tol_ok("f")
        from pyspark.sql import types as T

        on_type = left.schema[on].dataType
        is_ts = isinstance(on_type, (T.TimestampType, T.TimestampNTZType))
        is_date = isinstance(on_type, T.DateType)

        def _epoch(c: Column) -> Column:
            # NTZ-safe: NTZ cannot cast straight to long in Spark 4.
            # DateType cannot cast to long at all — day-count via
            # datediff against a fixed origin keeps nearest working on
            # the same columns backward/forward accept.
            if is_ts:
                return c.cast("timestamp_ltz").cast("long")
            if is_date:
                return F.datediff(c, F.lit("1970-01-01")).cast("long")
            return c.cast("long")

        dist_b = _epoch(F.col(on)) - _epoch(F.col("__b_ts__"))
        dist_f = _epoch(F.col("__f_ts__")) - _epoch(F.col(on))
        # backward wins ties, and wins outright when forward is out of
        # tolerance/absent (and vice versa)
        use_b = ok_b & (~ok_f | (dist_b <= dist_f))
        in_tol = ok_b | ok_f
        picked_ts = F.when(use_b, F.col("__b_ts__")).otherwise(F.col("__f_ts__"))
        picked = {
            c: F.when(use_b, F.col(f"__b_{c}__")).otherwise(F.col(f"__f_{c}__"))
            for c in right_cols
        }
    return out.select(
        *by,
        F.col(on),
        *left_cols,
        *[F.when(in_tol, picked[c]).alias(f"{c}{suffix}") for c in right_cols],
        F.when(in_tol, picked_ts).alias(f"{on}{suffix}"),
    )


def _interval_seconds(within: str) -> int:
    """'30 minutes' / '2 hours' / '45 seconds' / '1 day' -> seconds."""
    parts = within.strip().split()
    if len(parts) != 2 or not parts[0].isdigit():
        raise ValueError(f"unsupported interval: {within!r}")
    unit = parts[1].rstrip("s").lower()
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}.get(unit)
    if mult is None:
        raise ValueError(f"unsupported interval unit: {within!r}")
    return int(parts[0]) * mult


def range_join(
    from_events: DataFrame,
    to_events: DataFrame,
    key: str,
    on: str = "ts",
    within: str = "30 minutes",
    prefix_from: str = "from_",
    prefix_to: str = "to_",
) -> DataFrame:
    """Pairs (from, to) on the same key with ``from.on <= to.on <=
    from.on + within`` — the attribution/funnel join shape.

    **Time-binned equi-join**: both sides bucket their timestamp into
    ``within``-wide bins and the from side explodes into its own bin
    plus the next one — any in-range pair lands in one of those two —
    so the join key is (key, bin) and candidate volume is bounded by
    pairs in ADJACENT bins, not |from|×|to| per key. A key with a month
    of history and a 30-minute window prunes ~1500× before the exact
    range filter. (Without binning the equi-join on the key alone fans
    out the full per-key cross product — measured 12.4 s unbinned vs
    3.3 s binned on the 10× events stress, a gap that widens with
    history length.)
    """
    seconds = _interval_seconds(within)
    f = from_events.select(
        F.col(key),
        *[
            F.col(c).alias(f"{prefix_from}{c}")
            for c in from_events.columns
            if c != key
        ],
    )
    t = to_events.select(
        F.col(key),
        *[F.col(c).alias(f"{prefix_to}{c}") for c in to_events.columns if c != key],
    )
    f_ts = F.col(f"{prefix_from}{on}")
    t_ts = F.col(f"{prefix_to}{on}")

    from pyspark.sql import types as T

    def _epoch(df: DataFrame, col: Column) -> Column:
        dt = df.schema[f"{prefix_from}{on}" if df is f else f"{prefix_to}{on}"]
        if isinstance(dt.dataType, (T.TimestampType, T.TimestampNTZType)):
            return col.cast("timestamp_ltz").cast("long")
        return col.cast("long")

    f_bin = F.floor(_epoch(f, f_ts) / F.lit(seconds))
    t_bin = F.floor(_epoch(t, t_ts) / F.lit(seconds))
    fb = f.withColumn(
        "__bin__", F.explode(F.array(f_bin, f_bin + F.lit(1)))
    )
    tb = t.withColumn("__bin__", t_bin)
    return (
        fb.join(tb, [key, "__bin__"])
        .filter((f_ts <= t_ts) & (t_ts <= f_ts + F.expr(f"INTERVAL {within}")))
        .drop("__bin__")
    )


def sessionize(
    events: DataFrame,
    by: str = "user_id",
    on: str = "ts",
    gap_minutes: int = 5,
    tie_break: str = "event_id",
) -> DataFrame:
    """Gaps-and-islands session ids: a new session starts when the gap
    to the previous event (per ``by`` key, ordered by ``on`` with a
    deterministic tie-break) reaches ``gap_minutes``. Adds
    ``session_no`` (1-based per key) — the row-level complement of the
    session-window aggregate (streaming/windows.session_agg).

    Boundary semantics match Spark's session windows: a session's span
    is the half-open ``[first, last + gap)``, so an event arriving at
    exactly ``last + gap`` opens a NEW session (gap >= gap_minutes).

    One shuffle on the key; the lag + running sum share a single Window
    sort. Session numbering is deterministic because ties order on
    ``tie_break``.
    """
    from pyspark.sql import Window as W

    # timestamp_ltz bridge: TIMESTAMP_NTZ (what plain parquet scans
    # yield) cannot cast straight to long in Spark 4; NTZ->LTZ->epoch
    # is allowed and gap *differences* are timezone-invariant.
    epoch = F.col(on).cast("timestamp_ltz").cast("long")
    w = W.partitionBy(by).orderBy(on, tie_break)
    prev = F.lag(epoch).over(w)
    is_new = F.when(
        prev.isNull() | (epoch - prev >= gap_minutes * 60),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_no", F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, 0))
    )


def session_paths(
    events: DataFrame,
    by: str = "user_id",
    on: str = "ts",
    gap_minutes: int = 5,
    max_len: int = 10,
    top_n: int = 20,
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Top-``top_n`` session paths: each session's ordered event-type
    sequence (first ``max_len`` steps, joined with ``>``), counted
    across the corpus — the path-analysis / funnel-mining shape ("what
    do users actually do inside a session").

    Ordering inside a path is deterministic: events sort by
    (MICROSECOND epoch, tie-break id) via an ``array_sort`` over
    collected structs (a bare ``collect_list`` has no order guarantee
    after a shuffle — the classic nondeterminism bug in path mining;
    and a second-truncated epoch would silently reorder sub-second
    events against the id tie-break).  The final top-N
    is ``orderBy().limit()`` — TakeOrderedAndProject over the path
    aggregate, whose cardinality is paths (bounded by sessions), never
    events.

    Shuffles: the sessionize window (key), one (key, session) agg, one
    path agg.  Output: (path, n_sessions), ties broken by path text.
    ``id_col``/``type_col`` name the event-id tie-break and step-label
    columns (defaults match the ``events`` table) — every consumed
    column is a parameter, so a differently-shaped frame fails at the
    call site, not with an opaque mid-plan resolution error.
    """
    s = sessionize(
        events, by=by, on=on, gap_minutes=gap_minutes, tie_break=id_col
    )
    epoch = F.unix_micros(F.col(on).cast("timestamp_ltz"))
    per_session = s.groupBy(by, "session_no").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                epoch.alias("t"),
                                F.col(id_col).alias("i"),
                                F.col(type_col).alias("e"),
                            )
                        )
                    ),
                    lambda x: x["e"],
                ),
                1,
                max_len,
            ),
            ">",
        ).alias("path")
    )
    return (
        per_session.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(top_n)
    )


def event_transitions(
    df: DataFrame,
    key: str,
    order_col: str,
    state_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix of a per-key event stream.

    For every key's sequence (ordered by ``order_col``, ties broken by
    ``tiebreak`` so the chain is deterministic under duplicate
    timestamps), count each adjacent (from_state -> to_state) step and
    row-normalize to exact milli probabilities: ``prob_milli =
    1000 * n div from_total``. The 'what usually happens next?'
    question behind next-action prediction features, UX funnels, and
    anomalous-sequence flagging.

    Scale: one keyed window (lag) to form the steps, one hash
    aggregate to the state-pair grid — the output is |states|² rows
    regardless of input size, and the from-state totals join back at
    grid size (broadcast). The window partitions by ``key``, so no
    global sort exists anywhere.
    """
    order = [F.col(order_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    steps = (
        df.select(key, *([order_col] + ([tiebreak] if tiebreak else [])), state_col)
        .withColumn("__from__", F.lag(state_col).over(w))
        .filter(F.col("__from__").isNotNull())
        .select(
            F.col("__from__").alias("from_state"),
            F.col(state_col).alias("to_state"),
        )
    )
    grid = steps.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    totals = grid.groupBy("from_state").agg(
        F.sum("n").cast("bigint").alias("from_total")
    )
    return (
        grid.join(F.broadcast(totals), "from_state")
        .withColumn(
            "prob_milli", F.expr("n * 1000 div from_total").cast("bigint")
        )
    )
