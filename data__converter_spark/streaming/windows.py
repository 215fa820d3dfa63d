"""Windowed aggregations over event time — batch/stream agnostic.

Each transform takes a DataFrame whose ``ts`` column is a proper
timestamp (see :func:`with_event_time`) and declares the aggregation
with ``F.window`` / ``F.session_window``; Catalyst plans a single
shuffle on (window, keys) with partial aggregation map-side. On a
stream the same plan runs incrementally with watermark-bounded state —
at 100 TB/day the state store only holds open windows, not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import ts_col


def with_event_time(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Normalize the events table: nanos-long ``ts`` -> timestamp, and
    attach a watermark when streaming (late rows beyond it drop)."""
    from pyspark.sql import types as T

    df = events
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", ts_col("ts"))
    if watermark is not None:
        df = df.withWatermark("ts", watermark)
    return df


def _window_flat(df: DataFrame, keys: list[str]) -> DataFrame:
    return df.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("w_end"),
        *keys,
        "n_events",
        "sum_value",
    )


def tumbling_counts(
    events: DataFrame,
    duration: str = "1 hour",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window count + sum(value) per key."""
    keys = keys if keys is not None else ["event_type"]
    agg = (
        events.groupBy(F.window("ts", duration), *keys)
        .agg(
            F.count("*").alias("n_events"),
            # exact integer-cents sum -> double: bit-identical across
            # engines and across stream/batch (see workloads.cents)
            (F.sum(F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)))
             .cast("double") / F.lit(100.0)).alias("sum_value"),
        )
    )
    return _window_flat(agg, keys)


def sliding_counts(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Sliding-window count + sum(value); each event lands in
    duration/slide windows."""
    keys = keys if keys is not None else ["event_type"]
    agg = (
        events.groupBy(F.window("ts", duration, slide), *keys)
        .agg(
            F.count("*").alias("n_events"),
            # exact integer-cents sum -> double: bit-identical across
            # engines and across stream/batch (see workloads.cents)
            (F.sum(F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)))
             .cast("double") / F.lit(100.0)).alias("sum_value"),
        )
    )
    return _window_flat(agg, keys)


def active_users(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """EXACT distinct active users per sliding window — as a two-stage
    plan that runs incrementally on a stream: dedup (window, user)
    pairs first (streaming dropDuplicates with watermark-bounded
    state), then a plain additive count per window.  A direct
    ``countDistinct`` inside a streaming aggregate is unsupported /
    state-unbounded; this decomposition is the standard exact form,
    with per-window state proportional to distinct users, evicted at
    the watermark.  (At firehose scale where exact is too expensive,
    swap stage one for ``approx_count_distinct`` — documented trade,
    not the default.)"""
    pairs = events.select(
        F.window("ts", duration, slide).alias("window"), "user_id"
    )
    pairs = (
        pairs.dropDuplicatesWithinWatermark(["window", "user_id"])
        if events.isStreaming
        else pairs.dropDuplicates(["window", "user_id"])
    )
    agg = pairs.groupBy("window").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    return agg.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("w_end"),
        "n_users",
    )


def session_agg(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Session windows per user: events closer than ``gap`` merge into
    one session (gaps-and-islands in SQL terms)."""
    agg = (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            # exact integer-cents sum -> double: bit-identical across
            # engines and across stream/batch (see workloads.cents)
            (F.sum(F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)))
             .cast("double") / F.lit(100.0)).alias("sum_value"),
        )
    )
    return agg.select(
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("s_start"),
        F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias("s_end"),
        "user_id",
        "n_events",
        "sum_value",
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch hash-joins
    against the (periodically reloadable) dimension. Broadcast by
    default so the stream side never shuffles — the standard shape for
    decorating an event firehose with user/account attributes; flip
    ``broadcast_dim`` off only when the dimension is too big to fit an
    executor, which turns each micro-batch into a shuffled join."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return events.join(d, on, how)


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving
    within the watermark horizon drop; state evicts past it. Batch
    DataFrames fall back to plain dropDuplicates (same result set)."""
    keys = keys if keys is not None else ["event_id"]
    if events.isStreaming:
        return events.dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def stream_range_join(
    from_stream: DataFrame,
    to_stream: DataFrame,
    key: str,
    on: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 day",
    prefix_from: str = "from_",
    prefix_to: str = "to_",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream range join — the incremental form of
    joins.range_join (same output contract: pairs on the same key with
    ``from.on <= to.on <= from.on + within``).

    Both sides carry watermarks and the join condition time-bounds the
    match, so Spark can expire buffered state: a *from* row is held at
    most ``watermark + within`` past its event time, a *to* row at most
    ``watermark``. Without the time bound the state store would grow
    unboundedly — this is the required shape for stream-stream joins at
    100 TB/day.

    ``how="left_outer"`` keeps unmatched *from* rows (to-side columns
    null) — the "click that never converted" shape.  Structured
    Streaming emits an outer row only once the watermark proves no
    match can still arrive, which is exactly why the time bound is
    mandatory for outer stream-stream joins; the batch form is a plain
    left join with the same predicate (equivalence pinned by the
    streaming tests).  Operational note the tests also pin: the
    engine's GLOBAL watermark is the MIN over both inputs' watermarks,
    so outer rows release only when BOTH streams advance — a quiet
    to-side stream holds every unmatched from-row in state (the
    standard fix is heartbeat events or
    ``spark.sql.streaming.multipleWatermarkPolicy=max``).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    f = from_stream.withWatermark(on, watermark).select(
        F.col(key),
        *[
            F.col(c).alias(f"{prefix_from}{c}")
            for c in from_stream.columns
            if c != key
        ],
    )
    # the to-side key gets its own name: both sides often derive from
    # the SAME source frame (clicks/purchases filters of one events
    # table), where f[key]/t[key] hit Spark's self-join ambiguity —
    # under an outer join dropping the wrong one nulls the key column
    t = to_stream.withWatermark(on, watermark).select(
        F.col(key).alias("__to_key__"),
        *[F.col(c).alias(f"{prefix_to}{c}") for c in to_stream.columns if c != key],
    )
    f_ts = F.col(f"{prefix_from}{on}")
    t_ts = F.col(f"{prefix_to}{on}")
    return f.join(
        t,
        (F.col(key) == F.col("__to_key__"))
        & (f_ts <= t_ts)
        & (t_ts <= f_ts + F.expr(f"INTERVAL {within}")),
        how,
    ).drop("__to_key__")


def windowed_hll_distinct(
    events: DataFrame, duration: str = "1 day", key: str = "user_id"
) -> DataFrame:
    """Approximate distinct ``key``s per tumbling window — the HLL
    register aggregation (llmops/sketches.py) grouped by event-time
    window.

    Stream-native by construction: the stateful step is
    ``groupBy(window, register) -> max(rho)``, whose state is m=256
    small integers per open window no matter how many events arrive —
    the exact-distinct alternative keeps every key in state. The
    estimate projection over a window's registers is a second
    aggregation; batch runs it in the same plan, a stream attaches it
    in ``foreachBatch``/downstream of the append-mode register output
    (multi-stateful-agg topologies vary by mode — the register state IS
    the sketch either way).

    Output: (w_start, w_end, est_distinct, v_zero, s_denom,
    small_range).
    """
    from ..llmops.sketches import hll_estimate, hll_registers

    w = events.select(F.window("ts", duration).alias("window"), F.col(key))
    reg = hll_registers(w, key, ["window"])
    est = hll_estimate(reg, ["window"])
    return est.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("w_end"),
        "est_distinct",
        "v_zero",
        "s_denom",
        "small_range",
    )


def windowed_cms_heavy(
    events: DataFrame,
    probes: DataFrame,
    duration: str = "1 day",
    key: str = "user_id",
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
    probe_col: str | None = None,
) -> DataFrame:
    """Count-min point estimates for a FIXED probe-key set per tumbling
    window — the frequency companion to :func:`windowed_hll_distinct`
    (together they answer the two classic stream questions, "how many
    distinct" and "how often", in constant state).

    Stream-native by construction: the stateful step is
    ``groupBy(window, seed, bucket) -> count`` whose state is a
    depth×width integer grid per open window no matter how many events
    arrive; the probe side is a STATIC broadcast (heavy-hitter
    candidates are known up front in the streaming setting — rank
    functions don't exist on a stream), and the per-(window, key) min
    is a second chained stateful aggregate (Spark 4 multi-stateful-agg,
    append mode — same topology as the HLL estimate projection).

    A probe whose matched cell count is < depth had at least one
    never-touched (absent) grid cell, so its estimate is 0 — the
    sparse-grid analog of llmops.sketches.cms_point_estimates' left
    join. Output: (w_start, w_end, k, cms_est); (window, probe) pairs
    where EVERY cell is absent are omitted (batch callers outer-join
    their window×probe base; see workloads.q_stream_cms_heavy).

    Batch callers may pass an already-windowed frame (a ``window``
    struct column instead of ``ts``) carrying ``weight_col``
    pre-aggregated per-key counts — the cms_table weight_col fast
    path: the depth-way explode then runs over the (window, key)
    table, not the event stream, and the grid is identical. A true
    stream keeps the raw ts form (per-key pre-aggregation is exactly
    the state blowup CMS exists to avoid).
    """
    from ..llmops.sketches import _cms_bucket

    if "window" in events.columns:
        w = events.select(
            "window",
            F.col(key).cast("string").alias("k"),
            (F.col(weight_col) if weight_col else F.lit(1)).alias("w"),
        )
    else:
        w = events.select(
            F.window("ts", duration).alias("window"),
            F.col(key).cast("string").alias("k"),
            (F.col(weight_col) if weight_col else F.lit(1)).alias("w"),
        )
    seeds = F.explode(F.array(*[F.lit(s) for s in range(depth)])).alias("seed")
    cells = w.select("window", F.col("k"), F.col("w"), seeds).select(
        "window", "seed", _cms_bucket("seed", "k", width).alias("bucket"), "w"
    )
    grid = cells.groupBy("window", "seed", "bucket").agg(
        F.sum("w").cast("long").alias("cnt")
    )
    # the probe key is named, never positional: a multi-column probe
    # frame with the key NOT first would silently hash the wrong
    # column and return wrong (not failing) estimates
    if probe_col is None:
        if len(probes.columns) != 1:
            raise ValueError(
                "probes must have exactly one column when probe_col is "
                f"not given, got {probes.columns}"
            )
        probe_col = probes.columns[0]
    pk = probes.select(F.col(probe_col).cast("string").alias("k")).distinct()
    probe_rows = pk.select("k", seeds).select(
        "k", "seed", _cms_bucket("seed", "k", width).alias("bucket")
    )
    est = (
        grid.join(F.broadcast(probe_rows), ["seed", "bucket"], "inner")
        .groupBy("window", "k")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.min("cnt").alias("min_cnt"),
        )
    )
    return est.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("w_end"),
        "k",
        F.when(F.col("n_cells") == F.lit(depth), F.col("min_cnt"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("cms_est"),
    )


def windowed_histogram_drift(
    events: DataFrame,
    ref_milli: DataFrame,
    duration: str = "1 day",
    value_col: str = "value",
    width_cents: int = 5000,
) -> DataFrame:
    """Per-window distribution drift against a static reference — the
    ingest-time data-quality monitor (stats.histogram_drift's streaming
    sibling): each tumbling window histograms ``value_col`` on the same
    exact integer-cent grid as the reference slice and reports each
    band's milli-proportion next to the reference's, plus |Δ|.

    Stream-native by construction, the windowed_hll_distinct topology:
    the stateful step is ``groupBy(window, bucket) -> count`` (state =
    #occupied bands per open window, bounded by the grid — never the
    event count), the per-window total is the CHAINED second stateful
    aggregate (collect the band list + sum, Spark 4 multi-stateful-agg,
    append mode), and the reference — (bucket, milli_ref), built once
    from a static slice — joins BROADCAST after an explode projection.
    Bands in the window but not the reference drift by their full
    weight (milli_ref = 0); reference bands absent from the window are
    omitted (an append stream cannot emit rows for data that never
    arrived — batch callers outer-join their band base if they want
    zeros, exactly like q_stream_cms_heavy's window×probe base).

    Output: (w_start, w_end, bucket, n, milli_w, milli_ref,
    diff_milli).
    """
    w = events.select(
        F.window("ts", duration).alias("window"),
        F.expr(
            f"floor({value_col} * 100.0 + 0.5) div {int(width_cents)}"
        ).cast("long").alias("bucket"),
    )
    counts = w.groupBy("window", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    per_win = counts.groupBy("window").agg(
        F.collect_list(F.struct("bucket", "n")).alias("bands"),
        F.sum("n").cast("long").alias("total"),
    )
    exploded = per_win.select(
        "window", "total", F.explode("bands").alias("b")
    ).select("window", "total", F.col("b.bucket").alias("bucket"), F.col("b.n").alias("n"))
    ref = ref_milli.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("milli_ref").cast("long").alias("milli_ref"),
    )
    out = exploded.join(F.broadcast(ref), "bucket", "left").select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("w_end"),
        "bucket",
        "n",
        F.expr("n * 1000 div total").cast("long").alias("milli_w"),
        F.coalesce("milli_ref", F.lit(0)).cast("long").alias("milli_ref"),
        F.abs(
            F.expr("n * 1000 div total") - F.coalesce("milli_ref", F.lit(0))
        ).cast("long").alias("diff_milli"),
    )
    return out
