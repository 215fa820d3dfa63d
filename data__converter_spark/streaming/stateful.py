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


BAND_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
    ]
)

_BAND_STATE_SCHEMA = T.StructType(
    [T.StructField("ids", T.ArrayType(T.LongType()))]
)


def band_candidates(
    docs: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    max_bucket_size: int | None = None,
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs from banded MinHash LSH — **dedup on
    INGEST**: the streaming form detects, as each document arrives,
    which already-ingested documents it collides with in any LSH band,
    without ever rescanning the standing corpus.

    Batch: exactly ``llmops.dedup._minhash_candidates``'s candidate
    output (distinct ``id_a < id_b`` band collisions) — the identical
    signatures/bands, so stream and batch agree pair-for-pair and the
    batch form is DuckDB-oracle-checkable.

    Streaming: each arriving document's signature (same seeded
    coefficients) explodes into ``bands`` (band, bucket) rows; per
    bucket, ``applyInPandasWithState`` keeps the id list seen so far
    and each NEW member emits canonical ``(min, max)`` pairs against
    that history.  A pair colliding in several bands is emitted once
    per band — downstream, the CDC-upsert sink keyed on (id_a, id_b)
    absorbs duplicates exactly-once, which is cheaper at scale than a
    global stateful distinct.  State per bucket is the member id list
    — the scaling invariant to watch, and ``max_bucket_size`` caps it:
    a full bucket stops ADMITTING new members (they emit nothing
    there).  That is the streaming analog of the batch hot-bucket
    guard with one documented divergence: batch drops the whole
    degenerate bucket retroactively, a stream cannot un-emit — so
    under a cap the stream may emit pairs among a hot bucket's first
    ``max_bucket_size`` members that batch would suppress.  Default
    ``None`` keeps exact banded-LSH semantics (and exact stream/batch
    agreement).

    Re-delivered ids (source replay) are ignored: membership is
    idempotent, so WITHOUT a TTL the operator is exactly-once at the
    pair level for any source whose ids are stable.  A TTL weakens
    that: eviction forgets membership, so an id replayed after its
    bucket expired re-admits and can re-emit pairs — size the TTL
    beyond the source's maximum replay horizon if duplicates matter
    downstream (or keep the CDC-upsert sink, which absorbs them).

    ``state_ttl_minutes`` bounds TOTAL state for ever-running
    pipelines: a bucket untouched for that long is evicted
    (processing-time timeout), so the operator dedups against a
    sliding recency window of the corpus instead of its entire
    history — the standard way production streaming dedup keeps state
    from growing without bound (``max_bucket_size`` bounds each
    bucket; the TTL bounds the NUMBER of live buckets).  Eviction
    trades recall exactly like the batch guard: a pair whose two docs
    arrive further apart than the TTL in every shared band goes
    undetected.  Default ``None`` keeps state forever (exact
    stream/batch agreement).
    """
    if state_ttl_minutes is not None and state_ttl_minutes <= 0:
        # a negative duration would kill the query mid-batch with an
        # executor-side IllegalArgumentException; 0 would silently
        # fall back to NoTimeout — both are caller errors, fail NOW
        raise ValueError(
            f"state_ttl_minutes must be positive, got {state_ttl_minutes}"
        )
    if not docs.isStreaming:
        from ..llmops.dedup import _minhash_candidates

        _hs, _sigs, cand = _minhash_candidates(
            docs, col, id_col, k, num_hashes, bands, seed, max_bucket_size
        )
        return cand

    from pyspark.sql import functions as F

    from ..llmops.dedup import _band_frame, minhash_signature_col

    sigs = docs.select(
        F.col(id_col),
        minhash_signature_col(col, k, num_hashes, seed).alias("sig"),
    ).filter(F.col("sig").isNotNull())
    banded = _band_frame(sigs, id_col, bands, num_hashes // bands)

    timeout_conf = (
        "ProcessingTimeTimeout" if state_ttl_minutes else "NoTimeout"
    )

    def update(key, pdfs, state):
        import pandas as pd

        if state_ttl_minutes and state.hasTimedOut:
            # bucket idle past the TTL: evict and emit nothing
            state.remove()
            yield pd.DataFrame({"id_a": [], "id_b": []})
            return
        ids = list(state.get[0]) if state.exists else []
        seen = set(ids)
        out_a: list[int] = []
        out_b: list[int] = []
        for pdf in pdfs:
            # sort within the batch: arrival inside one micro-batch has
            # no meaningful order, id order makes replays deterministic
            for i in sorted(int(x) for x in pdf[id_col]):
                if i in seen:
                    continue
                if (
                    max_bucket_size is not None
                    and len(ids) >= max_bucket_size
                ):
                    break
                for o in ids:
                    out_a.append(min(o, i))
                    out_b.append(max(o, i))
                ids.append(i)
                seen.add(i)
        state.update((ids,))
        if state_ttl_minutes:
            state.setTimeoutDuration(int(state_ttl_minutes) * 60_000)
        yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return banded.groupBy("band", "bucket").applyInPandasWithState(
        update,
        outputStructType=BAND_PAIRS_SCHEMA,
        stateStructType=_BAND_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


STEPS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("from_state", T.StringType()),
        T.StructField("to_state", T.StringType()),
        T.StructField("event_id", T.LongType()),
    ]
)

_LAST_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts_micro", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def transition_steps(events: DataFrame) -> DataFrame:
    """Per-user adjacent (from_state -> to_state) steps, stitched
    ACROSS micro-batches.

    The streaming half of ``joins.event_transitions``: the batch form
    is one keyed lag window; the streaming form keeps each user's last
    event — (ts, event_id, event_type), the same total order as the
    batch window — in GroupState, so the first event of a new batch
    pairs with the last event of the previous one instead of being
    silently dropped at the batch boundary. Within a batch, rows sort
    by (ts, event_id) before pairing — identical tiebreak to the
    window. Feed the emitted steps to a downstream count (or collect
    and fold) to maintain the transition grid incrementally.

    Contract: per-key IN-ORDER ingestion across batches (a CDC-style
    assumption — a batch must not contain events older than an already
    consumed one for the same key). State is ONE row per user — the
    scaling invariant — and never grows with history.

    Output: (user_id, from_state, to_state, event_id) per step, where
    ``event_id`` is the id of the *to* event (a deterministic step
    identity used by tests and downstream dedup).
    """
    if not events.isStreaming:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return (
            events.withColumn("__from__", F.lag("event_type").over(w))
            .filter(F.col("__from__").isNotNull())
            .select(
                "user_id",
                F.col("__from__").alias("from_state"),
                F.col("event_type").alias("to_state"),
                "event_id",
            )
        )

    def update(key, pdfs, state):
        import pandas as pd

        last = state.get if state.exists else None
        frames = [pdf for pdf in pdfs if len(pdf)]
        out_from: list = []
        out_to: list = []
        out_eid: list = []
        if frames:
            batch = pd.concat(frames).sort_values(["ts", "event_id"])
            prev_type = last[2] if last is not None else None
            for ts, eid, etype in zip(
                batch["ts"], batch["event_id"], batch["event_type"]
            ):
                if prev_type is not None:
                    out_from.append(prev_type)
                    out_to.append(etype)
                    out_eid.append(int(eid))
                prev_type = etype
            tail = batch.iloc[-1]
            state.update(
                (
                    int(tail["ts"].value // 1000),
                    int(tail["event_id"]),
                    str(tail["event_type"]),
                )
            )
        if out_eid:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_eid),
                    "from_state": out_from,
                    "to_state": out_to,
                    "event_id": out_eid,
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=STEPS_SCHEMA,
        stateStructType=_LAST_EVENT_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
