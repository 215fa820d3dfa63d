"""Streaming module tests (SURVEY M7): windowed aggs batch/stream
equivalence, watermarked dedup, custom stateful operator."""

from __future__ import annotations

import pytest

from data__converter_spark.session import load_events
from data__converter_spark.streaming import runner, stateful, windows

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_events(spark, SF)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_batch_counts_sum_to_total(events):
    out = windows.tumbling_counts(events, "1 hour")
    total = out.groupBy().sum("n_events").collect()[0][0]
    assert total == events.count()


def test_sliding_each_event_in_two_windows(events):
    out = windows.sliding_counts(events, "1 hour", "30 minutes")
    total = out.groupBy().sum("n_events").collect()[0][0]
    assert total == 2 * events.count()


def test_session_windows_merge_within_gap(events):
    out = windows.session_agg(events, "5 minutes")
    # sessions partition all events per user
    total = out.groupBy().sum("n_events").collect()[0][0]
    assert total == events.count()
    # every session spans >= its event count windowed by the gap rule:
    # start <= end always
    bad = out.filter("s_start > s_end").count()
    assert bad == 0


def test_stream_tumbling_equals_batch(spark, events):
    stream = windows.with_event_time(
        runner.read_events_stream(spark, SF), watermark="1 day"
    )
    got = runner.run_once(windows.tumbling_counts(stream, "1 hour"))
    want = windows.tumbling_counts(events, "1 hour")
    cols = ["w_start", "w_end", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_session_equals_batch(spark, events):
    stream = windows.with_event_time(
        runner.read_events_stream(spark, SF), watermark="1 day"
    )
    got = runner.run_once(windows.session_agg(stream, "5 minutes"))
    want = windows.session_agg(events, "5 minutes")
    cols = ["s_start", "s_end", "user_id", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_dedup_within_watermark(spark, events):
    stream = windows.with_event_time(
        runner.read_events_stream(spark, SF), watermark="1 day"
    )
    deduped = windows.dedup_within_watermark(stream, ["user_id"])
    got = runner.run_once(deduped.select("user_id"), output_mode="append")
    n_users = events.select("user_id").distinct().count()
    assert got.count() == n_users


def test_stateful_running_totals_matches_batch(spark, events):
    stream = windows.with_event_time(runner.read_events_stream(spark, SF))
    got = runner.run_once(
        stateful.running_user_totals(stream), output_mode="update"
    )
    # update mode re-emits per batch; keep the final row per user
    import pyspark.sql.functions as F

    final = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
    )
    want = stateful.running_user_totals(events)
    a = {r.user_id: (r.n_events, round(r.total_value, 2)) for r in final.collect()}
    b = {r.user_id: (r.n_events, round(r.total_value, 2)) for r in want.collect()}
    assert a == b
