"""Diff-operator algebra tests (SURVEY.md §5.4)."""

from __future__ import annotations

from pyspark.sql import Row

from data__converter_spark import compare


def summary_dict(diff_df):
    return {r["status"]: r["cnt"] for r in compare.diff_summary(diff_df).collect()}


def test_diff_self_all_same(spark, orders):
    d = compare.diff(orders, orders, "o_orderkey")
    assert summary_dict(d) == {"same": orders.count()}
    assert compare.field_mismatches(d, "o_orderkey").count() == 0


def test_diff_empty_all_deleted(spark, orders):
    d = compare.diff(orders, orders.filter("1=0"), "o_orderkey")
    assert summary_dict(d) == {"deleted": orders.count()}


def test_diff_classifies_all_statuses(spark):
    a = spark.createDataFrame(
        [Row(k=1, v="x"), Row(k=2, v="y"), Row(k=3, v="z")]
    )
    b = spark.createDataFrame(
        [Row(k=1, v="x"), Row(k=2, v="EDITED"), Row(k=4, v="new")]
    )
    d = compare.diff(a, b, "k")
    statuses = {r["k"]: r["status"] for r in d.collect()}
    assert statuses == {1: "same", 2: "changed", 3: "deleted", 4: "added"}


def test_field_mismatches_long_format(spark):
    a = spark.createDataFrame([Row(k=1, v="x", w="p"), Row(k=2, v="y", w="q")])
    b = spark.createDataFrame([Row(k=1, v="X2", w="p"), Row(k=3, v="n", w="m")])
    d = compare.diff(a, b, "k")
    rows = {
        (r["k"], r["field"]): (r["status"], r["a_value"], r["b_value"])
        for r in compare.field_mismatches(d, "k").collect()
    }
    # changed row emits only the differing field
    assert rows[(1, "v")] == ("changed", "x", "X2")
    assert (1, "w") not in rows
    # deleted/added rows emit one row per non-empty field with other side ''
    assert rows[(2, "v")] == ("deleted", "y", "")
    assert rows[(2, "w")] == ("deleted", "q", "")
    assert rows[(3, "v")] == ("added", "", "n")
    assert rows[(3, "w")] == ("added", "", "m")


def test_null_vs_empty_string_equal_at_edge(spark):
    # reference stringifies at the edge: null and '' are both '' (W2/W3)
    a = spark.createDataFrame([(1, None)], "k int, v string")
    b = spark.createDataFrame([(1, "")], "k int, v string")
    d = compare.diff(a, b, "k")
    assert summary_dict(d) == {"same": 1}


def test_null_keys_dropped(spark):
    a = spark.createDataFrame([Row(k=None, v="x"), Row(k=1, v="y")])
    b = spark.createDataFrame([Row(k=1, v="y")])
    d = compare.diff(a, b, "k")
    assert summary_dict(d) == {"same": 1}


def test_dedup_last_wins(spark):
    df = spark.createDataFrame(
        [Row(k=1, v="first"), Row(k=1, v="second"), Row(k=None, v="n"), Row(k=2, v="x")]
    )
    out = sorted((r["k"], r["v"]) for r in compare.dedup_last_wins(df, "k").collect())
    assert out == [(1, "second"), (2, "x")]


def test_infer_key_first_common_column(spark, orders):
    a = orders.select("o_orderkey", "o_custkey")
    b = orders.select("o_custkey", "o_orderkey")
    assert compare.infer_key(a, b) == "o_orderkey"
    assert compare.infer_key(b, a) == "o_custkey"


def test_anti_join_classes_match_diff(spark, orders):
    from data__converter_spark.workloads import orders_variant

    b = orders_variant(orders)
    d = compare.diff(orders, b, "o_orderkey")
    s = summary_dict(d)
    assert compare.added_keys(orders, b, "o_orderkey").count() == s.get("added", 0)
    assert compare.deleted_keys(orders, b, "o_orderkey").count() == s.get("deleted", 0)


def test_composite_key_diff(spark):
    a = spark.createDataFrame(
        [(1, "x", "p", 10.0), (1, "y", "q", 20.0), (2, "x", "r", 30.0)],
        "k1 long, k2 string, v string, w double",
    )
    b = spark.createDataFrame(
        [(1, "x", "p", 10.0), (1, "y", "Q", 20.0), (3, "z", "s", 40.0)],
        "k1 long, k2 string, v string, w double",
    )
    d = compare.diff(a, b, ["k1", "k2"])
    by_key = {(r.k1, r.k2): r.status for r in d.collect()}
    assert by_key == {
        (1, "x"): "same",
        (1, "y"): "changed",
        (2, "x"): "deleted",
        (3, "z"): "added",
    }
    fm = compare.field_mismatches(d, ["k1", "k2"]).collect()
    changed = [r for r in fm if r.status == "changed"]
    assert len(changed) == 1 and changed[0].field == "v"
    assert {r.k1 for r in compare.added_keys(a, b, ["k1", "k2"]).collect()} == {3}
    assert {r.k1 for r in compare.deleted_keys(a, b, ["k1", "k2"]).collect()} == {2}


def test_composite_key_dedup_last_wins(spark):
    df = spark.createDataFrame(
        [(1, "x", "old", 0), (1, "x", "new", 1), (1, None, "dropme", 2)],
        "k1 long, k2 string, v string, seq long",
    )
    out = compare.dedup_last_wins(df, ["k1", "k2"], order_col="seq")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].v == "new"


def test_upsert_updates_win_and_inserts_append(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "k long, v string"
    )
    out = {r.k: r.v for r in compare.upsert(base, updates, "k").collect()}
    assert out == {1: "a", 2: "B2", 3: "c", 4: "d"}


def test_upsert_algebra(spark):
    """upsert(base, base) == base; key set of the result is the union
    of both key sets."""
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    updates = spark.createDataFrame([(2, "B"), (9, "z")], "k long, v string")
    self_merge = {(r.k, r.v) for r in compare.upsert(base, base, "k").collect()}
    assert self_merge == {(1, "a"), (2, "b")}
    keys = {r.k for r in compare.upsert(base, updates, "k").collect()}
    assert keys == {1, 2, 9}


def test_schema_diff_classifies_drift(spark):
    from data__converter_spark.compare import schema_diff

    a = spark.createDataFrame([(1, "x", 2.0)], "id long, name string, v double")
    b = spark.createDataFrame([(1, "x", "2", True)], "id long, name string, v string, flag boolean")
    got = {r.column: (r.status, r.type_a, r.type_b) for r in schema_diff(a, b).collect()}
    assert got == {
        "id": ("same", "bigint", "bigint"),
        "name": ("same", "string", "string"),
        "v": ("type_changed", "double", "string"),
        "flag": ("added", None, "boolean"),
    }
    # removed direction
    back = {r.column: r.status for r in schema_diff(b, a).collect()}
    assert back["flag"] == "removed"


def test_table_fingerprint_order_and_partition_invariant(spark):
    from data__converter_spark.compare import table_fingerprint

    rows = [("2024-01", 1, "x"), ("2024-01", 2, "y"), ("2024-02", 3, "z")]
    a = spark.createDataFrame(rows, "m string, k long, v string")
    b = spark.createDataFrame(list(reversed(rows)), "m string, k long, v string").repartition(7)
    fa = {tuple(r) for r in table_fingerprint(a, ["k", "v"], "m", "m").collect()}
    fb = {tuple(r) for r in table_fingerprint(b, ["k", "v"], "m", "m").collect()}
    assert fa == fb and len(fa) == 2


def test_table_fingerprint_detects_single_changed_row(spark):
    from data__converter_spark.compare import table_fingerprint

    a = spark.createDataFrame([("g", 1, "x"), ("g", 2, "y")], "m string, k long, v string")
    b = spark.createDataFrame([("g", 1, "x"), ("g", 2, "Y")], "m string, k long, v string")
    ra = table_fingerprint(a, ["k", "v"], "m", "m").collect()[0]
    rb = table_fingerprint(b, ["k", "v"], "m", "m").collect()[0]
    assert ra["n_rows"] == rb["n_rows"] == 2
    assert (ra["sum_lane1"], ra["sum_lane2"]) != (rb["sum_lane1"], rb["sum_lane2"])


def test_table_fingerprint_null_never_collides_with_empty(spark):
    from data__converter_spark.compare import table_fingerprint

    a = spark.createDataFrame([("g", None)], "m string, v string")
    b = spark.createDataFrame([("g", "")], "m string, v string")
    ra = table_fingerprint(a, ["v"], "m", "m").collect()[0]
    rb = table_fingerprint(b, ["v"], "m", "m").collect()[0]
    assert (ra["sum_lane1"], ra["sum_lane2"]) != (rb["sum_lane1"], rb["sum_lane2"])


def test_table_fingerprint_resists_delimiter_injection(spark):
    """('a|b','c') and ('a','b|c') must fingerprint DIFFERENT — the
    length-prefixed canonical form keeps field boundaries unambiguous
    for values containing the delimiter."""
    from data__converter_spark.compare import table_fingerprint

    a = spark.createDataFrame([("g", "a|b", "c")], "m string, x string, y string")
    b = spark.createDataFrame([("g", "a", "b|c")], "m string, x string, y string")
    ra = table_fingerprint(a, ["x", "y"], "m", "m").collect()[0]
    rb = table_fingerprint(b, ["x", "y"], "m", "m").collect()[0]
    assert (ra["sum_lane1"], ra["sum_lane2"]) != (rb["sum_lane1"], rb["sum_lane2"])
