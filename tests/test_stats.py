"""stats.py: exact group quantiles, fixed-width histogram, profiler."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data__converter_spark.stats import (
    group_quantiles_disc,
    histogram_fixed_width,
    profile,
)


def test_group_quantiles_rank_selection(spark):
    # group "a": 1..10 -> p50 = rank ceil(5.0)=5 -> value 5;
    # p90 -> rank 9 -> 9; p99 -> rank ceil(9.9)=10 -> 10.
    rows = [("a", float(v), v) for v in range(1, 11)] + [("b", 7.0, 99)]
    df = spark.createDataFrame(rows, "k string, v double, id int")
    out = group_quantiles_disc(df, "k", "v", [0.5, 0.9, 0.99], tiebreak="id")
    got = {(r["k"], r["q"]): r["val"] for r in out.collect()}
    assert got[("a", 0.5)] == 5.0
    assert got[("a", 0.9)] == 9.0
    assert got[("a", 0.99)] == 10.0
    # singleton group: every quantile is the single value
    assert got[("b", 0.5)] == 7.0 and got[("b", 0.99)] == 7.0


def test_group_quantiles_duplicate_values_use_tiebreak(spark):
    # ties must not drop or duplicate ranks
    rows = [("a", 2.0, i) for i in range(4)]
    df = spark.createDataFrame(rows, "k string, v double, id int")
    out = group_quantiles_disc(df, "k", "v", [0.5], tiebreak="id").collect()
    assert len(out) == 1 and out[0]["val"] == 2.0


def test_histogram_fixed_width_buckets(spark):
    df = spark.createDataFrame([(0,), (499,), (500,), (1250,)], "n int")
    out = {r["bucket"]: r for r in histogram_fixed_width(df, "n", 500).collect()}
    assert out[0]["n_rows"] == 2 and out[0]["lo"] == 0 and out[0]["hi"] == 499
    assert out[1]["n_rows"] == 1 and out[1]["bucket_start"] == 500
    assert out[2]["n_rows"] == 1 and out[2]["lo"] == 1250


def test_profile_nulls_distinct_and_canonical_minmax(spark):
    df = spark.createDataFrame(
        [
            (1, None, 1.005, datetime.datetime(2024, 1, 2, 3, 4, 5)),
            (2, "x", 2.5, datetime.datetime(2024, 6, 7, 8, 9, 10)),
            (2, "y", None, None),
        ],
        "a int, s string, d double, t timestamp",
    )
    out = {r["column"]: r for r in profile(df, money_cols=["d"]).collect()}
    assert out["a"]["n_nulls"] == 0 and out["a"]["n_distinct"] == 2
    assert out["a"]["min_s"] == "1" and out["a"]["max_s"] == "2"
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    # designated money doubles canonicalize as exact integer cents
    # (1.005 -> 101 under floor(x*100+0.5) on the IEEE double nearest)
    assert out["d"]["min_s"] == str(int(1.005 * 100 + 0.5))
    assert out["d"]["max_s"] == "250"
    # timestamps render at second precision
    assert out["t"]["min_s"] == "2024-01-02 03:04:05"
    assert out["t"]["n_nulls"] == 1


def test_profile_non_money_doubles_keep_precision(spark):
    """Non-designated doubles print fixed %.6f — sub-cent magnitudes
    (embeddings, ratios) must not collapse to '0'/'1'."""
    df = spark.createDataFrame(
        [(0.0001234,), (0.5,), (-0.0042,)], "r double"
    )
    out = {r["column"]: r for r in profile(df).collect()}
    assert out["r"]["min_s"] == "-0.004200"
    assert out["r"]["max_s"] == "0.500000"


def test_profile_plan_shape(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plan = profile(orders)._jdf.queryExecution().executedPlan().toString()
    # one scan for counts/min/max + one for the melted distinct leg —
    # never one per column, and never the multi-DISTINCT Expand shape
    assert plan.count("Scan parquet") == 2
    assert "Expand" not in plan


def test_expectations_counts_nulls_as_failures(spark):
    from data__converter_spark.stats import expectations

    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (-5, None)], "v int, s string"
    )
    out = {
        r.rule: (r.n_rows, r.n_fail, r.fail_millis)
        for r in expectations(
            df,
            [
                ("v_positive", F.col("v") > 0),      # null v -> fail
                ("s_not_null", F.col("s").isNotNull()),
            ],
        ).collect()
    }
    assert out["v_positive"] == (3, 2, 667)
    assert out["s_not_null"] == (3, 1, 333)


def test_robust_outliers_median_mad(spark):
    """Known distribution: median 10, MAD 1 -> |x-10| > 3 flags; the
    10^6 point must not drag the threshold (the mean/stddev failure
    this operator exists to avoid)."""
    from data__converter_spark.stats import robust_outliers

    vals = [8, 9, 9, 10, 10, 10, 11, 11, 12, 1_000_000]
    df = spark.createDataFrame(
        [(i, "a", v) for i, v in enumerate(vals)], "id long, k string, v long"
    )
    out = {r["id"]: r for r in robust_outliers(df, "k", "v", "id").collect()}
    assert len(out) == 10
    assert out[0]["med"] == 10 and out[0]["mad"] == 1
    flagged = sorted(i for i, r in out.items() if r["is_outlier"])
    assert flagged == [9]  # only the huge point: |8-10|=2 <= 3*1
    # degenerate group: MAD 0 -> every non-median value flags
    df2 = spark.createDataFrame(
        [(i, "b", 5) for i in range(5)] + [(9, "b", 6)],
        "id long, k string, v long",
    )
    out2 = {r["id"]: r["is_outlier"] for r in robust_outliers(df2, "k", "v", "id").collect()}
    assert out2 == {0: False, 1: False, 2: False, 3: False, 4: False, 9: True}


def test_rfm_scores_quintiles_and_code(spark):
    from data__converter_spark.stats import rfm_scores

    # 10 customers in one group, each with one order; dates/amounts
    # arranged so recency rank == frequency tiebreak rank == monetary
    # rank == customer index -> ntile(5) gives 2 customers per tile.
    rows = [
        (c, "g", datetime.date(2024, 1, 20 - c), 100 * (10 - c))
        for c in range(1, 11)
    ]
    df = spark.createDataFrame(
        rows, "cust int, grp string, odate date, cents long"
    )
    out = rfm_scores(df, "cust", "grp", "odate", "cents").collect()
    by_cust = {r["cust"]: r for r in out}
    # customer 1: newest date, highest cents, freq ties broken by cust
    assert by_cust[1]["r_score"] == 1
    assert by_cust[1]["m_score"] == 1
    assert by_cust[10]["r_score"] == 5
    assert by_cust[10]["m_score"] == 5
    assert by_cust[1]["rfm_code"] == 111
    # equal frequency everywhere: tiles assigned by cust-id tiebreak
    assert by_cust[1]["f_score"] == 1 and by_cust[10]["f_score"] == 5
    # two customers per tile in every dimension
    from collections import Counter

    assert Counter(r["r_score"] for r in out) == {t: 2 for t in range(1, 6)}


def test_rfm_scores_partitions_by_group(spark):
    from data__converter_spark.stats import rfm_scores

    # two groups scored independently: each group's best gets tile 1
    rows = [
        (1, "a", datetime.date(2024, 1, 2), 50),
        (2, "a", datetime.date(2024, 1, 1), 10),
        (3, "b", datetime.date(2023, 6, 2), 5),
        (4, "b", datetime.date(2023, 6, 1), 1),
    ]
    df = spark.createDataFrame(
        rows, "cust int, grp string, odate date, cents long"
    )
    out = {r["cust"]: r for r in rfm_scores(df, "cust", "grp", "odate", "cents", n_tiles=2).collect()}
    assert out[1]["r_score"] == 1 and out[3]["r_score"] == 1
    assert out[2]["r_score"] == 2 and out[4]["r_score"] == 2


def test_assoc_pairs_counts_confidence_lift(spark):
    from data__converter_spark.stats import assoc_pairs

    # 4 baskets: {x,y} {x,y} {x,z} {y}; pair (x,y): co=2, cnt_x=3,
    # cnt_y=3, n=4 -> conf both = 666, lift = 2*4*1000 div 9 = 888.
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "y"),
        (2, "x"),  # duplicate line in one basket: must not double-count
    ]
    df = spark.createDataFrame(rows, "bk int, it string")
    out = assoc_pairs(df, "bk", "it", min_pair_count=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"]) == ("x", "y")
    assert r["co"] == 2 and r["cnt_a"] == 3 and r["cnt_b"] == 3
    assert r["conf_ab_milli"] == 666 and r["conf_ba_milli"] == 666
    assert r["lift_milli"] == 888


def test_assoc_pairs_min_count_filters(spark):
    from data__converter_spark.stats import assoc_pairs

    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "z")]
    df = spark.createDataFrame(rows, "bk int, it string")
    pairs = {
        (r["item_a"], r["item_b"])
        for r in assoc_pairs(df, "bk", "it", min_pair_count=1).collect()
    }
    assert pairs == {("x", "y"), ("x", "z")}
    assert assoc_pairs(df, "bk", "it", min_pair_count=2).count() == 0


def test_histogram_drift_bands_and_tvd(spark):
    from data__converter_spark.stats import histogram_drift

    a = spark.createDataFrame([(v,) for v in [5, 15, 15, 25]], "v long")
    b = spark.createDataFrame([(v,) for v in [5, 35, 35, 35]], "v long")
    out = {r["bucket"]: r for r in histogram_drift(a, b, "v", 10).collect()}
    # band 0: 1/4 vs 1/4 -> 250 vs 250, diff 0
    assert out[0]["milli_a"] == 250 and out[0]["milli_b"] == 250
    assert out[0]["diff_milli"] == 0
    # band 1: 2/4 vs 0 -> diff 500; band absent in b counts as 0
    assert out[1]["n_b"] == 0 and out[1]["diff_milli"] == 500
    # band 3: absent in a
    assert out[3]["n_a"] == 0 and out[3]["milli_b"] == 750
    tvd = sum(r["diff_milli"] for r in out.values()) // 2
    assert tvd == (0 + 500 + 250 + 750) // 2


def test_benford_profile_counts_and_milli_shares(spark):
    from data__converter_spark.stats import benford_profile

    # digits: 1 -> {1, 19}, 2 -> {2}, 3 -> {300}, 9 -> {9};
    # 0 and negatives are excluded (no significant digit)
    df = spark.createDataFrame(
        [(1,), (19,), (2,), (300,), (9,), (0,), (-5,)], "v long"
    )
    got = {
        (r["digit"], r["n"], r["obs_milli"], r["exp_milli"], r["dev_milli"])
        for r in benford_profile(df, "v").collect()
    }
    assert got == {
        (1, 2, 400, 301, 99),
        (2, 1, 200, 176, 24),
        (3, 1, 200, 125, 75),
        (9, 1, 200, 46, 154),
    }


def test_contingency_independence_zero_dev_when_independent(spark):
    from data__converter_spark.stats import contingency_independence

    rows = [(a, b) for a in ("x", "y") for b in ("p", "q") for _ in range(2)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = contingency_independence(df, "a", "b").collect()
    assert len(out) == 4
    for r in out:
        assert r["obs_milli"] == 250 and r["exp_milli"] == 250
        assert r["dev_milli"] == 0


def test_contingency_independence_flags_concentration(spark):
    from data__converter_spark.stats import contingency_independence

    # everything in one cell of a 2x2 support -> maximal deviation
    rows = [("x", "p")] * 3 + [("y", "q")] * 1
    df = spark.createDataFrame(rows, "a string, b string")
    got = {
        (r["a"], r["b"]): (r["obs_milli"], r["exp_milli"], r["dev_milli"])
        for r in contingency_independence(df, "a", "b").collect()
    }
    assert got[("x", "p")] == (750, 562, 188)
    assert got[("y", "q")] == (250, 62, 188)


def test_fk_orphans_counts_nulls_separately(spark):
    from data__converter_spark.stats import fk_orphans

    fact = spark.createDataFrame([(1,), (2,), (3,), (None,)], "fk long")
    dim = spark.createDataFrame([(1,), (2,)], "k long")
    out = fk_orphans(fact, {"fk": (dim, "k")}).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["relation"], r["n_rows"], r["n_null"], r["n_orphan"]) == (
        "fk", 4, 1, 1,
    )
    assert r["orphan_milli"] == 250


def test_fk_orphans_empty_fact_reports_zero_not_null(spark):
    """Degenerate-input contract: an empty fact table yields
    orphan_milli = 0 (vacuously clean), never a NULL from the
    0-row division — audit thresholds stay well-defined."""
    from data__converter_spark.stats import fk_orphans

    fact = spark.createDataFrame([], "fk long")
    dim = spark.createDataFrame([(1,)], "k long")
    r = fk_orphans(fact, {"fk": (dim, "k")}).collect()[0]
    assert (r["n_rows"], r["n_null"], r["n_orphan"]) == (0, 0, 0)
    assert r["orphan_milli"] == 0


def test_binary_auc_single_class_is_documented_null(spark):
    """Single-class labels make ROC-AUC undefined: auc_micro is NULL
    by contract while n_pos/n_neg expose the cause."""
    from data__converter_spark.stats import binary_auc

    df = spark.createDataFrame([(1, True), (2, True)], "s long, y boolean")
    r = binary_auc(df, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (2, 0)
    assert r["auc_micro"] is None


def test_group_diversity_extremes_and_balance(spark):
    from data__converter_spark.stats import group_diversity

    rows = (
        [("one", "x")] * 4                      # single class
        + [("two", "x"), ("two", "y")] * 2      # two balanced classes
        + [("skew", "x")] * 9 + [("skew", "y")] # 9:1 skew
    )
    df = spark.createDataFrame(rows, "g string, l string")
    got = {
        r["grp"]: (r["n_rows"], r["n_classes"], r["gini_micro"], r["inv_simpson_milli"])
        for r in group_diversity(df, "g", "l").collect()
    }
    assert got["one"] == (4, 1, 0, 1000)          # pure: gini 0, 1 class
    assert got["two"] == (4, 2, 500000, 2000)     # balanced 2: gini .5
    # 9:1 -> sum_sq 82, N^2 100: gini 180000, inv-simpson 1219
    assert got["skew"] == (10, 2, 180000, 1219)


def test_binary_auc_known_cases(spark):
    from data__converter_spark.stats import binary_auc

    def auc(rows):
        df = spark.createDataFrame(rows, "s long, y boolean")
        r = binary_auc(df, "s", "y").collect()[0]
        return (r["n_pos"], r["n_neg"], r["auc_micro"])

    # perfect separation
    assert auc([(1, False), (2, False), (3, True), (4, True)]) == (2, 2, 1000000)
    # perfectly inverted
    assert auc([(3, False), (4, False), (1, True), (2, True)]) == (2, 2, 0)
    # all scores tied -> 0.5 exactly
    assert auc([(7, True), (7, False), (7, True), (7, False)]) == (2, 2, 500000)
    # mixed case, hand-computed: pos scores {2, 3}, neg {1, 3}
    # pairs: (2>1)=1, (2 vs 3)=0, (3>1)=1, (3==3)=0.5 -> U=2.5/4
    assert auc([(1, False), (3, False), (2, True), (3, True)]) == (2, 2, 625000)


def test_calibration_bins_exact_shares(spark):
    from data__converter_spark.stats import calibration_bins

    rows = [(5, True), (7, False), (14, True), (16, True), (25, False)]
    df = spark.createDataFrame(rows, "s long, y boolean")
    got = {
        r["band"]: (r["n"], r["n_pos"], r["pos_milli"], r["mean_score"])
        for r in calibration_bins(df, "s", "y", 10).collect()
    }
    assert got == {
        0: (2, 1, 500, 6),    # scores 5, 7
        1: (2, 2, 1000, 15),  # scores 14, 16
        2: (1, 0, 0, 25),
    }
