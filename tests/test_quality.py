"""LM-surprisal quality scoring, tercile buckets, domain mixture
(llmops/quality.py). The oracle gate checks exact values; these tests
pin the SEMANTICS (reference-like docs score lower, terciles are exact,
sqrt-temperature flattens domination) and the plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data__converter_spark.llmops import quality


@pytest.fixture(scope="module")
def lang_docs(spark):
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog sat on the cat", "en"),
        (3, "the cat and the dog sat", "en"),
        (4, "zxq vwp qqj zxq vwp klm", "xx"),  # fully OOV vs the en LM
        (5, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_surprisal_ranks_reference_like_docs_lower(spark, lang_docs):
    out = {
        r["doc_id"]: (r["n_tokens"], r["score_milli"])
        for r in quality.lm_surprisal_scores(
            lang_docs, F.col("lang") == "en"
        ).collect()
    }
    # empty doc: no tokens, zero score
    assert out[5] == (0, 0)
    # the OOV doc must score strictly worse than every in-language doc
    assert all(out[4][1] > out[d][1] for d in (1, 2, 3))
    # in-language docs: token counts preserved
    assert out[1][0] == 6


def test_surprisal_is_laplace_exact(spark, lang_docs):
    """Hand-check one document against the formula: score(token c) =
    (N + V) * 1000 div (c + 1), doc = tf-weighted floor mean."""
    out = {
        r["doc_id"]: r["score_milli"]
        for r in quality.lm_surprisal_scores(
            lang_docs, F.col("lang") == "en"
        ).collect()
    }
    # Build the reference counts exactly as the operator defines them.
    ref = [t for _, txt, lg in lang_docs.collect() if lg == "en" for t in txt.split()]
    from collections import Counter

    lm = Counter(w.lower() for w in ref)
    n_ref, v_ref = sum(lm.values()), len(lm)
    doc = "the cat sat on the mat".split()
    tfs = Counter(w.lower() for w in doc)
    num = sum(tf * ((n_ref + v_ref) * 1000 // (lm.get(t, 0) + 1)) for t, tf in tfs.items())
    assert out[1] == num // sum(tfs.values())


def test_quality_buckets_exact_terciles(spark):
    rows = [(i, "g", i * 10) for i in range(1, 7)] + [(10, "h", 5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score_milli long")
    out = {
        r["doc_id"]: r["bucket"]
        for r in quality.quality_buckets(df, "lang").collect()
    }
    assert [out[i] for i in range(1, 7)] == [
        "head", "head", "middle", "middle", "tail", "tail",
    ]  # ceil-tercile: head = rn <= ceil(n/3)
    # a single-row group is its own head
    assert out[10] == "head"


def test_domain_mixture_flattens_domination(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, "big").otherwise("small").alias("source"),
    )
    out = {r["domain"]: r for r in quality.domain_mixture(df, "source", "doc_id").collect()}
    big, small = out["big"], out["small"]
    # sqrt temperature: 900/100 docs weight 3:1 (not 9:1); the exact
    # plan is 500 * w_d div sum_w, capped at the domain size:
    # big = 500*30000 div 40000 = 375, small = min(125, 100) = 100.
    assert (big["weight"], small["weight"]) == (30_000, 10_000)
    assert (big["expected_n"], small["expected_n"]) == (375, 100)
    # the plan never over-allocates a domain beyond its size
    assert all(r["expected_n"] <= r["n_docs"] for r in out.values())
    # realized sample tracks the plan (hash-binomial; generous 30% band)
    for r in out.values():
        assert abs(r["sampled_n"] - r["expected_n"]) <= max(20, r["expected_n"] * 0.3)
    # deterministic: a second run is bit-identical
    again = {r["domain"]: r for r in quality.domain_mixture(df, "source", "doc_id").collect()}
    assert {k: tuple(v) for k, v in out.items()} == {k: tuple(v) for k, v in again.items()}


def test_domain_mixture_sample_is_broadcast_no_wide_shuffle(spark):
    """The per-doc inclusion test must consume the plan via broadcast —
    the corpus-sized side is never shuffled for the sample decision."""
    from tests.test_plans import plan_of

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, "big").otherwise("small").alias("source"),
    )
    p = plan_of(quality.domain_mixture(df, "source", "doc_id"))
    assert "BroadcastHashJoin" in p


def test_ccnet_buckets_windows_are_keyed(spark):
    """No SinglePartition window: the tercile ranks partition by
    language, so the op scales without a global sort."""
    from data__converter_spark.workloads import q_ccnet_quality_buckets
    from tests.test_plans import plan_of

    p = plan_of(q_ccnet_quality_buckets(spark, "/root/testdata/sf0.001"))
    for line in p.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "SinglePartition" not in line
