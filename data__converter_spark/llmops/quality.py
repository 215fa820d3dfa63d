"""Corpus-level quality scoring and mixture planning — the CCNet /
DoReMi-shaped selection steps between cleaning and training:

- :func:`lm_surprisal_scores`: score every document by a unigram
  language model trained on a reference slice of the SAME corpus run
  (CCNet trains KenLM on Wikipedia; the operator shape is identical —
  model counts come from a filter, scores go to every row).
- :func:`quality_buckets`: per-language head/middle/tail split at exact
  tercile ranks of the score (CCNet's perplexity buckets).
- :func:`domain_mixture`: temperature-reweighted per-domain sampling
  plan (w_d ~ n_d^0.5, the Pile/DoReMi-style flattening of dominant
  domains) with a deterministic md5 per-doc inclusion rule.

Everything is integer arithmetic over exact counts — the one
non-integer step, sqrt for the 0.5-temperature weight, is IEEE-754
correctly-rounded in both Spark and DuckDB, so floor(sqrt(x)) is
engine-identical and the DuckDB oracle checks values exactly.

Scale shapes: the LM is a (token, count) table built by one aggregate
over the reference slice and joined back by token (broadcast when it
fits, shuffle-on-token otherwise — never collected); bucket thresholds
are per-language window ranks (keyed windows, no global sort); the
mixture plan aggregates to one row per domain and the per-doc sample is
an embarrassingly parallel hash test against the broadcast plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col


def _lower_tokens(df: DataFrame, text_col: str, id_col: str, *extra: str) -> DataFrame:
    """(id, extra..., tok): the lowercased whitespace-token stream."""
    return df.select(
        id_col, *extra, F.explode(tokens_col(text_col)).alias("raw")
    ).select(id_col, *extra, F.lower("raw").alias("tok"))


def lm_surprisal_scores(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram surprisal against a model trained on
    the ``target`` slice, in exact integer milli-units.

    Laplace-smoothed inverse probability: a token with reference count
    c scores ``(N + V) * 1000 div (c + 1)`` (N = reference token count,
    V = reference vocab size; unseen tokens take c = 0), and a document
    scores the tf-weighted floor-mean of its token scores — rank-
    equivalent to mean log-likelihood for filtering purposes while
    staying float-free (the same integer-score trick as
    textstats.pmi_collocations). Lower = more like the reference.

    Output: (id_col, n_tokens, score_milli); docs with no tokens score
    0 with n_tokens = 0.
    """
    toks = _lower_tokens(df, text_col, id_col)
    ref = _lower_tokens(df.filter(target), text_col, id_col)
    lm = ref.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = lm.agg(
        F.sum("c").alias("n_ref"), F.count(F.lit(1)).alias("v_ref")
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        tf.join(lm, "tok", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            "tf",
            F.expr("(n_ref + v_ref) * 1000 div (coalesce(c, 0) + 1)").alias("s"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.expr("sum(tf * s) div sum(tf)").alias("score_milli"),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("score_milli", F.lit(0)).cast("long").alias("score_milli"),
    )


def quality_buckets(
    scores: DataFrame,
    group_col: str,
    score_col: str = "score_milli",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group head/middle/tail at exact tercile ranks: rank rows by
    (score asc, id) inside each group; a row is head when
    ``(rn-1)*3 < n`` (i.e. rn <= ceil(n/3) — a 1-row group is its own
    head, matching CCNet's keep-the-best intent), middle when
    ``(rn-1)*3 < 2n``, else tail. The windows are KEYED by the group
    (per-language partitions), so no SinglePartition sort exists at any
    corpus size.

    Output: scores' columns + bucket.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    wn = Window.partitionBy(group_col)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    return scores.select(
        "*",
        F.when((rn - 1) * 3 < n, F.lit("head"))
        .when((rn - 1) * 3 < n * 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# 32-bit md5 space for the per-doc inclusion test.
_SPACE32 = 1 << 32


def domain_mixture(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    target_permille: int = 500,
) -> DataFrame:
    """Square-root-temperature domain mixture plan plus its realized
    deterministic sample, one row per domain.

    Weights flatten dominant domains: ``w_d = floor(sqrt(n_d * 10^6))``
    (exact-integer input; IEEE sqrt is correctly rounded, so the floor
    is engine-identical). The plan allocates ``target = total *
    target_permille/1000`` docs proportionally to w_d —
    ``expected_n = target * w_d div sum(w)`` — and realizes it with the
    md5 inclusion test ``h32(doc_id) * n_d < expected_n * 2^32``
    (cross-multiplied, no division), which is append/retry-stable and
    needs no shuffle: the per-domain plan broadcasts into a narrow
    projection of the corpus.

    Output: (domain, n_docs, weight, expected_n, sampled_n), ordered by
    domain. expected_n is the plan; sampled_n its hash realization
    (binomial-close, exactly reproducible).
    """
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    per = per.select(
        "domain",
        "n_docs",
        F.expr("CAST(floor(sqrt(CAST(n_docs * 1000000 AS DOUBLE))) AS BIGINT)").alias(
            "weight"
        ),
    )
    tot = per.agg(
        F.sum("weight").alias("sum_w"), F.sum("n_docs").alias("total_docs")
    )
    plan = per.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_docs",
        "weight",
        # Capped at the domain's size: sqrt-flattening can allocate a
        # small domain more than it has, and this sampler is
        # without-replacement (epoch-repeat upweighting is a training-
        # loader concern, not a selection one).
        F.least(
            F.expr(
                f"(total_docs * {target_permille} div 1000) * weight div sum_w"
            ),
            F.col("n_docs"),
        ).alias("expected_n"),
    )
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    dec = "decimal(38,0)"
    picks = (
        df.select(F.col(domain_col).alias("domain"), h.alias("h"))
        .join(F.broadcast(plan), "domain")
        .filter(
            F.col("h").cast(dec) * F.col("n_docs").cast(dec)
            < F.col("expected_n").cast(dec) * F.lit(_SPACE32).cast(dec)
        )
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("sampled_n"))
    )
    return (
        plan.join(picks, "domain", "left")
        .select(
            "domain",
            "n_docs",
            "weight",
            "expected_n",
            F.coalesce("sampled_n", F.lit(0)).cast("long").alias("sampled_n"),
        )
        .orderBy("domain")
    )
