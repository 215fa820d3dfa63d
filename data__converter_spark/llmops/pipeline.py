"""End-to-end pre-training corpus pipeline — the composition layer.

One declarative chain of the hygiene operators: quality gate -> PII
scrub -> exact dedup -> deterministic sample. The narrow stages (score
+ gate + scrub + digest) fuse into a single projection+filter over the
scan, computed once and persisted (spill-to-disk) because the dedup
semi-join reads it from both sides; the only wide ops are the dedup
aggregation and its semi-join.

At 100 TB this is the shape that matters: one pass over the content,
documents reduced to (id, lang, score, 32-byte digest) before anything
shuffles, and sampling is a hash filter — scan -> project/filter ->
one agg -> semi-join -> filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import quality_score_col, sample_hash_col, scrub_pii_col


def pretraining_pipeline(
    docs: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    min_score: float = 0.5,
    sample_pct: int = 50,
) -> DataFrame:
    """Quality-gate (raw text) -> PII-scrub digest -> exact-dedup
    (min id per digest) -> md5-hash sample. Returns (id, lang,
    score_r, content_sha) of the surviving corpus — enough to audit
    every gate decision."""
    from ..scale import persisted

    # Stage order is a cost decision: gate on RAW text first (score
    # expressions reference a stored column, so each evaluates once),
    # then scrub only the survivors for the content digest. Scoring the
    # scrubbed text instead would inline the 3-regex scrub chain into
    # every score sub-expression via Catalyst's project collapsing
    # (~6 evaluations per row — measured 3-10x the whole pipeline
    # cost). Dedup on the scrubbed digest is deliberate: docs that
    # differ only in PII dedup together.
    # tiny frame (no text); persisted because the dedup semi-join
    # reads it from both sides
    prepared = persisted(
        docs.withColumn("quality_score", quality_score_col(col))
        .filter(F.col("quality_score") >= min_score)
        .select(
            F.col(id_col),
            F.col("lang"),
            F.round("quality_score", 6).alias("score_r"),
            F.sha2(
                F.coalesce(scrub_pii_col(col).cast("string"), F.lit("")), 256
            ).alias("content_sha"),
        )
    )
    keep = prepared.groupBy("content_sha").agg(F.min(id_col).alias(id_col))
    deduped = prepared.join(keep, id_col, "left_semi")
    return deduped.filter(sample_hash_col(id_col) < sample_pct).select(
        id_col, "lang", "score_r", "content_sha"
    )


def selection_pipeline(
    docs: DataFrame,
    target,
    col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    stopwords: list[str] | None = None,
    buckets: int = 64,
    expected_n: int = 200,
    n_shards: int = 8,
) -> DataFrame:
    """The training-data SELECTION pipeline as one lazy plan: Gopher
    rule gate -> DSIR importance weights toward ``target`` ->
    deterministic weighted Poisson resample -> token-balanced shard
    assignment of the survivors.

    Stage shapes (each documented on its operator): the gate is a pure
    projection+filter fused into the scan; DSIR adds two aggregates
    and a constant-size weight-table broadcast; the resample is a
    1-row Σw broadcast + narrow integer threshold; sharding windows
    per size bucket.  The only row-scale shuffles in the whole plan
    are the DSIR (doc, bucket) aggregate, the semi-join pulling
    sampled text back, and the shard windows — the documents' text
    crosses the wire exactly once (into the shard stage).

    Output: (``id_col``, n_tokens, size_bucket, shard) of the sampled
    corpus — the write-ready shard layout.
    """
    from .textstats import (
        balanced_shards,
        dsir_scores,
        gopher_rules,
        weighted_sample,
    )

    kept = gopher_rules(
        docs,
        col=col,
        id_col=id_col,
        min_words=min_words,
        stopwords=stopwords,
        carry_cols=[col, "lang"],
    ).filter(F.col("keep"))
    scored = dsir_scores(
        kept, target=target, col=col, id_col=id_col, buckets=buckets
    )
    w = scored.select(F.col(id_col), (F.col("score_milli") + 1).alias("w"))
    sampled = weighted_sample(
        w, "w", id_col=id_col, expected_n=expected_n
    ).filter(F.col("sampled"))
    chosen = kept.join(sampled.select(id_col), id_col, "left_semi")
    return balanced_shards(chosen, n_shards=n_shards, col=col, id_col=id_col)
