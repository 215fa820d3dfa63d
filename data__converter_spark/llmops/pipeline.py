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


def ingest_pipeline(
    batch: DataFrame,
    corpus: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 4096,
    k_hashes: int = 3,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    train_permille: int = 800,
    val_permille: int = 100,
) -> DataFrame:
    """The production INGEST loop for one arriving document batch
    against a standing corpus, composed end-to-end as one plan —
    every stage is an already-oracle-checked operator:

    1. **Decontaminate** (:func:`~.dedup.bloom_prescreen_dedup`):
       exact dedup against the standing corpus behind the Bloom
       prescreen — only digests the corpus's membership sketch could
       not rule out reach the confirmation join; ``confirmed``
       duplicates drop.
    2. **Incremental index update**
       (:func:`~.similarity._tf_of` — the exact delta
       ``run_text_index_update`` appends): the survivors tokenize
       ONCE into tf rows; df/dl/stats follow additively, never a
       corpus rescan.  The per-survivor document length (``dl``)
       surfaces in the output as the audit of what entered the index.
    3. **Leakage-safe split assignment**
       (:func:`~.dedup.cluster_split` over corpus ∪ survivors): a
       survivor that is a NEAR-dup of a standing document inherits
       that document's cluster — and therefore its split — so
       ingestion can never leak a paraphrase of a held-out doc into
       train.

    Output: one row per SURVIVOR — (``id_col``, cluster_id, split,
    dl).  Scale shape: the survivors frame is persisted (it feeds the
    union, the tf delta, and the final semi-join); the corpus-scale
    work is the LSH pair generation the split already requires — the
    decontamination and index stages move digests and tf rows only.
    """
    from ..scale import persisted
    from .dedup import bloom_prescreen_dedup, cluster_split, minhash_lsh_pairs
    from .similarity import _tf_of

    verdict = bloom_prescreen_dedup(
        batch, corpus, col, id_col, m_bits=m_bits, k_hashes=k_hashes
    )
    survivors = persisted(
        batch.join(
            verdict.filter(~F.col("confirmed")).select(id_col),
            id_col,
            "left_semi",
        )
    )
    live = corpus.select(id_col, col).unionByName(
        survivors.select(id_col, col)
    )
    pairs = minhash_lsh_pairs(
        live, k=k, num_hashes=num_hashes, bands=bands, threshold=threshold
    )
    assign = cluster_split(
        live,
        pairs,
        id_col=id_col,
        train_permille=train_permille,
        val_permille=val_permille,
    )
    dl = (
        _tf_of(survivors, col, id_col, id_col)
        .groupBy(id_col)
        .agg(F.sum("tf").cast("bigint").alias("dl"))
    )
    return (
        survivors.select(id_col)
        .join(assign, id_col)
        .join(dl, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            "split",
            F.coalesce("dl", F.lit(0)).cast("bigint").alias("dl"),
        )
    )
