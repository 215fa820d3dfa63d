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


def _verify_pairs(cand, front, id_col: str, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of candidate (id_a, id_b) pairs
    against the shingle-hash sets in ``front`` — the identical
    arithmetic of :func:`~.dedup.minhash_lsh_pairs`' verify stage
    (array_intersect/array_union sizes over the md5-32 hash sets),
    factored out so the incremental ingest's cross- and self-pairs
    can never drift from the full-repair form's definition.  The
    candidate side is batch-sized, so both lookups broadcast it
    against the (possibly corpus-scale) front scan."""
    sh_a = front.select(F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a"))
    sh_b = front.select(F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b")).cast("double")
    union = F.size(F.array_union("hs_a", "hs_b")).cast("double")
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
    )


def ingest_state_build(
    corpus: DataFrame,
    path: str,
    col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> None:
    """Materialize the STANDING INGEST STATE for
    :func:`ingest_pipeline_incremental` — the dedup front-end given
    the same artifact discipline as the text index and the ANN index
    (VERDICT r11 Next #2): five parquet tables under ``path``, each
    the thing a 100 TB corpus would keep between ingests instead of
    recomputing per batch:

    - ``digests`` (id, dg): sha256 content digests — the exact-dedup
      confirmation side and the live-id roll;
    - ``bloom`` (pos): the corpus membership sketch's set-bit
      position table (mergeable: new batches OR in their bits);
    - ``front`` (id, hs, sig): the minhash front — shingle-hash sets
      + signatures from ONE Arrow pass over the corpus text, the pass
      that is never repeated again;
    - ``buckets`` (id, band, bucket): the banded-LSH postings the
      arriving batch joins against;
    - ``pairs`` (id_a, id_b, jaccard): the verified corpus-internal
      near-dup edges — :func:`~.dedup.minhash_lsh_pairs`' output over
      the corpus, maintained additively from here on.

    Build cost is the same one text pass + bucket self-join the
    full-repair :func:`ingest_pipeline` pays on EVERY batch; after
    this it is paid once."""
    from .dedup import _band_frame, _minhash_front
    from .sketches import bloom_build

    rows_per_band = num_hashes // bands
    digest = F.sha2(F.coalesce(F.col(col).cast("string"), F.lit("")), 256)
    digests = corpus.select(F.col(id_col), digest.alias("dg"))
    digests.write.mode("overwrite").parquet(f"{path}/digests")
    bloom_build(
        digests.select("dg").distinct(), "dg", m_bits, k_hashes
    ).write.mode("overwrite").parquet(f"{path}/bloom")
    front = _minhash_front(corpus, col, id_col, k, num_hashes, seed)
    front.write.mode("overwrite").parquet(f"{path}/front")
    banded = _band_frame(
        front.select(id_col, "sig"), id_col, bands, rows_per_band
    )
    banded.write.mode("overwrite").parquet(f"{path}/buckets")
    left = banded.select("band", "bucket", F.col(id_col).alias("id_a"))
    right = banded.select("band", "bucket", F.col(id_col).alias("id_b"))
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    _verify_pairs(
        cand, front.select(id_col, "hs"), id_col, threshold
    ).write.mode("overwrite").parquet(f"{path}/pairs")
    # same cache-hygiene as the ingest: the front's cached plan must
    # not be substituted into later calls' scans of the state tables
    front.unpersist()


def ingest_pipeline_incremental(
    batch: DataFrame,
    path: str,
    col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    m_bits: int = 4096,
    k_hashes: int = 3,
    train_permille: int = 800,
    val_permille: int = 100,
) -> DataFrame:
    """:func:`ingest_pipeline` in STEADY STATE: one arriving batch
    against the standing state of :func:`ingest_state_build`, with
    NO corpus-scale recomputation — the fix for the one corpus-scale
    term the full-repair form carried (its per-batch
    ``minhash_lsh_pairs`` over corpus ∪ survivors re-paired the
    whole live set every time).  Per batch:

    1. **Decontaminate** against the STANDING sketch: the batch's
       digests test against the materialized bloom position table
       (broadcast, ≤ m rows); only maybe-hits reach the confirmation
       join against the standing ``digests`` table.  Identical
       verdicts to :func:`~.dedup.bloom_prescreen_dedup` (no false
       negatives; ``confirmed`` = exact digest membership).
    2. **Pair incrementally**: the survivors' minhash front (one
       Arrow pass over BATCH text only) band-joins the standing
       ``buckets`` postings for batch-vs-corpus candidates, plus a
       batch-internal self-join; both verify with the exact-Jaccard
       arithmetic of the full form (:func:`_verify_pairs`), and the
       union with the standing ``pairs`` table IS
       ``minhash_lsh_pairs(corpus ∪ survivors)`` — every corpus-
       internal edge was verified at build/previous-ingest time and
       never recomputed.
    3. **Assign**: :func:`~.dedup.cluster_split` over the SURVIVOR
       ids and the full edge set (standing ∪ new pairs) — the
       component table derives from the pair graph alone, so the
       batch-sized frame produces rows identical to evaluating the
       whole live set and the batch path carries no corpus-linear
       join at all.  Same schema as the full form —
       (id, cluster_id, split, dl).
    4. **Commit the batch into the state**: append front / buckets /
       pairs / digests rows for the survivors and OR the survivors'
       bits into the bloom (a staged atomic swap — the table is
       ≤ m rows).  Ordering makes a crash replay IDEMPOTENT for
       correctness: ``digests`` is written LAST (the commit point),
       so a batch that crashed mid-update re-runs in full — its
       survivors are still absent from ``digests`` and re-survive —
       and the re-appended front/bucket/pair rows are harmless
       duplicates (duplicate edges do not change connected
       components; duplicate postings only cost space until the next
       state compaction).  Extra bloom bits from a partial update
       are equally harmless: the bloom only prescreens, membership
       is always confirmed against ``digests``.

    Batch cost is O(|batch| + bucket co-occupancy): the standing
    tables are scanned (buckets/front legs are broadcast-pruned by
    the batch side), never re-derived — at 100 TB the batch's text
    is the only text read anywhere in the loop.
    """
    from ..scale import persisted
    from .dedup import _band_frame, _minhash_front, cluster_split
    from .sketches import bloom_build, bloom_maybe_contains
    from .similarity import _staged_swap, _staged_swap_recover, _tf_of

    spark = batch.sparkSession
    rows_per_band = num_hashes // bands
    _staged_swap_recover(spark, f"{path}/bloom")
    digests_t = spark.read.parquet(f"{path}/digests")
    bloom_t = spark.read.parquet(f"{path}/bloom")

    digest = F.sha2(F.coalesce(F.col(col).cast("string"), F.lit("")), 256)
    new_keys = persisted(batch.select(F.col(id_col), digest.alias("dg")))
    verdict = bloom_maybe_contains(
        new_keys.select("dg"), bloom_t, "dg", m_bits, k_hashes
    ).withColumnRenamed("k", "dg")
    confirmed = (
        verdict.filter(F.col("maybe"))
        .select("dg")
        .join(digests_t.select("dg"), "dg", "left_semi")
    )
    surv_keys = persisted(new_keys.join(confirmed, "dg", "left_anti"))
    surv_ids = surv_keys.select(id_col)
    survivors = persisted(batch.join(surv_ids, id_col, "left_semi"))

    f_new = _minhash_front(survivors, col, id_col, k, num_hashes, seed)
    b_new = persisted(
        _band_frame(f_new.select(id_col, "sig"), id_col, bands, rows_per_band)
    )
    b_ref = spark.read.parquet(f"{path}/buckets")
    cross = (
        b_new.withColumnRenamed(id_col, "new_id")
        .join(b_ref.withColumnRenamed(id_col, "ref_id"), ["band", "bucket"])
        .select(
            F.least("new_id", "ref_id").alias("id_a"),
            F.greatest("new_id", "ref_id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    l = b_new.select("band", "bucket", F.col(id_col).alias("id_a"))
    r = b_new.select("band", "bucket", F.col(id_col).alias("id_b"))
    self_cand = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    f_ref = spark.read.parquet(f"{path}/front")
    combined_hs = f_ref.select(id_col, "hs").unionByName(
        f_new.select(id_col, "hs")
    )
    new_pairs = persisted(
        _verify_pairs(
            cross.unionByName(self_cand), combined_hs, id_col, threshold
        )
    )
    all_pairs = spark.read.parquet(f"{path}/pairs").unionByName(new_pairs)
    # assignment is evaluated for the SURVIVORS only: the component
    # table derives from the pair graph alone, so feeding cluster_split
    # the batch-sized survivor frame (not corpus ∪ survivors) yields
    # identical rows for every survivor while dropping the one
    # remaining corpus-linear join from the batch path — a survivor
    # near-dupping a standing doc still inherits that doc's cluster
    # through the standing pairs in the graph.
    assign = cluster_split(
        surv_ids,
        all_pairs,
        id_col=id_col,
        train_permille=train_permille,
        val_permille=val_permille,
    )
    dl = (
        _tf_of(survivors, col, id_col, id_col)
        .groupBy(id_col)
        .agg(F.sum("tf").cast("bigint").alias("dl"))
    )
    out = (
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
    # Materialize the batch receipt BEFORE mutating the state tables
    # its plan reads: the lineage captures pre-commit file listings,
    # so any later re-evaluation (cache eviction, retry) against the
    # swapped bloom / appended tables would read deleted files or
    # changed state.  Writing it into the state dir makes the result
    # durable and severs the lineage; it is batch-sized.

    out.write.mode("overwrite").parquet(f"{path}/last_batch")

    # commit the batch into the standing state (see docstring for the
    # replay-idempotence argument behind this ordering)
    f_new.write.mode("append").parquet(f"{path}/front")
    b_new.write.mode("append").parquet(f"{path}/buckets")
    new_pairs.write.mode("append").parquet(f"{path}/pairs")
    merged_bloom = bloom_t.unionByName(
        bloom_build(surv_keys.select("dg").distinct(), "dg", m_bits, k_hashes)
    ).distinct()
    _staged_swap(merged_bloom, f"{path}/bloom")
    surv_keys.write.mode("append").parquet(f"{path}/digests")
    # Release THIS call's cached frames now that the receipt and the
    # state commits are durable: their plans embed pre-commit file
    # listings of the state tables, and Spark's CacheManager would
    # substitute them into a LATER call's identical-looking scan
    # subtrees — recomputing evicted blocks from files the swap has
    # deleted.  (The receipt read below has no cached ancestry.)
    for _frame in (new_keys, surv_keys, survivors, f_new, b_new, new_pairs):
        _frame.unpersist()
    return spark.read.parquet(f"{path}/last_batch")


def ingest_state_compact(spark, path: str) -> None:
    """OPTIMIZE for the standing ingest state — the companion the
    crash-replay contract of :func:`ingest_pipeline_incremental`
    references: a batch that crashed after appending front/bucket/
    pair rows but before the ``digests`` commit point re-runs in full
    and re-appends them, which is harmless for correctness (duplicate
    edges don't change connected components; duplicate postings only
    duplicate candidates that dedup away) but accumulates dead weight.
    This folds each table back to its canonical form with the same
    staged-``_SUCCESS``-then-rename swap as the index compactors
    (:func:`~.similarity._staged_swap`), entry recovery probe
    included:

    - ``front``: one row per id (duplicates are bit-identical — the
      Arrow kernel is deterministic — so any one survives);
    - ``buckets``: distinct (id, band, bucket);
    - ``pairs``: distinct (id_a, id_b, jaccard);
    - ``digests``: distinct (id, dg);
    - ``bloom``: left untouched — the position table is already
      distinct by construction and replay adds no rows to it.

    Never required for correctness; run it when replay debt or
    long-lived append churn makes the state scans noticeably fatter
    than the corpus."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .similarity import _staged_swap, _staged_swap_recover

    for t in ("front", "buckets", "pairs", "digests"):
        _staged_swap_recover(spark, f"{path}/{t}")
    front = spark.read.parquet(f"{path}/front")
    id_col = front.columns[0]
    one = Window.partitionBy(id_col).orderBy(F.col("hs").getItem(0))
    _staged_swap(
        front.withColumn("__rn__", F.row_number().over(one))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__"),
        f"{path}/front",
    )
    _staged_swap(
        spark.read.parquet(f"{path}/buckets").distinct(), f"{path}/buckets"
    )
    _staged_swap(
        spark.read.parquet(f"{path}/pairs").distinct(), f"{path}/pairs"
    )
    _staged_swap(
        spark.read.parquet(f"{path}/digests").distinct(), f"{path}/digests"
    )
