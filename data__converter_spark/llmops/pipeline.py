"""End-to-end pre-training corpus pipeline — the composition layer.

One declarative chain of the hygiene operators: PII scrub -> quality
gate -> exact dedup -> deterministic sample. Each stage is the already
oracle-verified primitive; composing them stays one logical plan, so
Catalyst pipelines the narrow stages (scrub + score + gate are a single
projection+filter over the scan) and the only wide ops are the dedup
aggregation and its semi-join.

At 100 TB this is the shape that matters: no intermediate
materialization between stages, content never shuffles (the dedup key
is a 32-byte digest), and sampling is a hash filter — the whole pass is
scan -> project/filter -> one agg -> semi-join -> filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_dedup
from .textstats import quality_score_col, sample_hash_col, scrub_pii_col


def pretraining_pipeline(
    docs: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    min_score: float = 0.5,
    sample_pct: int = 50,
) -> DataFrame:
    """Scrub -> score-gate -> exact-dedup (min id per digest) ->
    md5-hash sample. Returns (id, lang, score_r, content_sha) of the
    surviving corpus — enough to audit every gate decision."""
    scrubbed = docs.withColumn(col, scrub_pii_col(col))
    gated = scrubbed.withColumn(
        "quality_score", quality_score_col(col)
    ).filter(F.col("quality_score") >= min_score)
    deduped = exact_dedup(gated, col=col, id_col=id_col)
    sampled = deduped.filter(sample_hash_col(id_col) < sample_pct)
    return sampled.select(
        F.col(id_col),
        "lang",
        F.round("quality_score", 6).alias("score_r"),
        F.sha2(F.coalesce(F.col(col).cast("string"), F.lit("")), 256).alias(
            "content_sha"
        ),
    )
