"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship compare-diff summary at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 for the driver's DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data__converter_spark import workloads

SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: keyed full-outer diff of orders vs perturbed variant,
    classified added/deleted/changed/same with status counts."""
    return workloads.q_compare_diff_summary(spark, SMOKE_DIR)


# The driver's per-round correctness gate samples the FIRST 50 entries of
# ``queries()`` in insertion order (verified: CORRECTNESS_r0{1..10}.json
# keys equal the first 50 QUERIES names of each round).  Round 11
# rotation — freshness first, CHANGED CODE PATHS first of all: no
# query whose code changed this round may keep a stale driver row.
# After r10's gate the ledger (recomputed from the CORRECTNESS union)
# is 36×r6, 46×r7, 42×r8, 43×r9, 50×r10, plus 6 never-checked
# round-11 queries (223 total).
# Slot accounting:
#   1-6   NEW round-11 queries (bm25_after_delete — text-index
#         takedowns via signed tf retractions, oracle = bm25 SQL over
#         the surviving corpus; ann_append_query — incremental IVF-PQ
#         append against frozen books, oracle = ivf_pq SQL with
#         base-drawn centroid samples; ingest_pipeline — the composed
#         decontaminate → index-delta → cluster-split ingest loop,
#         oracle = the hand-staged equivalent; ann_delete_query —
#         tombstoned ANN takedowns, oracle = ivf_pq SQL over the
#         surviving candidate stream; ann_recall_after_append — the
#         frozen-book drift alarm, oracle = the two checked legs
#         composed like similarity_pq_recall; ann_partitioned_query —
#         the cell-partitioned 100 TB layout, oracle = the flat
#         ivf_pq SQL verbatim)
#   7-12  round-11 CODE-touched, results invariant (ivm_minmax_orders
#         rides the netted-cell top-k fix; bm25_indexed /
#         sparse_indexed moved to per-applicationId scratch paths;
#         cluster_split emits native-typed cluster_id;
#         typo_pairs_names + image_dhash_pairs ride bucket_pairs'
#         null-safe hot-set anti-join)
#   13-48 ALL 36 r6-latest rows, registry order — retiring the r6
#         freshness debt entirely
#   49-50 the first 2 r7-latest rows in registry order (r7 debt
#         46 -> 44); arithmetic asserted below.
_VERIFY_FIRST = [
    # -- NEW in round 11: never driver-checked --
    "bm25_after_delete", "ann_append_query", "ingest_pipeline",
    "ann_delete_query", "ann_recall_after_append",
    "ann_partitioned_query",
    # -- round-11 code-touched, results invariant --
    "ivm_minmax_orders", "bm25_indexed", "sparse_indexed",
    "cluster_split", "typo_pairs_names", "image_dhash_pairs",
    # -- latest driver row is r6, registry order (all 36) --
    "date_remaining_days", "dedup_exact", "dedup_exact_groups",
    "text_winnow", "corpus_top_ngrams", "contamination_check",
    "text_lang_id", "text_fingerprint", "dedup_near_keep",
    "dedup_components", "dedup_cc_keep", "asof_join",
    "top_customers", "nation_volume", "dedup_minhash_lsh",
    "dedup_embedding_pairs", "length_band_filter", "rollup_volume",
    "promo_revenue", "minhash_est_error", "bigram_familiarity",
    "dedup_ngram_capped", "shipping_priority", "large_orders",
    "bilateral_trade", "local_supplier_volume", "market_share",
    "returned_revenue", "dsir_select", "dsir_sample",
    "session_paths", "tokenize_corpus", "multimodal_png_decode",
    "boilerplate_scrub", "stream_band_candidates",
    "similarity_lsh_recall",
    # -- latest driver row is r7, registry order (first 2 of 46) --
    "mask_deterministic", "mask_recovery_roundtrip",
]


assert len(_VERIFY_FIRST) == 50 and len(set(_VERIFY_FIRST)) == 50


def _rotated(names: dict) -> list[str]:
    first = [n for n in _VERIFY_FIRST if n in names]
    first_set = set(first)
    rest = [n for n in names if n not in first_set]
    return first + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    order = _rotated(workloads.QUERIES)
    return {n: workloads.QUERIES[n] for n in order}


def oracle_sql() -> dict[str, str]:
    order = [n for n in _rotated(workloads.QUERIES) if n in workloads.ORACLES]
    return {n: workloads.ORACLES[n] for n in order}
