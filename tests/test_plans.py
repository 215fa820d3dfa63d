"""Physical-plan regression tests.

The engine's 100 TB story rests on plan shape, not code style: filters
reaching the parquet scan, scans pruned to the referenced columns,
small dimensions broadcast instead of shuffled, aggregates split into
partial+final, top-k compiled to TakeOrderedAndProject, and narrow
mapInPandas pipelines staying shuffle-free. These tests pin each
property on the real optimized plan so a refactor can't silently
regress them at scale while staying correct on test rows.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "simple") -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def read_schemas(plan: str) -> list[str]:
    """The ReadSchema struct of every parquet scan in the plan."""
    out = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            out.append(line.split("ReadSchema:", 1)[1].strip())
    return out


@contextmanager
def no_broadcast(spark):
    """Emulate at-scale sizes: no relation qualifies for broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pricing_summary_pushdown_pruning_partial_agg(spark):
    from data__converter_spark.workloads import q_pricing_summary

    p = plan_of(q_pricing_summary(spark, SF_DIR))
    # predicate reaches the parquet reader
    assert "LessThanOrEqual(l_shipdate" in p
    # scan pruned: untouched columns never leave the file
    (schema,) = read_schemas(p)
    for col in ("l_partkey", "l_suppkey", "l_tax", "l_orderkey"):
        assert col not in schema, f"{col} should be pruned from the scan"
    # map-side partial + final aggregation around one exchange
    assert p.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(l_returnflag" in p


def test_star_join_broadcasts_all_dims(spark):
    from data__converter_spark.workloads import q_nation_volume

    p = plan_of(q_nation_volume(spark, SF_DIR))
    assert p.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in p
    # the fact table shuffles once, for the final group-by only
    assert p.count("Exchange hashpartitioning") == 1


# Every TPC-H-shape query that joins an SF-scaled dimension
# (customer / supplier / part — tables that are GBs-TBs at 100 TB).
# Their hints go through scale.maybe_broadcast, which consults the
# optimizer's size estimate: at test SF the dims broadcast; when no
# relation qualifies (the 100 TB case, emulated by no_broadcast) the
# plan MUST degrade to a shuffle join instead of hard-failing at the
# 8 GB broadcast ceiling — a forced F.broadcast hint cannot do that.
_SF_SCALED_DIM_QUERIES = [
    "top_customers",
    "nation_volume",
    "rollup_volume",
    "promo_revenue",
    "bilateral_trade",
    "local_supplier_volume",
    "market_share",
    "returned_revenue",
    "large_orders",
    "shipping_priority",
    # round-5 TPC-H shapes (Q2/Q9/Q11/Q15/Q16/Q17/Q19/Q20/Q21)
    "min_cost_supplier",
    "product_type_profit",
    "important_parts",
    "top_supplier",
    "supplier_part_counts",
    "small_qty_revenue",
    "bracket_revenue",
    "excess_stock_suppliers",
    "waiting_suppliers",
]

# Queries whose plan keeps a BroadcastNestedLoopJoin even at scale:
# a 1-row scalar aggregate cross-joined in under an INEQUALITY filter
# (equality scalars re-plan to BroadcastHashJoin). A 1-row build side
# broadcasts for free at any SF — the NestedLoop ban below is about
# row-scale cartesians, not these.
_SCALAR_CROSSJOIN_OK = {"important_parts"}


def test_sf_scaled_dims_broadcast_small_and_degrade_large(spark):
    from data__converter_spark.workloads import QUERIES

    no_hint_small, no_degrade_big = [], []
    for name in _SF_SCALED_DIM_QUERIES:
        p_small = plan_of(QUERIES[name](spark, SF_DIR))
        if "BroadcastHashJoin" not in p_small:
            no_hint_small.append(name)
        with no_broadcast(spark):
            p_big = plan_of(QUERIES[name](spark, SF_DIR))
        # constant dims (nation/region, 25 + 5 rows forever) keep their
        # unconditional hints even here — but every SF-scaled dim must
        # demote, so the BHJ count strictly drops and a shuffle join
        # (never a nested loop) takes over.
        demoted = p_big.count("BroadcastHashJoin") < p_small.count(
            "BroadcastHashJoin"
        )
        shuffled = ("SortMergeJoin" in p_big) or ("ShuffledHashJoin" in p_big)
        nested_ok = name in _SCALAR_CROSSJOIN_OK
        if not (demoted and shuffled) or ("NestedLoop" in p_big and not nested_ok):
            no_degrade_big.append(name)
    assert not no_hint_small, f"should broadcast dims at small sf: {no_hint_small}"
    assert not no_degrade_big, (
        f"must degrade to shuffle join with broadcasting off: {no_degrade_big}"
    )


def test_maybe_broadcast_gates_on_size(spark):
    from data__converter_spark.scale import maybe_broadcast

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    # tiny frame under the default threshold: hint applies
    p = plan_of(
        orders.join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    assert "BroadcastHashJoin" in p
    # explicit 1-byte threshold: frame exceeds it, no hint, shuffle join
    joined = orders.join(
        maybe_broadcast(cust, threshold_bytes=1),
        orders.o_custkey == cust.c_custkey,
    )
    with no_broadcast(spark):
        p2 = plan_of(joined)
    assert "BroadcastHashJoin" not in p2
    assert ("SortMergeJoin" in p2) or ("ShuffledHashJoin" in p2)
    # threshold -1 (broadcast disabled session-wide): never hints
    with no_broadcast(spark):
        p3 = plan_of(
            orders.join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        )
    assert "BroadcastHashJoin" not in p3


def test_top_customers_broadcast_and_takeordered(spark):
    from data__converter_spark.workloads import q_top_customers

    p = plan_of(q_top_customers(spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_topk_two_key_is_takeordered_not_global_sort(spark):
    from data__converter_spark.workloads import q_topk_two_key

    p = plan_of(q_topk_two_key(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p


def test_large_join_prunes_scans_and_degrades_to_smj(spark):
    from data__converter_spark.workloads import q_priority_revenue

    # both scans pruned to the join/agg columns regardless of strategy
    p = plan_of(q_priority_revenue(spark, SF_DIR))
    for schema in read_schemas(p):
        assert "l_returnflag" not in schema
        assert "o_orderdate" not in schema
    # when no side fits in memory (the 100 TB case), the planner must
    # fall back to a shuffle join, never a nested loop
    with no_broadcast(spark):
        p_big = plan_of(q_priority_revenue(spark, SF_DIR))
    assert ("SortMergeJoin" in p_big) or ("ShuffledHashJoin" in p_big)
    assert "NestedLoop" not in p_big


def test_multimodal_pipeline_is_shuffle_free(spark):
    from data__converter_spark.workloads import q_multimodal_image_features

    p = plan_of(q_multimodal_image_features(spark, SF_DIR))
    assert "MapInPandas" in p
    assert "Exchange" not in p, "decode/feature pipeline must stay narrow"


def test_compare_added_keys_pushes_isnotnull(spark):
    from data__converter_spark.compare import added_keys
    from data__converter_spark.workloads import orders_variant

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    p = plan_of(added_keys(orders, orders_variant(orders), "o_orderkey"))
    assert "IsNotNull(o_orderkey)" in p


def test_dedup_exact_shuffles_at_most_twice(spark):
    from data__converter_spark.llmops.dedup import exact_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plan_of(exact_dedup(docs))
    n_exchanges = p.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"expected <=2 exchanges, plan had {n_exchanges}"


def test_mask_projection_is_single_stage(spark):
    from data__converter_spark.mask import FieldRule, mask_table

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    masked, _ = mask_table(
        cust, {"c_name": FieldRule("fakeName")}, id_cols=["c_custkey"]
    )
    p = plan_of(masked)
    assert "Exchange" not in p, "rule projection must not shuffle"
    assert "BatchEvalPython" not in p, "mask rules must stay JVM-side (no UDF)"


def test_window_running_revenue_single_shuffle(spark):
    from data__converter_spark.workloads import q_window_running_revenue

    p = plan_of(q_window_running_revenue(spark, SF_DIR))
    assert p.count("Exchange hashpartitioning") == 1
    assert "Window" in p


def test_pretraining_pipeline_shape(spark):
    # scrub + score + gate fuse into the scan projection (no Python
    # worker anywhere); the only wide ops are the dedup agg and its
    # semi-join; sampling is a post-join filter.
    from data__converter_spark.workloads import q_pipeline_pretraining

    p = plan_of(q_pipeline_pretraining(spark, SF_DIR))
    assert "EvalPython" not in p, "whole pipeline must stay JVM-side"
    n = p.count("Exchange hashpartitioning")
    assert n <= 2, f"expected <=2 exchanges (dedup agg + join), got {n}"


def test_label_centroids_single_agg_shuffle(spark):
    from data__converter_spark.llmops.similarity import label_centroids

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    p = plan_of(label_centroids(emb))
    # posexplode then ONE partial+final agg around one exchange
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("HashAggregate") >= 2
    assert "EvalPython" not in p


def test_winnow_single_shuffle_window(spark):
    from data__converter_spark.llmops.textstats import winnow_fingerprints

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plan_of(winnow_fingerprints(docs))
    # one shuffle for the per-doc ordered window; distinct's exchange
    # re-uses the doc_id partitioning only if keys align — allow <= 2
    n = p.count("Exchange hashpartitioning")
    assert n <= 2, f"expected <=2 exchanges, plan had {n}"
    assert "Window" in p


def test_contamination_broadcasts_benchmark(spark):
    from data__converter_spark.workloads import q_contamination_check

    p = plan_of(q_contamination_check(spark, SF_DIR))
    # the benchmark fingerprint set must broadcast — the corpus side
    # must not shuffle for the join
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


def test_replace_first_plain_stays_jvm_side(spark):
    # Plain replacements compile to regexp_instr/substr splice — no
    # Python worker; only $n/\n group refs may use the pandas UDF.
    from data__converter_spark import pattern

    df = spark.createDataFrame([("a b a",)], ["text"])
    out = df.select(pattern.replace_first_col("text", "a", "X").alias("t"))
    p = plan_of(out)
    assert "EvalPython" not in p, "plain replace-first must not hit Python"
    assert out.collect()[0].t == "X b a"


def test_xml_fragments_stay_jvm_side(spark):
    # K4 row formatting is pure concat over printable columns — it must
    # compile to Column expressions, never a Python-worker round-trip.
    from data__converter_spark.io.writers import rows_to_xml_fragments

    df = spark.createDataFrame([("1", "a<b")], ["id", "expr"])
    p = plan_of(rows_to_xml_fragments(df))
    assert "BatchEvalPython" not in p, "XML fragment formatting must not use a Python UDF"
    assert "Exchange" not in p, "row formatting must stay narrow"


def test_chunk_text_plan_is_shuffle_free(spark):
    """The RAG chunker must stay a projection + Generate: zero Exchange
    and no Python eval anywhere — chunking a 100 TB corpus should be
    embarrassingly parallel."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["chunk_text"](spark, SF_DIR))
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_pack_sequences_single_sharded_exchange(spark):
    """Packing exchanges ONCE on the shard key — never an empty-window
    global sort (which would single-task the corpus)."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["pack_sequences"](spark, SF_DIR))
    assert p.count("Exchange") == 1
    assert "hashpartitioning(shard" in p
    assert "SinglePartition" not in p


def test_returned_revenue_preaggregates_and_takeordered(spark):
    """Q10 shape: returned-line revenue aggregates per order BEFORE the
    orders join, dims broadcast, and the top-20 compiles to
    TakeOrderedAndProject (no global sort)."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["returned_revenue"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p
    # the lineitem-side aggregate must sit below the orders join:
    # partial_sum over l_orderkey appears in the plan
    assert "partial_sum" in p and "l_orderkey" in p


def test_local_supplier_volume_broadcasts_every_dim(spark):
    """Q5 shape: the only shuffle join is lineitem⋈orders; customer,
    supplier, nation+region all arrive as broadcasts."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["local_supplier_volume"](spark, SF_DIR))
    assert p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p


def test_order_count_distribution_keeps_zero_counts(spark):
    """Q13 shape: the customer side must survive as a LEFT join (zero-
    order customers count), and both aggregations are hash aggregates
    with partials."""
    from data__converter_spark.workloads import QUERIES

    df = QUERIES["order_count_distribution"](spark, SF_DIR)
    p = plan_of(df)
    assert "LeftOuter" in p or "BuildRight" in p  # outer join retained
    assert "partial_count" in p
    rows = {r["c_count"]: r["custdist"] for r in df.collect()}
    # sf0.001 has customers; every customer appears in exactly one bucket
    from data__converter_spark.workloads import _load

    assert sum(rows.values()) == _load(spark, SF_DIR, "customer").count()


def test_no_bare_persist_in_package():
    """Every cache in the package must route through scale.persisted()
    so release_persisted() can free it — a bare .persist() leaks blocks
    across queries in a long session (the CacheManager 'already cached'
    warning). scale.py itself hosts the one legitimate .persist call."""
    import pathlib

    import data__converter_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    offenders = []
    for py in root.rglob("*.py"):
        if py.name == "scale.py":
            continue
        for i, line in enumerate(py.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            if ".persist(" in code or ".cache(" in code:
                offenders.append(f"{py.relative_to(root)}:{i}")
    assert not offenders, f"bare persist/cache outside scale.persisted: {offenders}"


def test_no_query_uses_rowwise_python_or_cartesian(spark):
    """Blanket net over EVERY registered query: no row-at-a-time Python
    eval (BatchEvalPython — Arrow/mapInPandas nodes are fine) and no
    CartesianProduct anywhere. A new operator that silently regresses
    to either shape fails here before it ships."""
    from data__converter_spark.workloads import QUERIES

    flagged = {}
    for name, fn in QUERIES.items():
        p = plan_of(fn(spark, SF_DIR))
        marks = [m for m in ("BatchEvalPython", "CartesianProduct") if m in p]
        if marks:
            flagged[name] = marks
    assert not flagged, f"anti-pattern plan nodes: {flagged}"


def test_bracket_revenue_pushes_disjunction_to_part_scan(spark):
    """Q19's OR-of-ANDs on (brand, size) must reach the part parquet
    reader as a pushed filter — a post-join residual over an unfiltered
    part scan reads the whole dimension at 100 TB."""
    from data__converter_spark.workloads import q_bracket_revenue

    p = plan_of(q_bracket_revenue(spark, SF_DIR))
    pushed = [
        ln for ln in p.splitlines()
        if "PushedFilters" in ln and "p_brand" in ln and "Or(" in ln
    ]
    assert pushed, "part-side disjunction should push into the part scan"
    # single equi-join on partkey, never a union of three joins
    assert p.count("Join") <= 2 and "CartesianProduct" not in p


def test_min_cost_supplier_single_window_exchange(spark):
    """Q2's decorrelated min runs as ONE window over the per-(part,
    supplier) aggregate — the offers aggregate and the window must
    share the p_partkey exchange lineage, with no join back of a
    second lineitem scan."""
    from data__converter_spark.workloads import q_min_cost_supplier

    p = plan_of(q_min_cost_supplier(spark, SF_DIR))
    assert p.count("Window") == 1
    # one lineitem scan only: the subquery never re-reads the fact
    li_scans = [s for s in read_schemas(p) if "l_partkey" in s]
    assert len(li_scans) == 1, f"expected 1 lineitem scan, got {len(li_scans)}"


def test_active_users_dedup_then_count_shape(spark):
    """The stream-safe decomposition must plan as dedup aggregate ->
    count aggregate (two exchanges max on the window key), never a
    countDistinct expand."""
    from data__converter_spark.workloads import q_window_active_users

    p = plan_of(q_window_active_users(spark, SF_DIR))
    # (the one Expand in this plan is the sliding-window fan-out —
    # every event into duration/slide windows — not an agg rewrite)
    assert p.count("Expand") == 1
    # dedup stage: an aggregate keyed on (window, user) with NO
    # aggregate functions, then the additive count on the window key
    assert "HashAggregate(keys=[window#" in p
    assert p.count("Exchange hashpartitioning") == 2


def test_balanced_shards_no_global_sort(spark):
    """Shard ranks window per size bucket: one hash exchange on the
    bucket, no global (rangepartitioning) sort anywhere."""
    from data__converter_spark.llmops.textstats import balanced_shards

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plan_of(balanced_shards(docs, n_shards=8))
    assert "rangepartitioning" not in p.lower()
    assert p.count("Exchange hashpartitioning") == 1


def test_gopher_quality_plan_is_shuffle_free(spark):
    """The Gopher rule gate is one narrow projection: zero Exchange,
    zero Python eval — a 100 TB corpus filters scan-side."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["gopher_quality"](spark, SF_DIR))
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_dsir_select_avoids_global_window(spark):
    """Top-N selection must compile to TakeOrderedAndProject + a
    broadcast boundary — never a rank window over one partition."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["dsir_select"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p


def test_triangle_count_no_cartesian(spark):
    """Every triangle join is an equi-join on node ids — a cartesian
    here would be the O(n^3) disaster orientation exists to prevent."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["triangle_suppliers"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_pipeline_selection_no_global_window(spark):
    """The composed selection pipeline must not smuggle in a global
    rank window or a cartesian; its only SinglePartition exchanges are
    the 1-row scalar broadcasts (Σw, DSIR totals, TakeOrdered merge)."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["pipeline_selection"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    # windows exist (shard assignment) but none over an empty partition
    # spec on the document stream: every Window clause names a key
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", p):
        assert m.group(1).strip(), f"unpartitioned Window in plan: {m.group(0)}"


def test_pq_topk_single_encode_kernel(spark):
    """PQ encoding is ONE Arrow pass over the corpus (the codes table);
    only the tiny ADC lookup joins after it."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["similarity_pq_topk"](spark, SF_DIR))
    assert p.count("MapInPandas") == 1
    assert "CartesianProduct" not in p


def test_png_roundtrip_plan_is_one_arrow_pass_no_exchange(spark):
    """multimodal_png_decode: the codec round-trip is a single
    fanned-out Arrow pass over the id projection — zero Exchange
    after the fan-out repartition, exactly one ArrowEvalPython-class
    node, pruned to the one id column."""
    from data__converter_spark.workloads import QUERIES

    df = QUERIES["multimodal_png_decode"](spark, SF_DIR)
    p = plan_of(df)
    assert p.count("MapInPandas") == 1
    # the only exchange is the fan-out RoundRobin repartition; the
    # kernel output flows straight to the sink
    import re

    exchanges = re.findall(r"Exchange (\w+)", p)
    assert all(e.startswith("RoundRobin") for e in exchanges), exchanges
    assert "doc_id" in p and "text" not in p  # column pruning held


def test_tokenize_bpe_plan_encodes_distinct_words_once(spark):
    """tokenize_bpe: exactly ONE Arrow encode kernel (over distinct
    words, not per token) and the vocab side joins broadcast at this
    SF (size-gated hint applied)."""
    from data__converter_spark.scale import release_persisted
    from data__converter_spark.workloads import QUERIES

    df = QUERIES["tokenize_bpe"](spark, SF_DIR)
    p = plan_of(df)
    release_persisted()
    assert p.count("ArrowEvalPython") == 1, p.count("ArrowEvalPython")
    assert "BroadcastHashJoin" in p
    # greedy merge runs in the kernel; no HOF fold remains in the plan
    assert "aggregate(" not in p


def test_boilerplate_scrub_plan_has_no_set_window(spark):
    """boilerplate_scrub: document frequency comes from the two-level
    distinct aggregate — no Window operator and no collect_set
    anywhere in the plan (the per-copy state-buffer shape the
    docstring forbids)."""
    from data__converter_spark.workloads import QUERIES

    df = QUERIES["boilerplate_scrub"](spark, SF_DIR)
    p = plan_of(df)
    assert "Window" not in p
    assert "collect_set" not in p
    assert "HashAggregate" in p or "ObjectHashAggregate" in p


def test_kmv_sketch_is_take_ordered_not_global_sort(spark):
    """kmv_sketch's distinct->orderBy->limit(k) must lower to
    TakeOrderedAndProject (per-partition top-k + driver head merge),
    never a global Sort — the shape that makes the k-minimum-values
    sketch collectible at any corpus size. The distinct's single
    hash exchange is the only shuffle (combiner-heavy: map-side
    partial agg dedupes before it)."""
    from pyspark.sql import functions as F

    from data__converter_spark.llmops.sketches import kmv_sketch, md5_hash32

    h = spark.range(1000).select(md5_hash32("id").alias("h"))
    p = plan_of(kmv_sketch(h, "h", k=128))
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p.replace("TakeOrderedAndProject", "")


def test_hll_partkeys_union_row_merges_registers_not_corpus(spark):
    """sketch_hll_partkeys: the __all__ union row must come from
    merging the PERSISTED register frame (a second tiny aggregate),
    not from a second corpus scan — at most the exact-truth demo
    columns rescan lineitem, so the lineitem scan count stays at the
    demo's two (registers once + truth once), never three."""
    from data__converter_spark.scale import release_persisted
    from data__converter_spark.workloads import QUERIES

    df = QUERIES["sketch_hll_partkeys"](spark, SF_DIR)
    p = plan_of(df)
    release_persisted()
    assert p.count("InMemoryTableScan") >= 2  # registers reused via cache
    # the estimate path is pure aggregation over the register frame
    assert "TakeOrderedAndProject" not in p.split("InMemoryTableScan")[0]


def test_scd2_shares_one_key_exchange(spark):
    """scd2_user_status: the lag change-detect window, the lead
    interval-close window, and the per-user aggregate must all ride
    ONE hashpartitioning(user_id) exchange — and no window may fall
    back to SinglePartition (the shape that dies at 100 TB). The only
    other exchange is the presentation orderBy's rangepartitioning."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["scd2_user_status"](spark, SF_DIR))
    assert p.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in p
    assert p.count("Window ") == 2


def test_interval_coverage_broadcasts_orders_one_keyed_exchange(spark):
    """interval_coverage: the orders (orderkey, orderdate) projection
    joins broadcast into lineitem — no shuffle join — and the island
    merge (cumulative-max window + running-sum window + aggregate) is
    one hashpartitioning(l_suppkey) exchange, never SinglePartition."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["interval_coverage"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert p.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in p


def test_weighted_sample_one_exchange_jvm_key(spark):
    """weighted_sample_customers: the A-ES key (conv/md5/ln) must stay
    JVM-side (no BatchEvalPython / no Python UDF in the plan) and the
    only hash exchange is the per-nation rank window."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["weighted_sample_customers"](spark, SF_DIR))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in p


def test_rfm_segments_one_nation_exchange_three_windows(spark):
    """rfm_segments: the three ntile windows must all ride ONE
    hashpartitioning(c_nationkey) exchange (plus the customer-agg and
    join exchanges upstream) and never SinglePartition — per-group
    segmentation is the whole scale story."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["rfm_segments"](spark, SF_DIR))
    assert "SinglePartition" not in p
    assert p.count("ntile(5)") >= 1
    # all three ntile windows fold into window nodes fed by one
    # nation-key exchange: exactly one exchange mentions c_nationkey
    import re

    nation_ex = [
        ln
        for ln in p.splitlines()
        if "Exchange hashpartitioning" in ln and "grp" in ln
    ]
    assert len(nation_ex) == 1, nation_ex


def test_embedding_scatter_vectors_never_shuffle(spark):
    """embedding_scatter: ONE mapInPandas/ArrowEvalPython kernel, and
    no Exchange may carry the embedding column — only constant-size
    (grp,i,j,v) moment rows shuffle; reshape joins broadcast."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["embedding_scatter"](spark, SF_DIR))
    for ln in p.splitlines():
        if ln.strip().lstrip("+-: ").startswith("Exchange"):
            assert "embedding" not in ln and "vec" not in ln, ln
    assert "SinglePartition" not in p
    assert "BroadcastHashJoin" in p


def test_zorder_layout_key_is_narrow_projection(spark):
    """zorder_layout: the Morton key must be pure JVM projection (no
    Python eval) and the only hash exchange is the 256-cell report
    aggregate's."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["zorder_layout"](spark, SF_DIR))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in p


def test_link_predict_caps_middles_before_self_join(spark):
    """link_predict_customers: the degree filter must land BEFORE the
    wedge self-join (the quadratic guard is pre-join, not post), the
    pair aggregate must be keyed (never SinglePartition), and the
    top-100 must lower to TakeOrderedAndProject, not a global sort."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["link_predict_customers"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert "SinglePartition" not in p
    # the deg-band filter appears as a Filter on the aggregate count
    # (deg between 2 and cap) somewhere upstream of the pair join
    assert "deg" in p


def test_basket_lift_broadcasts_totals(spark):
    """basket_lift_parts: the 1-row basket total must arrive via a
    broadcast (nested-loop on a single row), never a shuffled join,
    and the final top-50 is TakeOrderedAndProject."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["basket_lift_parts"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_basket_lift_scalar_broadcast_survives_no_auto_broadcast(spark):
    """The n_baskets scalar rides an EXPLICIT F.broadcast hint, so even
    with auto-broadcast off (emulating AQE demotion / at-scale size
    estimates) the 1-row total must stay a BroadcastNestedLoopJoin —
    a scalar degrading to CartesianProduct at 100 TB would put the
    whole pair table through a single-partition product."""
    from data__converter_spark.workloads import QUERIES

    with no_broadcast(spark):
        p = plan_of(QUERIES["basket_lift_parts"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_assoc_pairs_caps_baskets_before_self_join(spark):
    """assoc_pairs(max_basket_size): the hot-basket guard must land
    BEFORE the pair self-join (pre-join cap, like link_predict's
    middle-degree cap) — the capped plan carries the bk_n count-filter
    join, and a viral basket never reaches the quadratic stage."""
    from data__converter_spark.stats import assoc_pairs

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    p = plan_of(assoc_pairs(li, "l_orderkey", "l_partkey",
                            max_basket_size=8))
    # the size filter exists and is a pre-aggregation predicate on
    # the basket-size count, upstream of the pair join
    assert "bk_n" in p
    i_filter = p.find("bk_n")
    # pair-join condition (item_a < item_b) appears after the cap in
    # the bottom-up formatted plan string order is not guaranteed, so
    # assert structurally instead: no unconditional row explosion —
    # the filter node references the count column
    assert "<= 8" in p or "(bk_n" in p


def test_bm25_statistics_off_one_token_pass_no_global_sort(spark):
    """bm25_retrieval: the corpus tf/df/doc-length statistics reuse one
    exploded token aggregate (no second corpus scan for lengths), the
    (N, avgdl) scalar arrives via broadcast nested-loop, and the
    per-query top-k is a WindowGroupLimit — never a global sort."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["bm25_retrieval"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p
    assert "WindowGroupLimit" in p
    # no cached-relation scan by default: the lazy 3-branch recompute
    # measured FASTER than persisting the tf frame at sf0.1 (see the
    # op docstring); persist_stats=True flips this and is exercised in
    # test_llmops
    assert "InMemoryTableScan" not in p


def test_scd2_apply_history_bypasses_windows(spark):
    """scd2_apply: untouched keys and closed history reach the output
    through anti/semi joins only — the rebuild windows must consume
    the batch-sized (touched-current ∪ changes) union, and nothing in
    the plan drops to Python."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["scd2_apply_events"](spark, SF_DIR))
    assert "LeftAnti" in p
    assert "LeftSemi" in p
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p


def test_checksum_fingerprint_one_aggregate_no_join_no_sort(spark):
    """checksum_orders_monthly: the whole digest is one keyed hash
    aggregate fused over the scan — no join, no sort, no exchange
    beyond the single group-by, no Python."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["checksum_orders_monthly"](spark, SF_DIR))
    assert "Join" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # exactly one data exchange (the group-by); the only other
    # exchange is the presentation orderBy's rangepartitioning over
    # ~80 month rows
    assert p.count("Exchange hashpartitioning") == 1


def test_ewma_decayed_sum_is_sort_free(spark):
    """ewma_nation_daily: the decayed series comes from explode +
    hash aggregates — no per-key ORDER BY window (no WindowExec, no
    sort below an aggregate) anywhere in the plan."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["ewma_nation_daily"](spark, SF_DIR))
    assert "Window" not in p
    assert "Generate explode" in p
    assert "CartesianProduct" not in p


def test_compaction_window_runs_over_file_metadata_only(spark):
    """compaction_bins: the single-partition running-sum window sits
    ABOVE the per-file aggregate — the window's child plan contains
    the (already tiny) file-id hash aggregate, so data rows never
    enter the window."""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["compaction_bins"](spark, SF_DIR))
    w = p.find("Window")
    assert w != -1
    # the aggregate producing the inventory appears below the window
    assert "HashAggregate" in p[w:]


def test_k_anonymity_risk_total_broadcasts_over_class_table(spark):
    """k_anonymity_audit: the risk share is a broadcast nested-loop of
    a 1-row total over the PERSISTED class aggregate — both consumers
    read InMemoryTableScan, so customer is scanned once however many
    branches hang off the class table. (The plan text prints the
    cached relation's defining FileScan inside each InMemoryRelation
    block, so 'Scan parquet' appears per reference — the cache reads
    are what pin the single real scan.)"""
    from data__converter_spark.workloads import QUERIES

    p = plan_of(QUERIES["k_anonymity_audit"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p
    assert p.count("InMemoryTableScan") == 2


def test_ann_partitioned_index_prunes_cell_partitions(spark, tmp_path):
    """The cell-partitioned ANN layout's whole point: the probed-cell
    set becomes a PARTITION filter on the unified index scan — the
    plan's PartitionFilters carries the cell IN-set (pruning happens
    before any join), and with nprobe < n_cells strictly fewer than
    all partitions are read.  Results must equal the flat layout's
    exactly (same probes, same books)."""
    import numpy as np
    from pyspark.sql import functions as F

    from data__converter_spark.llmops.similarity import (
        ann_index_build,
        ann_index_build_partitioned,
        ivf_pq_from_index,
        ivf_pq_from_partitioned_index,
    )

    rng = np.random.RandomState(31)
    vecs = rng.uniform(-1, 1, size=(40, 8)).astype(np.float32)
    full = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    probes = full.filter(F.col("vec_id") < 2)
    p_part = str(tmp_path / "part")
    p_flat = str(tmp_path / "flat")
    ann_index_build_partitioned(full, p_part, n_cells=4, m=2, n_codes=8)
    ann_index_build(full, p_flat, n_cells=4, m=2, n_codes=8)
    got_df = ivf_pq_from_partitioned_index(
        spark, p_part, probes, k=5, nprobe=2, m=2
    )
    plan = plan_of(got_df)
    part_lines = [
        ln for ln in plan.splitlines()
        if "PartitionFilters:" in ln and "cell" in ln.split(
            "PartitionFilters:", 1)[1]
    ]
    assert part_lines, "index scan must carry a cell partition filter"
    key = lambda rs: sorted(
        (r["probe_id"], r["neighbor_id"], r["adc_dist"], r["rank"]) for r in rs
    )
    got = key(got_df.collect())
    want = key(
        ivf_pq_from_index(spark, p_flat, probes, k=5, nprobe=2, m=2).collect()
    )
    assert got == want and got
