"""Iterative graph analytics over keyed edge tables.

Connected components (the dedup workhorse) lives in
:mod:`llmops.dedup`; this module holds the general iterative shapes —
currently PageRank.  Everything runs in exact integer arithmetic so a
fixed iteration count is bit-reproducible on any engine and any
partition order: ranks are integer micro-units, every division floors,
and the damping update is ``150_000 + floor(850 * Σcontrib / 1000)``
— the same closed form an unrolled SQL CTE chain computes, which is
what makes an *iterative* algorithm DuckDB-oracle-checkable at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: one full rank unit in micro-units
RANK_SCALE = 1_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_permille: int = 850,
    src_col: str = "src",
    dst_col: str = "dst",
    persist_invariants: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list, exact
    integer micro-units.

    Per iteration: each node splits its rank evenly over its out-edges
    (``floor(rank / out_degree)``), contributions sum exactly as
    BIGINT on the destination key, and the damped update is
    ``(1000 - d) * RANK_SCALE / 1000 + floor(d * Σ / 1000)`` with both
    terms floored.  Dangling nodes (no out-edges) leak their rank —
    the standard simplification when ranks are used for ordering, not
    as probabilities.  Nodes with no in-edges settle at the teleport
    floor.

    Scale shape per iteration: ONE join of the ranks frame onto the
    edge list (both hash-partitioned on the source key — at scale,
    pre-bucket the edge table by src so the join co-locates without a
    shuffle) and ONE aggregate on the destination key.  State between
    iterations is the (node, rank) frame — never materialized to the
    driver; ``iterations`` joins chain into one lazy plan that AQE
    pipelines, exactly how GraphX/Pregel lowers PageRank onto the same
    shuffle primitives.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    from .scale import persisted

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # edge list annotated with the sender's out-degree: built once,
    # reused every iteration (the degree never changes).  The invariant
    # subtrees appear N+1 times in the lazy plan, but Spark's exchange
    # reuse dedups them physically (the executed plan shows
    # ReusedExchange, not repeated scans) — measured at sf0.1, forcing
    # a persist only adds materialization barriers (3.1 s lazy vs
    # 4.0 s persisted steady-state).  ``persist_invariants`` exists for
    # the multi-ACTION form (e.g. convergence loops that inspect ranks
    # between supersteps), where each action re-plans and exchange
    # reuse can no longer see across jobs.
    e_deg = e.join(out_deg, "src")
    if persist_invariants and iterations > 0:
        e_deg = persisted(e_deg)
        nodes = persisted(nodes)
    teleport = F.lit((1000 - damping_permille) * RANK_SCALE // 1000)
    ranks = nodes.select(
        "node", F.lit(RANK_SCALE).cast("bigint").alias("rank_micro")
    )
    for _ in range(iterations):
        contrib = (
            e_deg.join(
                ranks.select(
                    F.col("node").alias("src"), F.col("rank_micro").alias("r")
                ),
                "src",
            )
            .select("dst", F.floor(F.col("r") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    teleport
                    + F.floor(
                        F.lit(damping_permille)
                        * F.coalesce("in_sum", F.lit(0))
                        / F.lit(1000)
                    )
                )
                .cast("bigint")
                .alias("rank_micro"),
            )
        )
    return ranks
