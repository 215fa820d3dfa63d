"""graph.pagerank: exact-integer semantics on hand-computable graphs."""

from __future__ import annotations

import pytest

from data__converter_spark.graph import pagerank


def _ranks(df):
    return {r["node"]: r["rank_micro"] for r in df.collect()}


def test_two_node_cycle_is_stationary(spark):
    # A <-> B splits all rank evenly forever: 150000 + 850000 = 1000000
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    assert _ranks(pagerank(e, iterations=3)) == {1: 1_000_000, 2: 1_000_000}


def test_dangling_source_decays_to_teleport_floor(spark):
    # A -> B only: A never receives, B's inflow dies once A hits the floor
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    r1 = _ranks(pagerank(e, iterations=1))
    assert r1 == {1: 150_000, 2: 1_000_000}
    r3 = _ranks(pagerank(e, iterations=3))
    assert r3 == {1: 150_000, 2: 277_500}  # 150000 + floor(850*150000/1000)


def test_zero_iterations_is_uniform_init(spark):
    e = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    assert _ranks(pagerank(e, iterations=0)) == {1: 1_000_000, 2: 1_000_000, 3: 1_000_000}
    with pytest.raises(ValueError):
        pagerank(e, iterations=-1)


def test_hub_outranks_leaves(spark):
    # star: all leaves point at the hub and back
    edges = [(i, 99) for i in range(1, 6)] + [(99, i) for i in range(1, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    r = _ranks(pagerank(e, iterations=3))
    hub = r[99]
    assert all(hub > r[i] for i in range(1, 6))
    # rank mass is conserved up to floor losses (no dangling nodes here)
    assert sum(r.values()) <= 6 * 1_000_000
    assert sum(r.values()) > 6 * 1_000_000 - 6_000  # floors lose < 1000 each
