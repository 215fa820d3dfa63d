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


def test_triangle_count_known_graphs(spark):
    from data__converter_spark.graph import triangle_count

    # K4 on {1,2,3,4}: C(4,3)=4 triangles, every node in exactly 3.
    # A pendant edge (4,5) and a 4-cycle {10,11,12,13} add no triangles.
    # Edges arrive in BOTH directions + duplicated to test canonicalization.
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    square = [(10, 11), (11, 12), (12, 13), (13, 10), (11, 10)]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (5, 4)] + square + [(7, 7)], "src long, dst long"
    )
    out = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    # two triangles sharing edge (1,2): per-corner credit is exact
    shared = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4)], "src long, dst long"
    )
    out2 = {r["node"]: r["n_triangles"] for r in triangle_count(shared).collect()}
    assert out2 == {1: 2, 2: 2, 3: 1, 4: 1}
