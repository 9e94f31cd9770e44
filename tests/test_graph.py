"""Graph operators: weighted PageRank and degree-oriented triangle counts.

Catalog-level oracle checks live in test_catalog.py (graph_pagerank_trade,
graph_triangle_copurchase); these tests pin the operator semantics on
hand-checkable graphs.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bakery_big_data_spark.operators.graph import (
    oriented_edges,
    pagerank,
    triangle_counts,
)


def _edges(spark, pairs, weights=None):
    if weights is None:
        weights = [1] * len(pairs)
    return spark.createDataFrame(
        [(u, v, w) for (u, v), w in zip(pairs, weights)],
        "src bigint, dst bigint, w bigint",
    )


def _undirected(spark, pairs):
    return spark.createDataFrame(pairs, "u bigint, v bigint")


def test_triangle_counts_k4(spark):
    # K4: every node sits on C(3,2) = 3 triangles.
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    got = {
        r["node"]: r["n_tri"]
        for r in triangle_counts(_undirected(spark, pairs)).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_star_has_none(spark):
    # A star has wedges everywhere but no triangle — the classic false
    # positive for wedge-join bugs.
    pairs = [(1, k) for k in range(2, 8)]
    assert triangle_counts(_undirected(spark, pairs)).count() == 0


def test_triangle_counts_chain_plus_triangle(spark):
    # One triangle hanging off a path: only the triangle corners count.
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    got = {
        r["node"]: r["n_tri"]
        for r in triangle_counts(_undirected(spark, pairs)).collect()
    }
    assert got == {3: 1, 4: 1, 5: 1}


def test_oriented_edges_bounds_hub_outdegree(spark):
    # Leaves have degree 1 < hub degree, so every star edge is directed
    # leaf → hub and the hub's out-degree is 0 — the bound that keeps
    # wedge work O(E^1.5) on power-law hubs.
    pairs = [(1, k) for k in range(2, 12)]
    o = oriented_edges(_undirected(spark, pairs))
    out = {r["lo"] for r in o.collect()}
    assert 1 not in out
    assert o.count() == 10


def test_pagerank_hand_checked_one_iteration(spark):
    # a→b, nothing else.  r0 = (.5, .5); after one round with d=0.85:
    # b's in-contribution = 0.5, dangling mass = rank(b) = 0.5.
    e = _edges(spark, [(1, 2)])
    got = {r["node"]: r["rank"] for r in pagerank(e, 1).collect()}
    assert got[1] == pytest.approx(0.15 / 2 + 0.85 * (0.5 / 2))
    assert got[2] == pytest.approx(0.15 / 2 + 0.85 * (0.5 + 0.5 / 2))


def test_pagerank_mass_conserved(spark):
    # With dangling redistribution the ranks stay a probability vector.
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (1, 4)], weights=[3, 1, 2, 5])
    total = (
        pagerank(e, 5)
        .agg(F.sum(F.col("rank").cast("decimal(30,6)")).alias("s"))
        .collect()[0]["s"]
    )
    assert float(total) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_weight_sensitivity(spark):
    # 1 sends 9× more weight to 2 than to 3 — rank(2) must exceed rank(3).
    e = _edges(spark, [(1, 2), (1, 3)], weights=[9, 1])
    got = {r["node"]: r["rank"] for r in pagerank(e, 3).collect()}
    assert got[2] > got[3]


def _bfs(spark, edge_pairs, seed_nodes, max_hops=4):
    from bakery_big_data_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(edge_pairs, "src long, dst long")
    seeds = spark.createDataFrame([(n,) for n in seed_nodes], "node long")
    return {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, seeds, max_hops=max_hops).collect()
    }


def test_bfs_chain_layers_exactly(spark):
    # Directed chain 1→2→3→4→5→6: layering must assign the exact hop
    # count and the max_hops=4 horizon must exclude node 6.
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    assert _bfs(spark, pairs, [1]) == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_min_over_multiple_paths(spark):
    # Long way round (1→2→3→4) and a shortcut (1→4): the anti-join
    # first-discovery must keep the MINIMUM depth, and a back-edge to
    # the seed must not relabel it.
    pairs = [(1, 2), (2, 3), (3, 4), (1, 4), (4, 1)]
    assert _bfs(spark, pairs, [1]) == {1: 0, 2: 1, 3: 2, 4: 1}


def test_bfs_multi_source_and_unreachable(spark):
    # Two seeds race: each node gets the distance from its NEAREST seed;
    # a disconnected node never appears; direction is respected (7→1
    # does not make 7 reachable).
    pairs = [(1, 2), (2, 3), (3, 4), (5, 4), (7, 1)]
    got = _bfs(spark, pairs, [1, 5])
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_triangle_counts_bucketed_matches_one_pass(spark, sf_dir):
    """The bounded-memory bucketed probe is bit-identical to the one-pass
    operator for any bucket count — on hand graphs AND on the real
    co-purchase edge derivation at sf0.001 (the 8 GiB-default ×100 path,
    PERF.md round-11)."""
    from bakery_big_data_spark.operators.graph import (
        triangle_counts_bucketed,
    )
    from bakery_big_data_spark.plans.base import t

    # K4 + pendant chain: known counts, every node role exercised
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    e = _undirected(spark, pairs)
    want = {r["node"]: r["n_tri"] for r in triangle_counts(e).collect()}
    for nb in (1, 3, 8):
        got = {
            r["node"]: r["n_tri"]
            for r in triangle_counts_bucketed(e, n_buckets=nb).collect()
        }
        assert got == want, f"n_buckets={nb}"

    # real co-purchase graph (same derivation as the catalog row)
    pp = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = pp.alias("a"), pp.alias("b")
    ue = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    one = {r["node"]: r["n_tri"] for r in triangle_counts(ue).collect()}
    bucketed = {
        r["node"]: r["n_tri"]
        for r in triangle_counts_bucketed(ue, n_buckets=4).collect()
    }
    assert bucketed == one


def test_triangle_row_bucket_env_knob_identical(spark, sf_dir, monkeypatch):
    """SPARK_GRAFT_TRIANGLE_BUCKETS switches the catalog row to the
    bounded-memory probe without changing a single output row."""
    from bakery_big_data_spark.plans import REGISTRY

    q = REGISTRY["graph_triangle_copurchase"]
    base = sorted(map(tuple, q.build(spark, sf_dir).collect()))
    monkeypatch.setenv("SPARK_GRAFT_TRIANGLE_BUCKETS", "4")
    bucketed = sorted(map(tuple, q.build(spark, sf_dir).collect()))
    assert bucketed == base
