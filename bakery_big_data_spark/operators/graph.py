"""Distributed graph operators: weighted PageRank and degree-oriented
triangle counting.

Both are pure DataFrame compositions — joins + hash aggregates, no RDDs,
no driver-side iteration over collected data — so they inherit Spark's
shuffle machinery, AQE, and whole-stage codegen.  PageRank is iterative:
each round references the previous rank frame from two branches
(contributions + dangling mass), so lineage is cut per round via
``operators/checkpointing.py::cut_lineage`` (same plan-blowup class as
connected components / BPE; reliable ``checkpoint_dir`` mode available for
multi-executor production runs).

Numeric determinism (cross-engine hash certification): edge weights and
degrees are integers; every order-dependent double summation (rank
contributions, dangling mass) casts each addend to DECIMAL(30,6) first —
map-side combinable, exact, bit-identical regardless of partitioning (the
catalog-wide convention, plans/base.py).

Reference parity: the reference engine has no graph operators — this is
part of the LLM-data-pipeline surface (duplicate-cluster/link analysis)
layered on the same relational core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pyspark.storagelevel import StorageLevel

from bakery_big_data_spark.operators.checkpointing import cut_lineage

DEC = "decimal(30,6)"


def pagerank(
    edges: DataFrame,
    iterations: int,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Weighted PageRank over ``edges(src, dst, w)`` for a FIXED number of
    iterations; returns ``(node, rank)``.

    Fixed-iteration (not convergence-tested) so the whole computation is a
    deterministic finite plan a SQL oracle can unroll.  Per round:

    - contribution along edge (u, v) = ``(rank_u * w) / out_w_u`` (double
      ops in this exact order on both engines);
    - in-contributions per node decimal-sum (one shuffle on ``dst``,
      map-side combinable);
    - dangling mass = decimal-sum of ranks of nodes with no out-edges,
      redistributed uniformly — a lazy 1-row broadcast scalar, never a
      driver round trip;
    - ``rank' = (1-d)/N + d * (contrib + dangling/N)``.

    Scale: ranks/out-weights are node-sized frames (≪ edges); the per-round
    shuffle is edge-sized on ``dst``.  The edge frame is re-read every
    round — callers should persist/cache a hot edge frame.  Rank frames are
    lineage-cut every round (localCheckpoint, or reliable ``checkpoint_dir``
    on real clusters).
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # Lazy 1-row scalars: node count enters every plan as a broadcast join,
    # not a collected literal.
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("_n"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("_ow"))

    ranks = cut_lineage(
        nodes.crossJoin(F.broadcast(n_nodes)).select(
            "node", (F.lit(1.0) / F.col("_n").cast("double")).alias("rank")
        ),
        checkpoint_dir,
    )

    one_minus_d = 1.0 - damping
    for _ in range(iterations):
        contribs = (
            ranks.join(edges, ranks["node"] == edges["src"])
            .join(outw, "src")
            .select(
                F.col("dst").alias("node"),
                (
                    (F.col("rank") * F.col("w").cast("double"))
                    / F.col("_ow").cast("double")
                ).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum(F.col("_c").cast(DEC)).cast("double").alias("_contrib"))
        )
        dangling = (
            ranks.join(outw, ranks["node"] == outw["src"], "left_anti")
            .agg(
                F.coalesce(
                    F.sum(F.col("rank").cast(DEC)), F.lit(0).cast(DEC)
                )
                .cast("double")
                .alias("_dm")
            )
        )
        ranks = cut_lineage(
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(one_minus_d) / F.col("_n").cast("double")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_contrib"), F.lit(0.0))
                        + F.col("_dm") / F.col("_n").cast("double")
                    )
                ).alias("rank"),
            ),
            checkpoint_dir,
        )
    return ranks


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Orient an undirected edge set ``(u, v)`` (u < v, distinct) from
    lower to higher total-degree endpoint (ties by id): ``(lo, hi)`` where
    ``rank(lo) < rank(hi)`` under the (degree, id) order.

    This is THE load-bearing trick of distributed triangle counting: with
    arbitrary orientation the wedge join fans out by the square of hub
    degrees; degree orientation bounds every node's out-degree by
    O(sqrt(|E|)) (arboricity), so the wedge intermediate is
    O(|E|^{3/2}) worst-case instead of Σ deg² — the difference between a
    plan that survives a power-law co-occurrence graph at 100 TB and one
    that dies on the first hub.
    """
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    du = deg.select(
        F.col("node").alias("u"), F.col("_deg").alias("_du")
    )
    dv = deg.select(
        F.col("node").alias("v"), F.col("_deg").alias("_dv")
    )
    e = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
    )


def _adjacency_projections(adj):
    """The two endpoint-keyed views of one out-neighbor-array frame."""
    au = adj.select(F.col("lo"), F.col("_nbrs").alias("_nu"))
    av = adj.select(F.col("lo").alias("hi"), F.col("_nbrs").alias("_nv"))
    return au, av


def _wedge_corners(base_edges: DataFrame, au: DataFrame, av: DataFrame) -> DataFrame:
    """THE shared wedge probe (single source of truth for both triangle
    operators): join both endpoints' out-neighbor arrays onto each base
    edge, explode the intersection (the third corners), and credit all
    three corners of every triangle found.  Inner joins: an edge whose
    hi-end has no out-neighbors cannot base a triangle; lo always has at
    least this edge outgoing."""
    tri = (
        base_edges.join(au, "lo")
        .join(av, "hi")
        .select(
            "lo", "hi", F.explode(F.array_intersect("_nu", "_nv")).alias("_c")
        )
    )
    return tri.select(F.explode(F.array("lo", "hi", "_c")).alias("node"))


def triangle_counts(
    edges: DataFrame, checkpoint_dir: str | None = None
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph
    ``edges(u, v)`` with ``u < v`` and no duplicates; returns
    ``(node, n_tri)`` for every node in at least one triangle.

    Degree-oriented neighbor intersection (see :func:`oriented_edges`):
    a triangle with orientation order a→b→c appears exactly once, as node
    ``c`` in ``N+(a) ∩ N+(b)`` of its base edge (a, b) — the other two
    edges' intersections cannot contain the third corner because it points
    INTO one of the endpoints.  So: build per-node out-neighbor arrays
    (one edge-sized shuffle), join them onto both endpoints of every edge,
    and explode ``array_intersect`` — the wedge set (Σ out·in per node,
    O(E^1.5) after orientation) is traversed inside a per-row set probe
    and never shuffled.  Measured at sf0.1 (1.2 M edges, 1.9 M triangles)
    this is 2.5× faster than the equivalent three-way wedge join, which
    shuffles every candidate wedge.  Orientation also bounds each
    adjacency array by O(sqrt(E)); if a graph's √E exceeds a comfortable
    row size (E ≳ 10¹² at 100 TB), shard hub arrays and fall back to the
    wedge join for the sharded remainder.  Integer-only arithmetic —
    bit-identical cross-engine with no decimal scaffolding.
    """
    # the oriented frame is consumed TWICE (adjacency build + base-edge
    # join); one edge-sized materialization beats re-running the degree
    # join per consumer (~25% of the row's wall at sf0.1 — exchange reuse
    # does not cover the differing downstream projections)
    o = cut_lineage(
        oriented_edges(edges),
        checkpoint_dir,
        storage_level=StorageLevel.MEMORY_AND_DISK,
    )
    adj = o.groupBy("lo").agg(F.collect_list("hi").alias("_nbrs"))
    au, av = _adjacency_projections(adj)
    return _wedge_corners(o, au, av).groupBy("node").agg(
        F.count(F.lit(1)).alias("n_tri")
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Multi-source BFS over ``edges(src, dst)`` from ``seeds(node)``:
    returns ``(node, hops)`` — the MINIMUM hop count from any seed, for
    every node within ``max_hops``; unreached nodes are absent.

    The third iterative-graph primitive next to PageRank (value
    propagation) and connected components (label fixpoint): frontier
    expansion on the min-plus semiring.  BFS layering IS the shortest
    path — each round joins only the PREVIOUS frontier (never the whole
    reached set) against edges, and a left-anti join against the
    distance table keeps first (= minimal) discoveries only, so no
    relaxation or re-visit ever happens.  Fixed ``max_hops`` rounds keep
    the computation a deterministic finite plan a recursive-CTE oracle
    can restate; an exhausted frontier makes later rounds empty no-ops.

    Scale: each round is one frontier⋈edges shuffle (frontier-sized
    build side, broadcastable when the frontier is small) plus an
    anti-join on the node key; frames are lineage-cut per round
    (localCheckpoint, or reliable ``checkpoint_dir`` on real clusters —
    the connected-components/BPE discipline)."""
    dist = cut_lineage(
        seeds.select("node").distinct().withColumn(
            "hops", F.lit(0).cast("bigint")
        ),
        checkpoint_dir,
    )
    frontier = dist.select("node")
    for i in range(1, max_hops + 1):
        reached = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = reached.join(dist, "node", "left_anti").withColumn(
            "hops", F.lit(i).cast("bigint")
        )
        new = cut_lineage(new, checkpoint_dir)
        dist = cut_lineage(dist.unionByName(new), checkpoint_dir)
        frontier = new.select("node")
    return dist


def triangle_counts_bucketed(
    edges: DataFrame,
    n_buckets: int = 8,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Exact per-node triangle counts with a BOUNDED peak-memory profile:
    identical output to :func:`triangle_counts`, but the wedge-probe join
    runs as ``n_buckets`` disjoint passes over the base edges.

    Why this exists (r10 verdict task 5 stretch): the one-pass probe
    joins BOTH endpoints' O(√E) out-neighbor arrays onto every oriented
    edge at once, so its in-flight execution state is proportional to
    |E| × array-width — at the ×100 stress corpus (~120 M edges) that
    needs ~1 GB/core and the 32-thread single-JVM run wants a 32 GiB
    heap.  Bucketing the BASE edges by ``xxhash64(lo, hi) mod B`` cuts
    that in-flight state to |E|/B per pass while every other structure
    stays shared and spillable: the oriented edge set and the adjacency
    arrays are built ONCE (serialized spill-friendly blocks), each pass
    emits a node-sized partial-count aggregate, and the final reduce
    sums B such partials.  Total wedge work is UNCHANGED — each triangle
    is counted exactly once at its unique base edge (lo, hi), and the
    buckets partition base edges — so this trades B scheduler rounds for
    an ~B× smaller execution-memory peak: the ×100 exact count completes
    inside the DEFAULT 8 GiB heap (measured in PERF.md round-11) where
    the one-pass probe OOMs.  On a real cluster the same dial converts
    "buy bigger executors" into "run more passes" — the out-of-core
    answer for corpus-sized graphs.  Results are bit-identical to the
    one-pass operator for ANY ``n_buckets`` (asserted by
    tests/test_graph.py).
    """
    o = cut_lineage(
        oriented_edges(edges),
        checkpoint_dir,
        storage_level=StorageLevel.MEMORY_AND_DISK,
    )
    adj = cut_lineage(
        o.groupBy("lo").agg(F.collect_list("hi").alias("_nbrs")),
        checkpoint_dir,
        storage_level=StorageLevel.MEMORY_AND_DISK,
    )
    au, av = _adjacency_projections(adj)
    partials = []
    for b in range(n_buckets):
        eb = o.filter(
            F.pmod(F.xxhash64(F.col("lo"), F.col("hi")), F.lit(n_buckets))
            == b
        )
        # node-sized partial: materialized per pass so pass state is
        # released before the next bucket's join starts
        partials.append(
            cut_lineage(
                _wedge_corners(eb, au, av)
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("_part")),
                checkpoint_dir,
            )
        )
    total = partials[0]
    for p in partials[1:]:
        total = total.unionByName(p)
    return total.groupBy("node").agg(F.sum("_part").alias("n_tri"))
