"""Graph-analytics queries: weighted PageRank over the nation trade graph
and degree-oriented triangle counting over the part co-purchase graph.

Both graphs are DERIVED — the expensive part at 100 TB is the relational
edge construction (star joins over lineitem), which Catalyst plans like any
other join tree; the graph iteration itself runs over node/edge-sized
aggregates.  Oracle strategy: PageRank is fixed-iteration, so the DuckDB
oracle unrolls all K rounds as a CTE chain (the BPE/IVF-oracle pattern) —
the trained ranks themselves are hash-certified, not just plumbing.
Triangle counting is integer-only set algebra and restates the identical
degree-orientation predicate.

Reference parity: no graph operators exist in the reference engine
(SURVEY.md §2) — this extends the LLM-pipeline/link-analysis surface on the
same relational core (duplicate-cluster analysis, co-occurrence mining).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark.storagelevel import StorageLevel

from bakery_big_data_spark.operators.cache import PlanCache
from bakery_big_data_spark.operators.checkpointing import cut_lineage
from bakery_big_data_spark.operators.graph import pagerank, triangle_counts
from bakery_big_data_spark.plans.base import register, t

#: Shared per-(session, sf) edge materializations.  Three rows (PageRank,
#: BFS, SSSP) derive from the SAME nation-trade star-join aggregate and two
#: rows (exact triangles, DOULION) from the SAME co-purchase edge set; each
#: row used to rebuild its edges from the corpus — the only corpus-sized
#: stage any of them has — so the catalog paid the identical star join /
#: distinct self-join up to three times per sweep (guide §1.2: remove
#: redundant passes before touching anything else).  The first row to run
#: pays the build; the rest reuse the materialized blocks.
_GRAPH_CACHE = PlanCache(max_entries=4)


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w) nation-trade edge aggregate — lineitem ⋈ orders ⋈
    customer ⋈ supplier grouped to nation pairs, built ONCE per (session,
    sf) and lineage-cut (nation²-bounded: ≤ 25×25 rows)."""

    def build() -> DataFrame:
        li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
        o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        edges = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(s, li["l_suppkey"] == s["s_suppkey"])
            .filter(F.col("c_nationkey") != F.col("s_nationkey"))
            .groupBy(
                F.col("c_nationkey").alias("src"),
                F.col("s_nationkey").alias("dst"),
            )
            .agg(F.count(F.lit(1)).alias("w"))
        )
        return cut_lineage(edges, None)

    return _GRAPH_CACHE.get_or_build(spark, (sf_dir, "trade_edges"), build)


def _copurchase_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(u, v, support) undirected co-purchase pairs (u < v) WITH their
    per-basket co-occurrence counts: the per-basket self-join that
    dominates both triangle rows AND `market_basket_rules`, built ONCE
    per (session, sf).  The groupBy subsumes the former `.distinct()`
    (same pair set) while the count rides along for free — the basket
    row consumes `support` directly, the graph rows project (u, v).
    Materialized as serialized-spillable blocks (an |E|-sized
    deserialized block set was half of the ×100 heap OOM — see
    cut_lineage docstring)."""

    def build() -> DataFrame:
        pp = (
            t(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        a = pp.alias("a")
        b = pp.alias("b")
        sup = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .groupBy(
                F.col("a.l_partkey").alias("u"),
                F.col("b.l_partkey").alias("v"),
            )
            .agg(F.count(F.lit(1)).alias("support"))
        )
        return cut_lineage(
            sup, None, storage_level=StorageLevel.MEMORY_AND_DISK
        )

    return _GRAPH_CACHE.get_or_build(
        spark, (sf_dir, "copurchase_support"), build
    )


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected co-purchase edge set (u < v) — the (u, v)
    projection of the shared support frame."""
    return _copurchase_support(spark, sf_dir).select("u", "v")


_PR_ITERS = 4
_PR_DAMPING = 0.85


def _pagerank_oracle(k: int, damping: float) -> str:
    """Unrolled fixed-iteration PageRank as a DuckDB CTE chain.

    Every double expression restates the Spark operator's evaluation order
    (operators/graph.py::pagerank) verbatim; order-dependent sums go
    through DECIMAL(30,6) on both engines, so the final ranks are
    bit-identical.  Damping constants are embedded via ``repr`` so both
    engines parse the exact same IEEE doubles (1 - 0.85 is NOT the double
    nearest 0.15).

    Every CTE is ``AS MATERIALIZED``: DuckDB inlines plain CTEs at each
    reference, and this chain references ``r{{i-1}}`` twice per round
    (contribution join + dangling mass) and ``edges`` every round — the
    inlined tree re-expands the corpus-sized star join 2^k times, the
    exact 2^k blowup class the Spark side fixed with lineage cuts in r08
    (DuckDB OOMed at its 100 GiB cap at sf0.1, found by the r09
    ``bench.py --verify`` sweep).  Materialization is a pure execution
    hint: results are unchanged, each CTE runs once."""
    d = repr(float(damping))
    omd = repr(1.0 - float(damping))
    parts = [
        f"""
    WITH edges AS MATERIALIZED (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
      )
    ), nn AS MATERIALIZED (
      SELECT COUNT(*) AS n FROM nodes
    ), outw AS MATERIALIZED (
      SELECT src, SUM(w) AS ow FROM edges GROUP BY src
    ), r0 AS MATERIALIZED (
      SELECT node, CAST(1.0 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS rank
      FROM nodes CROSS JOIN nn
    )"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""", c{i} AS MATERIALIZED (
      SELECT e.dst AS node,
             CAST(SUM(CAST((r.rank * CAST(e.w AS DOUBLE))
                           / CAST(ow.ow AS DOUBLE) AS DECIMAL(30,6)))
                  AS DOUBLE) AS contrib
      FROM r{i - 1} r
      JOIN edges e ON e.src = r.node
      JOIN outw ow ON ow.src = e.src
      GROUP BY e.dst
    ), d{i} AS MATERIALIZED (
      SELECT CAST(COALESCE(SUM(CAST(r.rank AS DECIMAL(30,6))),
                           CAST(0 AS DECIMAL(30,6))) AS DOUBLE) AS dm
      FROM r{i - 1} r LEFT JOIN outw ow ON ow.src = r.node
      WHERE ow.src IS NULL
    ), r{i} AS MATERIALIZED (
      SELECT nd.node,
             CAST({omd} AS DOUBLE) / CAST(nn.n AS DOUBLE)
             + CAST({d} AS DOUBLE)
               * (COALESCE(c.contrib, CAST(0 AS DOUBLE))
                  + dg.dm / CAST(nn.n AS DOUBLE)) AS rank
      FROM nodes nd
      CROSS JOIN nn
      CROSS JOIN d{i} dg
      LEFT JOIN c{i} c ON c.node = nd.node
    )"""
        )
    parts.append(
        f"""
    SELECT r.node AS nationkey, n.n_name AS nation, r.rank AS pagerank
    FROM r{k} r JOIN nation n ON n.n_nationkey = r.node
    """
    )
    return "".join(parts)


@register(
    "graph_pagerank_trade",
    _pagerank_oracle(_PR_ITERS, _PR_DAMPING),
    doc="Weighted PageRank (4 fixed iterations, d=0.85, dangling-mass "
        "redistribution) over the customer-nation → supplier-nation trade "
        "graph: edge weight = number of lineitems a customer of nation A "
        "bought from a supplier of nation B.  Edge construction is the "
        "expensive part at 100 TB — lineitem⋈orders⋈customer⋈supplier, "
        "planned by Catalyst/AQE like any star join — while each rank "
        "round is one edge-sized shuffle on dst plus node-sized frames; "
        "rank frames are lineage-cut per round (plan doubles otherwise) "
        "and a reliable checkpoint_dir mode exists for real clusters.  "
        "Contributions and dangling mass decimal-sum per the catalog "
        "convention, so the oracle's unrolled 4-round CTE chain certifies "
        "the final ranks bit-for-bit",
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The rank loop references edges every round; the shared materialized
    # (tiny, nation²-bounded) edge aggregate is built once per session/sf
    # instead of re-running the lineitem star join per row and per round.
    edges = _trade_edges(spark, sf_dir)
    ranks = pagerank(edges, iterations=_PR_ITERS, damping=_PR_DAMPING)
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return ranks.join(
        F.broadcast(nation), ranks["node"] == nation["n_nationkey"]
    ).select(
        F.col("node").alias("nationkey"),
        F.col("n_name").alias("nation"),
        F.col("rank").alias("pagerank"),
    )


@register(
    "graph_triangle_copurchase",
    """
    WITH pp AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), ue AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM pp a
      JOIN pp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM ue UNION ALL SELECT v FROM ue
      ) GROUP BY node
    ), oe AS MATERIALIZED (
      SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
                  THEN e.u ELSE e.v END AS lo,
             CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
                  THEN e.v ELSE e.u END AS hi
      FROM ue e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ), tri AS MATERIALIZED (
      SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM oe e1
      JOIN oe e2 ON e2.lo = e1.hi
      JOIN oe e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    ), corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ), counts AS (
      SELECT node, COUNT(*) AS n_tri FROM corners GROUP BY node
    ), ranked AS (
      SELECT node, n_tri,
             ROW_NUMBER() OVER (ORDER BY n_tri DESC, node) AS rk
      FROM counts
    )
    SELECT node AS part_key, n_tri, rk FROM ranked WHERE rk <= 20
    """,
    doc="Top-20 parts by triangle count in the co-purchase graph (parts "
        "appearing in the same order are linked).  Degree-oriented wedge "
        "join — each edge directed from its lower-(degree, id) endpoint, "
        "bounding out-degrees by O(sqrt(E)) so the wedge intermediate is "
        "O(E^1.5) even on power-law hubs (arbitrary orientation squares "
        "hub degrees and dies at scale); each triangle found exactly once "
        "then credited to its three corners via explode + one hash agg.  "
        "Integer-only — no decimal scaffolding needed.  The final top-20 "
        "window runs over the node-sized aggregate, never the base table.  "
        "The probe pass count B is CORPUS-SCALED by default (auto: "
        "B = ceil(E / 15 M), the measured per-pass envelope of the "
        "default 8 GiB heap — PERF.md round-11/12), so the default path "
        "cannot be OOM'd by graph growth; "
        "SPARK_GRAFT_TRIANGLE_BUCKETS=<B> pins it (bit-identical output "
        "for any B)",
)
def graph_triangle_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shared materialized edge set: the corpus-scale distinct self-join is
    # referenced three times downstream (degree union x2 + orientation)
    # and by the DOULION row — built once per session/sf (_GRAPH_CACHE)
    ue = _copurchase_edges(spark, sf_dir)
    import os

    from bakery_big_data_spark.operators.graph import (
        triangle_counts_bucketed,
    )

    raw = os.environ.get("SPARK_GRAFT_TRIANGLE_BUCKETS", "auto")
    if raw == "auto":
        # corpus-scaled pass count (r12 verdict task 4, the
        # dedup_semantic_scaled k(n) discipline): the one-pass probe's
        # in-flight state is |E| × O(√E) neighbor arrays — the measured
        # ×100 boundary is ~120 M edges OOM-killing the default 8 GiB
        # heap while 8 bucketed passes (~15 M base edges each) complete
        # (PERF.md round-11/12).  B = ceil(E / 15 M) keeps every pass at
        # or under that measured per-pass envelope: sf0.1 (~1 M edges)
        # stays one-pass, the ×100 corpus lands on the proven B=8 point,
        # and larger corpora scale passes linearly instead of heap.  The
        # edge count is one eager metadata-cheap action over the already-
        # materialized edge blocks (same class as dedup_semantic_scaled's
        # corpus count).
        n_buckets = min(max(-(-ue.count() // 15_000_000), 1), 256)
    else:
        try:
            n_buckets = int(raw)
        except ValueError as exc:
            raise ValueError(
                f"SPARK_GRAFT_TRIANGLE_BUCKETS must be an integer pass "
                f"count or 'auto', got {raw!r}"
            ) from exc
    if not 1 <= n_buckets <= 256:  # each pass is an eager job; bound it
        raise ValueError(
            f"SPARK_GRAFT_TRIANGLE_BUCKETS out of range [1, 256]: {n_buckets}"
        )
    counts = (
        triangle_counts(ue)
        if n_buckets == 1
        else triangle_counts_bucketed(ue, n_buckets=n_buckets)
    )
    # top-k FIRST (TakeOrderedAndProject: per-partition heaps + a 20-row
    # driver merge), THEN rank the 20 survivors — a global row_number
    # window here would sort the whole node-sized aggregate in ONE
    # partition (~2 M parts at the ×100 corpus)
    top = counts.orderBy(F.col("n_tri").desc(), F.col("node")).limit(20)
    w = Window.orderBy(F.col("n_tri").desc(), F.col("node"))
    return top.select(
        F.col("node").alias("part_key"),
        "n_tri",
        F.row_number().over(w).alias("rk"),
    )


#: DOULION sampling probability p = 1/4 as a 31-bit hash threshold:
#: keep an edge iff its portable md5-half hash < floor(p·2^31).
_DOULION_THRESHOLD = 536_870_912
_DOULION_INV_P3 = 64.0  # (1/p)^3 — the unbiased estimator's scale factor


@register(
    "graph_triangle_doulion_estimate",
    f"""
    WITH pp AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), ue AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM pp a
      JOIN pp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), se AS MATERIALIZED (
      SELECT u, v FROM ue
      WHERE (('0x' || substr(md5(u::VARCHAR || '_' || v::VARCHAR), 1, 8))::BIGINT
             & 2147483647) < {_DOULION_THRESHOLD}
    ), deg AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM se UNION ALL SELECT v FROM se
      ) GROUP BY node
    ), oe AS MATERIALIZED (
      SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
                  THEN e.u ELSE e.v END AS lo,
             CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
                  THEN e.v ELSE e.u END AS hi
      FROM se e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ), tri AS (
      SELECT COUNT(*) AS t
      FROM oe e1
      JOIN oe e2 ON e2.lo = e1.hi
      JOIN oe e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    )
    SELECT (SELECT COUNT(*) FROM ue) AS n_edges,
           (SELECT COUNT(*) FROM se) AS n_sampled_edges,
           CAST(t AS BIGINT) AS n_tri_sampled,
           CAST(t AS DOUBLE) * {_DOULION_INV_P3!r} AS doulion_estimate
    FROM tri
    """,
    doc="DOULION (Tsourakakis et al., KDD 2009) edge-sampled triangle "
        "estimate over the co-purchase graph: keep each edge independently "
        "with p=1/4 via the catalog's portable md5-half hash (deterministic "
        "and bit-identical cross-engine, so the SAMPLE ITSELF is "
        "hash-certified, not just the arithmetic), exact-count triangles on "
        "the sampled graph with the same degree-oriented wedge probe, and "
        "scale by p^-3 for the unbiased global estimate.  This is the "
        "documented production fallback for the exact row's inherent "
        "O(E^1.5): sampling cuts wedge work by ~p^2 and the materialized "
        "edge frame by p (PERF.md round-10 x100 finding) — at 100 TB you "
        "run DOULION first and pay for exactness only where the bound "
        "isn't enough",
)
def graph_triangle_doulion_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bakery_big_data_spark.operators.graph import triangle_counts

    # consumed twice (total count + sample) and shared with the exact
    # triangle row — one materialization per session/sf (_GRAPH_CACHE)
    ue = _copurchase_edges(spark, sf_dir)
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("_", F.col("u"), F.col("v"))), 1, 8
            ),
            16,
            10,
        )
        .cast("bigint")
        .bitwiseAND(F.lit(2147483647))
    )
    se = ue.filter(h < F.lit(_DOULION_THRESHOLD))
    tri = triangle_counts(se).agg(
        F.coalesce((F.sum("n_tri") / 3).cast("bigint"), F.lit(0).cast("bigint"))
        .alias("n_tri_sampled")
    )
    ne = ue.agg(F.count(F.lit(1)).alias("n_edges"))
    ns = se.agg(F.count(F.lit(1)).alias("n_sampled_edges"))
    return (
        ne.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_edges",
            "n_sampled_edges",
            "n_tri_sampled",
            (F.col("n_tri_sampled").cast("double") * F.lit(_DOULION_INV_P3))
            .alias("doulion_estimate"),
        )
    )


_BFS_HOPS = 4


@register(
    "graph_bfs_reachability",
    f"""
    WITH RECURSIVE edges_all AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ), mx AS (
      SELECT MAX(w) AS mw FROM edges_all
    ), edges AS (
      SELECT src, dst FROM edges_all, mx WHERE w * 3 >= mw
    ), seeds AS (
      SELECT n_nationkey AS node
      FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), reach AS (
      SELECT node, 0 AS d FROM seeds
      UNION
      SELECT e.dst, r.d + 1 FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.d < {_BFS_HOPS}
    )
    SELECT n.n_nationkey AS nationkey, n.n_name AS nation,
           CAST(MIN(d) AS BIGINT) AS hops
    FROM reach JOIN nation n ON n.n_nationkey = reach.node
    GROUP BY 1, 2
    """,
    doc="Multi-source BFS shortest hops (the min-plus iterative primitive "
        "next to PageRank's value propagation and the CC label fixpoint): "
        "minimum hop count from any EUROPE nation over the HEAVY trade "
        "edges — the nation trade graph sparsified to edges with "
        "w*3 >= max(w), where max(w) enters the plan as a lazy 1-row "
        "broadcast (never a driver round trip), making the cut "
        "scale-free.  BFS layering with a per-round left-anti join "
        "discovers each node exactly once at its minimal depth "
        "(operators/graph.py::bfs_hops, per-round lineage cuts, fixed "
        f"{_BFS_HOPS} rounds); the oracle restates it as a depth-bounded "
        "recursive CTE with MIN(d), so the hash certifies the layering "
        "IS the shortest path.  Edge construction — the only corpus-"
        "sized stage — is the same Catalyst/AQE star join as the "
        "PageRank row",
)
def graph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bakery_big_data_spark.operators.graph import bfs_hops

    # shared nation²-bounded edge aggregate (one star join per session/sf,
    # the PageRank discipline); the sparsification cut is derived lazily
    # from the materialized blocks — max(w) is a 1-row broadcast
    edges_all = _trade_edges(spark, sf_dir)
    mx = edges_all.agg(F.max("w").alias("mw"))
    edges = (
        edges_all.crossJoin(F.broadcast(mx))
        .filter(F.col("w") * 3 >= F.col("mw"))
        .select("src", "dst")
    )
    nation = t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = t(spark, sf_dir, "region")
    seeds = nation.join(
        F.broadcast(region),
        nation["n_regionkey"] == region["r_regionkey"],
    ).filter(F.col("r_name") == "EUROPE").select(
        F.col("n_nationkey").alias("node")
    )
    dist = bfs_hops(edges, seeds, max_hops=_BFS_HOPS)
    return dist.join(
        F.broadcast(nation), dist["node"] == nation["n_nationkey"]
    ).select(
        F.col("node").alias("nationkey"),
        F.col("n_name").alias("nation"),
        "hops",
    )


_SSSP_ROUNDS = 4


def _sssp_oracle(rounds: int) -> str:
    head = """
    WITH edges AS MATERIALIZED (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(1000000 // COUNT(*) + 1 AS BIGINT) AS cost
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ), d0 AS (
      SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
    )"""
    rounds_sql = []
    for i in range(1, rounds + 1):
        rounds_sql.append(
            f""", d{i} AS MATERIALIZED (
      SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT e.dst AS node, d.dist + e.cost AS dist
        FROM d{i - 1} d JOIN edges e ON e.src = d.node
      ) GROUP BY node
    )"""
        )
    tail = f"""
    SELECT d.node, n.n_name, d.dist
    FROM d{rounds} d JOIN nation n ON n.n_nationkey = d.node
    """
    return head + "".join(rounds_sql) + tail


@register(
    "graph_sssp_weighted",
    _sssp_oracle(_SSSP_ROUNDS),
    doc="WEIGHTED single-source shortest paths over the nation trade "
        "graph (Bellman-Ford, 4 relaxation rounds — completes the graph "
        "family: PageRank = importance, triangles = clustering, BFS = "
        "unweighted hops, this = weighted min-plus): edge cost = "
        "1000000 div trade_count + 1 (heavier trade lanes are shorter), "
        "ALL-INTEGER arithmetic so every relaxation is exact in both "
        "engines; 4 rounds bound path length exactly like the oracle's "
        "unrolled CTE chain.  Plan shape: the corpus-sized work is ONE "
        "star join building the nation^2-bounded edge aggregate "
        "(lineage-cut once, the PageRank discipline); each round is a "
        "frontier-join + map-side-combinable MIN keyed by edge dst, and "
        "every round's tiny distance frame is lineage-cut so the "
        "union-plus-join recursion cannot double the plan per round "
        "(the 2^k lesson, third appearance)",
)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shared nation²-bounded edge aggregate; cost derives lazily from the
    # materialized (src, dst, w) blocks — same integers as the inline
    # `1000000 div count(1) + 1` aggregate the row used to rebuild
    edges = _trade_edges(spark, sf_dir).select(
        "src",
        "dst",
        (F.expr("1000000 div w") + F.lit(1)).cast("bigint").alias("cost"),
    )
    d = spark.range(1).select(
        F.lit(0).cast("bigint").alias("node"),
        F.lit(0).cast("bigint").alias("dist"),
    )
    for _ in range(_SSSP_ROUNDS):
        relaxed = (
            d.join(edges, d["node"] == edges["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("cost")).alias("dist"),
            )
        )
        d = (
            d.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
        )
        d = cut_lineage(d, None)
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return d.join(
        F.broadcast(nation), d["node"] == nation["n_nationkey"]
    ).select("node", "n_name", "dist")
