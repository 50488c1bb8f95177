"""Graph analytics over edge DataFrames (PageRank, triangle counting).

Companion to the label-propagation connected components in
``operators.dedup`` — where components answer "which records are the
same entity", PageRank answers "which entities matter": seed-document
weighting for curation mixtures, authority scoring over a citation /
link graph, influence ranking over an interaction graph.

Engine-exactness: each iteration sums edge contributions as exact
decimals (``dec_sum``) and rounds the updated rank with the portable
``pround`` formula, so a fixed iteration count produces bit-identical
ranks on any engine — the DuckDB oracle simply unrolls the same
iterations as CTEs.

Scale (100 TB of edges): per iteration — one co-partitioned join of
edges with the current rank vector on the source key (both sides
keyed by src; Spark reuses the exchange), one keyed shuffle summing
per-destination contributions (partial-agg'd), one left join back to
the node list. Nothing driver-sized, no cross joins; rank lineage is
truncated per round with an eager localCheckpoint exactly like
``connected_components`` (flip to reliable ``checkpoint`` on a real
cluster — see SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_lake_project_spark.functions import dec_sum, pround


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    digits: int = 6,
    stats: dict | None = None,
) -> DataFrame:
    """Simplified PageRank (the classic Spark-examples formulation):
    ``rank = (1-d) + d * sum(rank(in-neighbor) / outdeg)``, iterated
    ``iters`` times from all-ones; dangling nodes keep base rank and
    contribute nothing. Returns ``(node, rank)`` over all nodes
    appearing on either edge side.

    Edge node ids must be comparable/hashable columns (cast mixed
    domains to tagged strings first so keys can't collide).

    ``stats``: pass a dict to receive observability fields (filled in
    place, like ``connected_components``): ``iters`` = iterations run
    (always the requested count — fixed-iteration PageRank has no
    convergence test), ``n_nodes`` / ``n_edges`` = graph size after
    the edge projection. At scale, cost per iteration = one
    co-partitioned join of the edge set with the rank vector + one
    partial-agg'd groupBy — iterations × edge count is the job's cost
    model.
    """
    if iters < 1:
        raise ValueError("pagerank: iters must be >= 1")
    # Materialize the (possibly expensive) edge derivation ONCE —
    # nodes, outdeg and every iteration all re-read it, and without
    # the cut each would re-run the caller's upstream joins/distinct
    # (measured 16 s → 3 s at sf0.1 on the q99 edge build).
    ecp = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst")
    ).localCheckpoint(eager=True)
    nodes = (
        ecp.select(F.col("__src").alias("node"))
        .union(ecp.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = ecp.groupBy("__src").agg(F.count("*").alias("__deg"))
    e = ecp.join(outdeg, "__src").localCheckpoint(eager=True)
    if stats is not None:
        stats["iters"] = iters
        # both counts are served from the eager checkpoints above (the
        # inner join on __src preserves every ecp row, so e.count() ==
        # edge count) — no upstream re-evaluation
        stats["n_nodes"] = nodes.count()
        stats["n_edges"] = e.count()
    ranks = nodes.withColumn("rank", F.lit(1.0))
    # decimal-exact base: Python's ``1.0 - 0.85`` is
    # 0.15000000000000002 (0.85 isn't binary-exact), a 2e-17 skew vs
    # the 0.15 every SQL oracle writes as a literal — invisible until a
    # rank lands EXACTLY on a pround half-boundary, where it flips the
    # last digit (4 of 16k nodes at sf0.1). Subtract in decimal, as a
    # human (and DuckDB's decimal literal arithmetic) would.
    from decimal import Decimal

    base = float(Decimal("1") - Decimal(repr(damping)))
    for _ in range(iters):
        # pround BEFORE the decimal cast: the cast itself quantizes to
        # ``digits`` anyway, but engines disagree on double->decimal
        # BOUNDARY rounding (Spark HALF_UP on the decimal rendering,
        # DuckDB on the binary value) — at sf0.1's edge fan-in, 16 of
        # 16k nodes crossed a boundary differently. The explicit
        # floor(x*10^d + 0.5) lands every term ~1e-17 from an exact
        # decimal, where no rounding rule can disagree.
        contribs = (
            e.join(ranks, e["__src"] == ranks["node"])
            .groupBy("__dst")
            .agg(
                dec_sum(
                    pround(F.col("rank") / F.col("__deg"), digits), digits
                ).alias("__s")
            )
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["__dst"], "left")
            .select(
                "node",
                pround(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0)),
                    digits,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact per-node triangle counts over an undirected graph —
    clustering-structure analytics (community density, spam/bot ring
    detection in an interaction graph) computed with the classic
    degree-ordered orientation so it scales to power-law graphs.

    Input edges may be directed/duplicated/self-looped; they are
    canonicalized to distinct undirected pairs first. Every triangle
    is then found exactly once: orienting each edge from the
    (degree, node)-smaller endpoint to the larger one turns the graph
    into a DAG where each triangle has one apex with out-edges to the
    other two corners, and the closing edge exists in exactly one
    orientation — so wedges (two out-edges of one node) equi-join the
    oriented edge list with NO double counting and no |V|² blowup.

    Scale: orientation caps every out-degree at O(sqrt(|E|)) — the
    wedge join is sum(outdeg²) ≤ |E|^1.5 pairs, the known optimum for
    exact counting, and every join is a keyed equi-join (wedge →
    closing edge probes on the (v, w) pair key). A hub node with 10⁶
    neighbors contributes only its back-edges to HIGHER-degree nodes
    as wedge sources, which is what makes this survive power-law skew
    at 100 TB of edges.

    Output: ``(node, n_triangles)`` for every node, zeros included.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)  # reused 4x below: cut lineage once
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("__deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("__deg").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("__deg").alias("__db"))
    a_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
        .localCheckpoint(eager=True)  # wedge join reads it 3x
    )
    e1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = e1.join(e2, "u").filter(F.col("x") != F.col("y"))
    closing = oriented.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    tris = wedges.join(closing, ["x", "y"])
    corner_counts = (
        tris.select(F.explode(F.array("u", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return (
        deg.select("node")
        .join(corner_counts, "node", "left")
        .na.fill({"n_triangles": 0})
    )
