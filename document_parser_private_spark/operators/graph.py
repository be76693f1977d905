"""Distributed link-graph analytics: fixed-iteration PageRank.

The canonical iterative-join shape, written the way it must be at
100 TB: each iteration is ONE shuffle (contributions grouped by dst),
the edge list is partitioned once on src and REUSED across iterations
(persist + explicit repartition so every iteration's join is
exchange-free on the edge side), and lineage is truncated per sweep
(localCheckpoint) exactly as dedup_clusters does (PLANS.md §9) — an
unchecked 10-deep loop of joins otherwise compounds planning cost and
recovery chains.

Semantics (deterministic, mirrored by the DuckDB twin's unrolled CTE
chain):
  pr_0(v)   = 1 / N
  pr_i(v)   = (1 - d) / N
              + d * ( sum over in-edges u->v of pr_{i-1}(u) / out(u)
                      + dangling_{i-1} / N )
where dangling is the total rank mass sitting on zero-out-degree nodes
(redistributed uniformly — mass is conserved, sum(pr) == 1 every
iteration). d = 0.85. Iterations are a FIXED count: deterministic
results, no convergence-dependent plans.

Reference scope note: the reference engine has no graph operators
(verified); beyond-reference training-data tier (link-graph quality
signals for web corpora).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PAGERANK_DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = PAGERANK_DAMPING,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list.

    The node set is the union of sources and destinations (duplicate
    edges count once — the edge list is deduped first, matching the
    relational twin). Returns (node, pagerank) with pagerank rounded
    to 8 decimals.
    """
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .distinct()
        .repartition("src")
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    try:
        n_nodes = nodes.count()  # driver scalar: one number, not data
        out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out"))
        # ranks carries (node, pr, out); out = 0 marks dangling nodes
        ranks = nodes.join(
            out_deg, nodes.node == out_deg.src, "left"
        ).select(
            "node",
            F.lit(1.0 / n_nodes).alias("pr"),
            F.coalesce("out", F.lit(0)).alias("out"),
        )
        base = (1.0 - damping) / n_nodes
        for _ in range(iterations):
            dangling = (
                ranks.where(F.col("out") == 0)
                .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm"))
            )
            contrib = (
                e.join(ranks.where(F.col("out") > 0),
                       e.src == F.col("node"))
                .select("dst", (F.col("pr") / F.col("out")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("inflow"))
            )
            ranks = (
                ranks.select("node", "out")
                .join(contrib, ranks.node == contrib.dst, "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.lit(damping)
                        * (
                            F.coalesce("inflow", F.lit(0.0))
                            + F.col("dm") / n_nodes
                        )
                    ).alias("pr"),
                    "out",
                )
            )
            # Truncate lineage: keeps each sweep's plan one-join deep.
            ranks = ranks.localCheckpoint(eager=False)
        out = ranks.select(
            "node", F.round("pr", 8).alias("pagerank")
        )
        # Eager checkpoint cuts the lineage back to e/nodes so they can
        # be unpersisted here instead of leaking for the session's
        # lifetime (repeated calls otherwise stack cached blocks).
        out = out.localCheckpoint()
    finally:
        e.unpersist()
        nodes.unpersist()
    return out


def _rank_lt(da: Column, a: Column, db: Column, b: Column) -> Column:
    """Total order on nodes by (degree, id) — the orientation key."""
    return (da < db) | ((da == db) & (a < b))


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected simple graph (direction/duplicates/self-loops in the
    input are canonicalized away first).

    Scale shape — the naive 3-way edge self-join enumerates every
    triangle 6x and, worse, builds wedges at hub nodes: a degree-1M
    node contributes 5*10^11 wedge rows. Degree orientation (public
    papers: Cohen 2009; Suri & Vassilvitskii 2011) fixes both: orient
    each edge from the lower (degree, id) endpoint to the higher,
    making a DAG whose max out-degree is O(sqrt(m)); wedges are pairs
    of OUT-neighbors only, so total wedge rows are bounded by O(m^1.5)
    regardless of hub skew, and each triangle is found exactly once
    (at its lowest-rank apex). Three hash joins, all on node keys —
    no driver-side state, no per-node buffers. `e`, `deg`, and the
    oriented list `o` are each consumed by 3 downstream branches, so
    they are persisted for the call (a DataFrame DAG re-computes a
    subtree once PER REFERENCE — unpersisted, the plan held 91
    exchanges and re-scanned the edge list ~9x; PLANS.md §21) and the
    result is materialized with an eager localCheckpoint so the caches
    can be released before returning, mirroring pagerank.

    Returns (node, degree, triangles, clustering); clustering is
    2*t / (deg*(deg-1)) rounded to 6, NULL for degree < 2.
    """
    s, d = F.col(src_col), F.col(dst_col)
    e = (
        edges.select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    a_first = _rank_lt(F.col("dega"), F.col("a"),
                       F.col("degb"), F.col("b"))
    o = (
        e.join(da, "a").join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(a_first, F.col("degb")).otherwise(F.col("dega"))
            .alias("vdeg"),
        )
        .persist()
    )
    try:
        o1 = o.select(F.col("u"), F.col("v").alias("y"),
                      F.col("vdeg").alias("ydeg"))
        o2 = o.select(F.col("u"), F.col("v").alias("z"),
                      F.col("vdeg").alias("zdeg"))
        wedges = o1.join(o2, "u").where(
            _rank_lt(F.col("ydeg"), F.col("y"), F.col("zdeg"), F.col("z"))
        )
        # closing edge between y and z is oriented y->z (lower rank)
        closer = o.select(F.col("u").alias("y"), F.col("v").alias("z"))
        tri = wedges.join(closer, ["y", "z"]).select("u", "y", "z")
        cnt = (
            tri.select(F.col("u").alias("node"))
            .unionAll(tri.select(F.col("y").alias("node")))
            .unionAll(tri.select(F.col("z").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("triangles"))
        )
        out = (
            deg.join(cnt, "node", "left")
            .select(
                "node",
                F.col("deg").cast("int").alias("degree"),
                F.coalesce("triangles", F.lit(0)).cast("long")
                .alias("triangles"),
                F.when(
                    F.col("deg") >= 2,
                    F.round(
                        F.coalesce("triangles", F.lit(0)) * 2.0
                        / (F.col("deg") * (F.col("deg") - 1)),
                        6,
                    ),
                ).alias("clustering"),
            )
        )
        # Eager checkpoint cuts the lineage back to e/deg/o so they
        # can be released here instead of for the session's lifetime.
        out = out.localCheckpoint()
    finally:
        e.unpersist()
        deg.unpersist()
        o.unpersist()
    return out
