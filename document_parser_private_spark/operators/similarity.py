"""Similarity search over embedding columns.

  cosine_topk    — brute-force top-k (the exact baseline): broadcast the
                   small query set against the full table; one window per
                   query partition. At 100 TB the broadcast side stays
                   small (queries), the big side streams — no shuffle of
                   the corpus.
  lsh_buckets    — hyperplane-LSH bucketing (the scale path): per-row
                   native expressions compute an 8-bit signature; ANN
                   search = equi-join on bucket, then exact re-rank inside
                   the bucket only.

Hyperplane signs derive from md5 parity so the DuckDB oracle can compute
the identical planes (no RNG, no collected state).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_col

N_PLANES = 8

def _norm_col(vec: Column) -> Column:
    """sqrt(sum x^2) with the exact fold order cosine_col uses."""
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))


def _cosine_pre(vec_a: Column, vec_b: Column,
                norm_a: Column, norm_b: Column) -> Column:
    """cosine_col with the two norms PRECOMPUTED: per-pair crossJoin
    sites previously re-evaluated both interpreted norm folds for every
    pair (the corpus-side norm 16x per vector in the IVF assign);
    hoisting them is 3x less interpreted HOF work per pair and
    bit-identical — same dot fold order, same norm expression, same
    norm_a*norm_b multiplication order, same round(..., 6)."""
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(dot / (norm_a * norm_b), 6)



def cosine_topk(emb: DataFrame, n_queries: int = 5, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbours of the first n_queries vectors (self-query,
    excluding identity). Deterministic tie-break on (cosine desc, id asc)."""
    e = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec")
    ).withColumn("nrm", _norm_col(F.col("vec")))
    q = e.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            _cosine_pre(F.col("qvec"), F.col("vec"),
                        F.col("qnrm"), F.col("nrm")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def _plane_signs(p: int, dim: int) -> list[float]:
    """Deterministic ±1 per dimension: parity of the first hex digit of
    md5('p_j') — the same formula the DuckDB twins evaluate in SQL, but
    computed ONCE at plan-build time (the matrix is a pure function of
    (p, j), so hashing it per ROW was pure waste: 512 interpreted md5
    calls per row at dim=64 x 8 planes)."""
    return [
        1.0 if int(hashlib.md5(f"{p}_{j}".encode()).hexdigest()[0], 16) < 8
        else -1.0
        for j in range(dim)
    ]


def lsh_bucket_col(vec: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """8-char '0'/'1' signature: bit p = [dot(vec, plane_p) > 0].

    The plane matrix is embedded as a LITERAL array per plane and the
    dot product stays a zip_with + aggregate fold: measured (interleaved
    min-of-3) ~20% faster than hashing per element, while a fully
    UNROLLED 512-term scalar tree measured 4x SLOWER than the HOF loop
    — a deeply left-nested Add tree defeats codegen; the interpreted
    HOF loop is the faster evaluation for wide dot products. Fold order
    (0.0 + x_1*s_1 + ...) is unchanged, so signatures are bit-identical
    across the rewrite and engines."""
    def bit(p: int) -> Column:
        signs_lit = F.array(*[F.lit(s) for s in _plane_signs(p, dim)])
        dot = F.aggregate(
            F.zip_with(vec, signs_lit, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot > 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat_ws("", *[bit(p) for p in range(n_planes)])


def lsh_buckets(emb: DataFrame, dim: int = 64, n_planes: int = N_PLANES,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    e = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec")
    )
    return e.select(
        F.col(id_col),
        lsh_bucket_col(F.col("vec"), dim, n_planes).alias("bucket"),
    )


def ann_topk(emb: DataFrame, n_queries: int = 5, k: int = 10, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN: restrict the exact re-rank to the query's LSH bucket."""
    e = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec")
    ).withColumn("bucket", lsh_bucket_col(F.col("vec"), dim))
    q = e.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        e.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine_col(F.col("qvec"), F.col("vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer -> probe nearest cells ->
# exact re-rank inside the probed cells only
# ---------------------------------------------------------------------------

N_CELLS = 16
N_PROBE = 4


def _argmax_cell(scored: DataFrame, part_col: str) -> DataFrame:
    w = Window.partitionBy(part_col).orderBy(F.desc("aff"), F.asc("cell"))
    return scored.withColumn("rn", F.row_number().over(w)) \
                 .where(F.col("rn") == 1).drop("rn", "aff")


def ivf_centroids(emb: DataFrame, n_cells: int = N_CELLS,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Deterministic coarse quantizer: seed centroids = the first n_cells
    vectors by id, refined by ONE distributed Lloyd step (assign all
    vectors to the nearest seed by cosine, mean per cell).

    Everything is DataFrame ops (broadcast the tiny centroid set; the
    big side streams): at 100 TB the assign pass is a narrow map over
    the corpus and the refine is one groupBy of (cell, pos) partial
    averages — no iteration loop, no driver-side data. Deterministic by
    construction (seeded by id order, fixed-order dot products), so the
    DuckDB oracle can replay it exactly.
    """
    e = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec")
    ).withColumn("nrm", _norm_col(F.col("vec")))
    seeds = e.where(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell"), F.col("vec").alias("cvec"),
        F.col("nrm").alias("cnrm"),
    )
    assigned = _argmax_cell(
        e.crossJoin(F.broadcast(seeds)).select(
            F.col(id_col), "vec", "cell",
            _cosine_pre(F.col("vec"), F.col("cvec"),
                        F.col("nrm"), F.col("cnrm")).alias("aff"),
        ),
        id_col,
    )
    by_pos = assigned.select(
        "cell", F.posexplode("vec").alias("pos", "val")
    ).groupBy("cell", "pos").agg(F.avg("val").alias("m"))
    return by_pos.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("cvec")
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, vec, cell): nearest refined centroid by cosine."""
    e = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec")
    ).withColumn("nrm", _norm_col(F.col("vec")))
    cents = centroids.withColumn("cnrm", _norm_col(F.col("cvec")))
    return _argmax_cell(
        e.crossJoin(F.broadcast(cents)).select(
            F.col(id_col), "vec", "nrm", "cell",
            _cosine_pre(F.col("vec"), F.col("cvec"),
                        F.col("nrm"), F.col("cnrm")).alias("aff"),
        ),
        id_col,
    )


def ivf_topk(emb: DataFrame, n_queries: int = 5, k: int = 10,
             n_cells: int = N_CELLS, n_probe: int = N_PROBE,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN search: each query probes its n_probe highest-affinity
    cells and re-ranks exactly inside them. The corpus is scanned once to
    build cells and once to search; the per-query candidate set is
    ~n_probe/n_cells of the table instead of all of it."""
    cents = ivf_centroids(emb, n_cells, id_col, vec_col)
    # materialize the tiny centroid table (n_cells rows): it feeds THREE
    # consumers (corpus assign, query assign, query probes) and would
    # otherwise re-run the full-corpus Lloyd pass once per consumer —
    # collecting n_cells rows to the driver is the correct move at any
    # scale (same pattern as broadcasting a small dim)
    cents = emb.sparkSession.createDataFrame(
        cents.collect(), schema="cell long, cvec array<double>"
    )
    table = ivf_assign(emb, cents, id_col, vec_col)

    q = table.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qaff"), F.asc("cell"))
    cq = cents.withColumn("cnrm", _norm_col(F.col("cvec")))
    probes = (
        q.crossJoin(F.broadcast(cq))
        .select(
            "query_id", "qvec", "qnrm", "cell",
            _cosine_pre(F.col("qvec"), F.col("cvec"),
                        F.col("qnrm"), F.col("cnrm")).alias("qaff"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qvec", "qnrm", "cell")
    )
    scored = (
        table.join(F.broadcast(probes), "cell")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            _cosine_pre(F.col("qvec"), F.col("vec"),
                        F.col("qnrm"), F.col("nrm")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine",
                F.col("rank").cast("long").alias("rank"))
    )


def semantic_dedup(emb: DataFrame, threshold: float = 0.2,
                   dim: int = 64, n_planes: int = N_PLANES,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   max_bucket: int | None = 64) -> DataFrame:
    """SemDedup-style embedding dedup (Abbas et al. 2023): bucket vectors
    by hyperplane LSH, compute exact cosine only within buckets, and drop
    every vector that has a LOWER-id in-bucket neighbor with cosine >=
    threshold. Emits every input id with (keep, dup_of) where dup_of is
    the smallest such neighbor (NULL when kept) — the keeper of each
    semantic group is its min id, so the op is deterministic and
    idempotent.

    Self-enforcing flood guard (mirrors minhash_candidates):

    * EXACT-duplicate vectors pre-collapse to one representative (min id
      per distinct vector, groupBy the array itself — no string
      serialization to drift between engines). A million identical
      embeddings contribute ONE bucketed row; copies inherit
      coalesce(rep.dup_of, rep) whenever cosine(v, v) passes the
      threshold (the identical-pair cosine, so verdicts are bit-equal
      to the unguarded pairwise form). The collapse shuffle hashes the
      full vector; hot keys reduce map-side (partial min) and the
      propagate join is AQE-skew-splittable, same shape as
      minhash_candidates' fingerprint collapse.
    * Buckets with more than `max_bucket` DISTINCT vectors degrade to
      STAR comparison: every member scores only against the bucket's
      min-id hub (O(c) pairs instead of O(c²)), and is dropped iff
      cosine(member, hub) >= threshold. Hub vectors are one row per hot
      bucket (<= 2**n_planes), always broadcastable. Buckets at or
      under the cap keep exact all-pairs semantics, so normal corpora
      are unaffected. max_bucket=None disables both guards (exact
      all-pairs everywhere). The DuckDB twin in __spark_entry__ mirrors
      the full guarded semantics (tests/test_semantic_cross_dedup.py
      drives a guard-tripping corpus through both).
    """
    e = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec")
    )
    if max_bucket is None:
        eb = e.withColumn("bucket", lsh_bucket_col(F.col("vec"), dim,
                                                   n_planes))
        a = eb.select(F.col(id_col).alias("other"),
                      F.col("vec").alias("vec_a"), "bucket")
        b = eb.select(F.col(id_col), F.col("vec").alias("vec_b"), "bucket")
        pairs = (
            a.join(b, "bucket")
            .where(F.col("other") < F.col(id_col))
            .select(
                F.col(id_col), F.col("other"),
                cosine_col(F.col("vec_a"), F.col("vec_b")).alias("cosine"),
            )
            .where(F.col("cosine") >= threshold)
        )
        dup = pairs.groupBy(id_col).agg(F.min("other").alias("dup_of"))
        return emb.select(F.col(id_col)).join(dup, id_col, "left").select(
            F.col(id_col),
            F.col("dup_of").isNull().alias("keep"),
            F.col("dup_of"),
        )

    # one representative (min id) per DISTINCT vector; copies remember it
    # e/reps/rs/dup are each consumed 2-3x downstream — persist or the
    # collapse/bucket subtrees re-derive per reference (was 19 corpus
    # scans; PLANS.md §21); result eager-checkpointed, caches released.
    e = e.persist()
    reps = None
    rs = None
    dup = None
    try:
        reps = e.groupBy("vec").agg(F.min(id_col).alias(id_col)).persist()
        copies = (
            e.join(reps.select(F.col(id_col).alias("_rep"), "vec"), "vec")
            .where(F.col(id_col) != F.col("_rep"))
            .select(F.col(id_col), "vec", "_rep")
        )

        r = reps.withColumn("bucket", lsh_bucket_col(F.col("vec"), dim,
                                                     n_planes))
        stats = r.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("_n"), F.min(id_col).alias("_hub")
        )
        rs = r.join(F.broadcast(stats), "bucket").persist()

        small = rs.where(F.col("_n") <= max_bucket)
        pa = small.select("bucket", F.col(id_col).alias("other"),
                          F.col("vec").alias("vec_a"))
        pb = small.select("bucket", F.col(id_col),
                          F.col("vec").alias("vec_b"))
        pairs_small = (
            pa.join(pb, "bucket")
            .where(F.col("other") < F.col(id_col))
            .select(
                F.col(id_col), F.col("other"),
                cosine_col(F.col("vec_a"), F.col("vec_b")).alias("cosine"),
            )
        )
        hubs = rs.where(
            (F.col("_n") > max_bucket) & (F.col(id_col) == F.col("_hub"))
        ).select("bucket", F.col(id_col).alias("other"),
                 F.col("vec").alias("vec_a"))
        pairs_star = (
            rs.where((F.col("_n") > max_bucket) & (F.col(id_col) != F.col("_hub")))
            .join(F.broadcast(hubs), "bucket")
            .select(
                F.col(id_col), F.col("other"),
                cosine_col(F.col("vec_a"), F.col("vec")).alias("cosine"),
            )
        )
        pairs = pairs_small.unionByName(pairs_star) \
                           .where(F.col("cosine") >= threshold)
        dup = pairs.groupBy(id_col).agg(F.min("other").alias("dup_of")).persist()

        rep_out = reps.select(F.col(id_col)).join(dup, id_col, "left") \
                      .select(F.col(id_col), F.col("dup_of"))
        # identical-pair cosine: same zip_with/fold arithmetic the unguarded
        # pairwise form would evaluate for (copy, rep), so the gate below is
        # bit-equal to it (1.0 for nonzero vectors after round-6)
        self_cos = cosine_col(F.col("vec"), F.col("vec"))
        copy_out = (
            copies
            .join(dup.select(F.col(id_col).alias("_rep"),
                             F.col("dup_of").alias("_rep_dup")),
                  "_rep", "left")
            .select(
                F.col(id_col),
                F.when(self_cos >= threshold,
                       F.coalesce(F.col("_rep_dup"), F.col("_rep")))
                .otherwise(F.col("_rep_dup")).alias("dup_of"),
            )
        )
        out = rep_out.unionByName(copy_out).select(
            F.col(id_col),
            F.col("dup_of").isNull().alias("keep"),
            F.col("dup_of"),
        )
        out = out.localCheckpoint()
    finally:
        e.unpersist()
        if reps is not None:
            reps.unpersist()
        if rs is not None:
            rs.unpersist()
        if dup is not None:
            dup.unpersist()
    return out
