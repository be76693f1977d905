"""Tests for semantic_dedup (embedding-cluster pruning) and
cross_corpus_dedup (new-vs-reference near-dup screen)."""

import math
import random

import pyspark.sql.functions as F

from document_parser_private_spark.operators.dedup import cross_corpus_dedup
from document_parser_private_spark.operators.similarity import (
    lsh_buckets,
    semantic_dedup,
)

DIM = 64


def _vec(rng):
    return [rng.uniform(-1, 1) for _ in range(DIM)]


def test_semantic_dedup_identical_vectors_drop_to_min_id(spark):
    rng = random.Random(3)
    base = _vec(rng)
    other = _vec(rng)
    rows = [(1, base), (2, base), (3, base), (4, other)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in semantic_dedup(df, threshold=0.99).collect()}
    assert got[1]["keep"] and got[1]["dup_of"] is None
    assert not got[2]["keep"] and got[2]["dup_of"] == 1
    assert not got[3]["keep"] and got[3]["dup_of"] == 1
    assert got[4]["keep"]  # random other vector: cosine << 0.99


def test_semantic_dedup_matches_naive_within_buckets(spark):
    rng = random.Random(17)
    rows = [(i, _vec(rng)) for i in range(80)]
    # inject near-dup pairs (identical vectors share a bucket for sure)
    rows += [(100 + i, rows[i][1]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    thr = 0.3
    buckets = {r["vec_id"]: r["bucket"]
               for r in lsh_buckets(df, dim=DIM).collect()}
    vecs = dict(rows)

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    exp = {}
    for vid in vecs:
        lower = [o for o in vecs
                 if o < vid and buckets[o] == buckets[vid]
                 and cos(vecs[o], vecs[vid]) >= thr]
        exp[vid] = min(lower) if lower else None
    got = {r["vec_id"]: r["dup_of"]
           for r in semantic_dedup(df, threshold=thr).collect()}
    assert got == exp


def test_cross_corpus_dedup_identity_neardup_clean(spark):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    near = base.replace("kappa", "kappa2")   # one token off: jaccard ~0.9
    ref = spark.createDataFrame(
        [(1, base), (2, "one two three four five six seven eight nine ten")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(11, base),                              # identity -> dup of 1
         (12, near),                              # near-dup -> dup of 1
         (13, "totally different words that overlap with nothing else")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           cross_corpus_dedup(new, ref, threshold=0.5).collect()}
    assert got[11]["is_dup"] and got[11]["ref_id"] == 1
    assert got[12]["is_dup"] and got[12]["ref_id"] == 1
    assert not got[13]["is_dup"] and got[13]["ref_id"] is None
    assert got[13]["n_ref_matches"] == 0
    assert len(got) == 3


def test_cross_corpus_dedup_exact_flood_counts_members(spark):
    """A reference text repeated 100x collapses to ONE banded
    representative, yet n_ref_matches reports all 100 members; the three
    identical new copies each get the same verdict via fingerprint
    propagation."""
    text = ("the quick brown fox jumps over the lazy dog again and again "
            "with plenty of tokens to shingle")
    ref = spark.createDataFrame(
        [(i, text) for i in range(100)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1000 + i, text) for i in range(3)]
        + [(2000, "unrelated content entirely disjoint from the flood")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           cross_corpus_dedup(new, ref, threshold=0.5).collect()}
    for i in range(3):
        assert got[1000 + i]["is_dup"]
        assert got[1000 + i]["ref_id"] == 0
        assert got[1000 + i]["n_ref_matches"] == 100
    assert not got[2000]["is_dup"]


def _naive_guarded(vecs, buckets, thr, cap):
    """Pure-Python oracle of the GUARDED semantic_dedup contract:
    exact-dup collapse to min-id rep, all-pairs in buckets <= cap,
    star-vs-hub above, copies inherit coalesce(rep_dup, rep) gated on
    the identical-pair cosine."""
    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    by_vec = {}
    for vid, v in vecs.items():
        by_vec.setdefault(tuple(v), []).append(vid)
    rep_of = {vid: min(ids) for ids in by_vec.values() for vid in ids}
    reps = sorted({min(ids) for ids in by_vec.values()})
    by_bucket = {}
    for r in reps:
        by_bucket.setdefault(buckets[r], []).append(r)
    dup = {}
    for members in by_bucket.values():
        members = sorted(members)
        if len(members) <= cap:
            for i, b_ in enumerate(members):
                lower = [a_ for a_ in members[:i]
                         if cos(vecs[a_], vecs[b_]) >= thr]
                if lower:
                    dup[b_] = min(lower)
        else:
            hub = members[0]
            for m in members[1:]:
                if cos(vecs[hub], vecs[m]) >= thr:
                    dup[m] = hub
    out = {}
    for vid, v in vecs.items():
        r = rep_of[vid]
        if vid == r:
            out[vid] = dup.get(r)
        elif cos(v, v) >= thr:
            out[vid] = dup.get(r, r)
        else:
            out[vid] = dup.get(r)
    return out


def test_semantic_dedup_star_guard_matches_naive(spark):
    """Buckets over the cap degrade to star-vs-hub; verified against a
    pure-Python reimplementation of the guarded contract with cap=2 so
    random 64-dim vectors trip it."""
    rng = random.Random(41)
    rows = [(i, _vec(rng)) for i in range(250)]
    rows += [(1000 + i, rows[i][1]) for i in range(6)]  # exact copies
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    thr, cap = 0.05, 2
    buckets = {r["vec_id"]: r["bucket"]
               for r in lsh_buckets(df, dim=DIM).collect()}
    vecs = dict(rows)
    # the star branch must actually engage for this test to mean anything
    rep_buckets = [buckets[v] for v in vecs if v < 1000]
    assert max(map(rep_buckets.count, set(rep_buckets))) > cap
    exp = _naive_guarded(vecs, buckets, thr, cap)
    got = {r["vec_id"]: r["dup_of"]
           for r in semantic_dedup(df, threshold=thr,
                                   max_bucket=cap).collect()}
    assert got == exp


def test_semantic_dedup_exact_flood_within_memory(spark):
    """50k identical embeddings: the pre-collapse leaves ONE bucketed
    row, every copy resolves to dup_of=0 via the rep, and the job stays
    linear (no quadratic pair generation, no blown buffers)."""
    rng = random.Random(7)
    base = _vec(rng)
    arr = F.array(*[F.lit(float(v)) for v in base])
    df = spark.range(50000).select(
        F.col("id").alias("vec_id"), arr.alias("embedding"))
    out = semantic_dedup(df, threshold=0.2)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("keep").cast("int")).alias("kept"),
        F.min("dup_of").alias("dmin"),
        F.max("dup_of").alias("dmax"),
    ).collect()[0]
    assert agg["n"] == 50000
    assert agg["kept"] == 1
    assert agg["dmin"] == 0 and agg["dmax"] == 0


def test_semantic_dedup_twin_matches_on_guard_tripping_corpus(spark):
    """The DuckDB twin mirrors the guarded semantics, so parity must
    hold on a corpus that trips BOTH branches (a >64-distinct-vector
    bucket via positive scalings, plus exact copies) — the driver's
    sf0.01 embeddings never do."""
    import duckdb
    import pandas as pd
    import __spark_entry__ as E

    rng = random.Random(23)
    base = _vec(rng)
    rows = []
    # 90 DISTINCT positive scalings: identical plane signs -> one hot
    # bucket; pairwise cosine 1.0
    for i in range(90):
        s = 1.0 + i * 1e-6
        rows.append((i, [v * s for v in base]))
    other = _vec(rng)
    rows += [(200 + i, list(other)) for i in range(30)]   # exact copies
    rows += [(400 + i, _vec(rng)) for i in range(60)]     # background
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    buckets = [r["bucket"] for r in
               lsh_buckets(df.where("vec_id < 100"), dim=DIM).collect()]
    assert len(set(buckets)) == 1 and len(buckets) > 64  # hot branch engages

    got = {r["vec_id"]: (int(r["keep"]), r["dup_of"])
           for r in semantic_dedup(df, threshold=0.2).collect()}

    con = duckdb.connect()
    con.register("embeddings",
                 pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    twin = {vid: (int(keep), dup) for vid, keep, dup in
            con.execute(E._SEMANTIC_DEDUP_SQL).fetchall()}
    assert got == twin
