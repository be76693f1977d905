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
