"""Parity pins for the r6 batch (mapInArrow) builders.

Each optimized operator internal is checked against the straightforward
native-Spark formulation it replaced, on a corpus with the awkward
cases (empty text, whitespace-only, \x0b vertical tab inside the ASCII
token contract, repeated tokens, unicode). Values must be identical —
these rewrites are pure plan-shape changes.
"""

import pytest
from pyspark.sql import functions as F

from document_parser_private_spark.operators.textstats import (
    WORD_RE,
    _word_count_rows_arrow,
    simhash_agg,
)

TRICKY = [
    (1, "the quick the quick the\x0bsplit"),
    (2, ""),
    (3, "   \t\r\n  "),
    (4, "solo"),
    (5, "a b c a b a été café café"),
    (6, "x " * 50 + "y"),
    (7, None),
]


@pytest.fixture(scope="module")
def tricky_df(spark):
    return spark.createDataFrame(TRICKY, "doc_id long, text string")


@pytest.fixture(scope="module")
def text_docs(spark):
    """Deterministic word-salad corpus (doc_id, text)."""
    words = ["spark", "row", "join", "the", "data", "scan", "agg",
             "merge", "fast", "slow", "été"]
    rows = [
        (i, " ".join(words[(i * 7 + j * 3) % len(words)]
                     for j in range(5 + (i % 17))))
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_count_rows_matches_groupby(spark, tricky_df):
    got = (
        _word_count_rows_arrow(tricky_df, "doc_id", "text")
        .orderBy("doc_id", "token")
        .collect()
    )
    want = (
        tricky_df.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(WORD_RE),
                                     F.lit(0))
            ).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .orderBy("doc_id", "token")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_simhash_agg_matches_codegen_votes(spark, tricky_df, text_docs):
    """The one-pass Arrow simhash must equal the explode + per-bit SUM
    vote formulation it replaced (integer arithmetic, so equality is
    exact, not approximate)."""
    for df in (tricky_df, text_docs.limit(40)):
        got = {
            r["doc_id"]: r["simhash"]
            for r in simhash_agg(df).collect()
        }
        toks = df.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(WORD_RE),
                                     F.lit(0))
            ).alias("tok"),
        ).groupBy("doc_id", "tok").agg(F.count("*").alias("cnt")).select(
            "doc_id", "cnt",
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10)
            .cast("long").alias("hv"),
        )
        aggs = [
            F.sum(
                F.when(F.col("hv").bitwiseAND(F.lit(1 << k)) != 0,
                       F.col("cnt")).otherwise(-F.col("cnt"))
            ).alias(f"s_{k}")
            for k in range(60)
        ]
        sums = toks.groupBy("doc_id").agg(*aggs)
        sim = None
        for k in range(60):
            term = F.when(F.col(f"s_{k}") > 0,
                          F.lit(1 << k)).otherwise(F.lit(0))
            sim = term if sim is None else sim + term
        want = {
            r["doc_id"]: r["simhash"]
            for r in sums.select("doc_id",
                                 sim.cast("long").alias("simhash"))
            .collect()
        }
        ids = {r["doc_id"] for r in df.select("doc_id").collect()}
        for did in ids:
            assert got[did] == want.get(did, 0), did


def test_counted_ngram_rows_match_groupby(spark, text_docs):
    from document_parser_private_spark.operators.trainprep import (
        _ngram_rows_arrow,
    )

    d = text_docs.limit(30).select(
        F.col("doc_id").alias("_id"), F.lower("text").alias("_t"))
    got = (
        _ngram_rows_arrow(d, 3, "_id", "_t", hashed=False, counted=True)
        .orderBy("_id", "gram").collect()
    )
    want = (
        _ngram_rows_arrow(d, 3, "_id", "_t", hashed=False)
        .groupBy("_id", "gram").agg(F.count("*").alias("cnt"))
        .orderBy("_id", "gram").collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_lm_self_scoring_matches_explicit_train(spark, text_docs):
    """lm_score(docs) (derived model, single tokenize pass) must equal
    lm_score(docs, train=docs) (independent model build)."""
    from document_parser_private_spark.operators.lm import lm_score

    d = text_docs.limit(40)
    a = {tuple(r) for r in lm_score(d).collect()}
    b = {tuple(r) for r in lm_score(d, train=d).collect()}
    assert a == b


def test_repetition_stats_matches_agg_form(spark, tricky_df, text_docs):
    """The one-pass Arrow repetition_stats must equal the relational
    lines/grams/join formulation it replaced — including round-6
    HALF_UP fractions, the tie-broken top bigram, and empty docs."""
    from document_parser_private_spark.operators.trainprep import (
        _repetition_stats_agg_form,
        repetition_stats,
    )

    extra = spark.createDataFrame(
        [(100, "dup line\ndup line\nuniq\n\ndup line"),
         (101, "a b a b a b"),
         (102, "x y\nx y\nx y"),
         (103, "één twee één twee")],
        "doc_id long, text string")
    for df in (tricky_df, text_docs, extra):
        got = sorted(map(tuple, repetition_stats(df).collect()))
        want = sorted(map(tuple, _repetition_stats_agg_form(df).collect()))
        assert got == want
