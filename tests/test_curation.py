"""Curation operators: quality rules, deterministic sampling, cluster
representative selection."""

from pyspark.sql import functions as F

from document_parser_private_spark.operators.curation import (
    cluster_representatives,
    quality_filter,
    stratified_sample,
)


def test_quality_filter_rules(spark):
    good = ("the data pipeline reads a parquet table and writes results "
            "to the output store for every batch in the schedule ") * 5
    rows = [
        ("good", good),
        ("short", "too few words"),
        ("symbols", "$$$ %% ## !! ?? " * 30),
        ("bullets", "\n".join("- item" for _ in range(60))),
    ]
    d = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in quality_filter(d).collect()}
    assert out["good"]["keep"] is True
    assert out["short"]["keep"] is False and out["short"]["ok_words"] is False
    assert out["symbols"]["ok_symbols"] is False
    assert out["bullets"]["ok_bullets"] is False


def test_stratified_sample_deterministic(spark):
    d = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    fr = {"en": 0.5, "de": 0.1}
    a = {r["doc_id"] for r in
         stratified_sample(d, fr, "lang").collect()}
    b = {r["doc_id"] for r in
         stratified_sample(d, fr, "lang").collect()}
    assert a == b                      # rerun-identical (no randomness)
    en = sum(1 for x in a if x % 2 == 0) / 1000
    de = sum(1 for x in a if x % 2 == 1) / 1000
    assert 0.4 < en < 0.6              # rates hit within hash tolerance
    assert 0.05 < de < 0.16


def test_cluster_representatives_argmax_quality(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs to "
            "the hills for a rest in the morning sun " * 3)
    rows = [
        (1, base),
        (2, base.replace("quick", "quik")),    # near-dup, worse quality?
        (9, "$$$ unrelated symbols %%%"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["cluster_id"]: (r["rep_id"], r["n_members"])
           for r in cluster_representatives(d, threshold=0.5).collect()}
    # docs 1 and 2 cluster; the rep is the higher-quality (or min id on
    # tie) member; doc 9 is its own singleton cluster
    assert out[1][1] == 2
    assert out[1][0] in (1, 2)
    assert out[9] == (9, 1)


def test_mixture_sample_proportions_and_determinism(spark):
    from document_parser_private_spark.operators.curation import (
        mixture_sample,
    )
    rows = [(i, "en" if i % 4 else "de") for i in range(4000)]
    # en: 3000 rows, de: 1000 rows; weights 3:1 inverted -> de scarce
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"en": 0.25, "de": 0.75}
    out = mixture_sample(df, weights, source_col="source").collect()
    by = {}
    for r in out:
        by.setdefault(r["source"], set()).add(r["doc_id"])
    # T = min(3000/.25, 1000/.75) = 1333.3 -> de keeps ALL 1000 rows,
    # en keeps ~ .25 * 1333.3 = ~333 (hash-bucket rounding tolerance)
    assert len(by["de"]) == 1000
    assert abs(len(by["en"]) - 333) < 60
    # unweighted sources are dropped entirely
    df2 = df.withColumn("source", df.source)
    out2 = mixture_sample(df2, {"de": 1.0}, source_col="source").collect()
    assert {r["source"] for r in out2} == {"de"}
    assert len(out2) == 1000
    # deterministic: identical on re-run
    again = mixture_sample(df, weights, source_col="source").collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}
