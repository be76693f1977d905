"""Deterministic NER slot (U5): ORG/LOC/JOB_TITLE extraction."""

from pyspark.sql import functions as F

from document_parser_private_spark.operators.ner import (
    extract_company_col,
    extract_position_col,
    ner_extract,
)


def test_ner_extract_groups(spark):
    rows = [
        ("a", "Worked at Acme Widgets Inc as a software engineer in"
              " New York"),
        ("b", "Graduated from University of Cape Town then joined"
              " DataCorp Ltd"),
        ("c", "no entities here, just plain lowercase text"),
    ]
    d = spark.createDataFrame(rows, "doc_id string, text string")
    out = {}
    for r in ner_extract(d).collect():
        out.setdefault((r["doc_id"], r["entity_group"]), []).append(
            (r["match_idx"], r["entity"]))
    assert [e for _, e in sorted(out[("a", "ORG")])] == ["Acme Widgets Inc"]
    assert [e for _, e in sorted(out[("a", "JOB_TITLE")])] == [
        "software engineer"]
    assert [e for _, e in sorted(out[("a", "LOC")])] == ["New York"]
    # both institution shapes + suffix ORG; LOC candidate inside the ORG
    assert sorted(e for _, e in out[("b", "ORG")]) == [
        "DataCorp Ltd", "University of Cape Town"]
    assert [e for _, e in sorted(out[("b", "LOC")])] == ["Cape Town"]
    # zero-entity doc emits nothing
    assert not any(k[0] == "c" for k in out)


def test_ner_custom_gazetteer(spark):
    d = spark.createDataFrame(
        [("a", "Based in Gotham near Metropolis")],
        "doc_id string, text string")
    gaz = spark.createDataFrame([("Gotham",)], "place string")
    locs = [r["entity"] for r in ner_extract(d, gazetteer=gaz).collect()
            if r["entity_group"] == "LOC"]
    assert locs == ["Gotham"]


def test_ner_first_match_columns(spark):
    d = spark.createDataFrame(
        [("a", "Consultant then developer at Initech Corp and Hooli Inc")],
        "doc_id string, text string")
    r = d.select(
        extract_company_col(F.col("text")).alias("company"),
        extract_position_col(F.col("text")).alias("position"),
    ).first()
    assert r["company"] == "Initech Corp"   # first ORG wins
    assert r["position"] == "Consultant"    # first title-list hit wins


def test_ner_trigram_place_matches(spark):
    """r5: LOC candidates cover 1..3-word subspans, so trigram places
    match — and embedded shorter places still surface ("New York"
    inside "New York Stock Exchange")."""
    d = spark.createDataFrame(
        [("a", "Moved to New York City for work"),
         ("b", "Joined the New York Stock Exchange team in Berlin")],
        "doc_id string, text string")
    out = {}
    for r in ner_extract(d).collect():
        if r["entity_group"] == "LOC":
            out.setdefault(r["doc_id"], []).append(r["entity"])
    assert "New York City" in out["a"]
    assert "New York" in out["a"]          # embedded bigram still emitted
    assert out["b"] == ["New York", "Berlin"]
