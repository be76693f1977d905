"""THE correctness gate (BASELINE.json): span-sequence equality
(kind, text, media_ref, order) per document between the Spark pipeline and
the pure-Python reference-semantics oracle, plus golden equality of
sections / metrics / extracted entities."""

import datetime

import pytest

from document_parser_private_spark.oracle import expected_rows
from document_parser_private_spark.plans.pipeline import extract_pipeline
from document_parser_private_spark.operators.sections import SECTIONS_FIELDS


@pytest.fixture(scope="module")
def result_by_id(spark, corpus_df):
    out = extract_pipeline(corpus_df, num_partitions=4).collect()
    return {r["doc_id"]: r for r in out}


@pytest.fixture(scope="module")
def golden_by_id(corpus_rows):
    return {e["doc_id"]: e for e in expected_rows(corpus_rows)}


def test_every_doc_present(result_by_id, golden_by_id):
    assert set(result_by_id) == set(golden_by_id)


def test_span_sequence_equality(result_by_id, golden_by_id):
    """Per-row invariant: element-wise (kind, text, media_ref, order)."""
    for doc_id, exp in golden_by_id.items():
        got = result_by_id[doc_id]
        got_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in got["clean_spans"]
        ]
        exp_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in exp["spans"]
        ]
        assert got_spans == exp_spans, f"span mismatch for {doc_id}"


def test_block_metrics(result_by_id, golden_by_id):
    for doc_id, exp in golden_by_id.items():
        got = result_by_id[doc_id]
        assert got["blocks_kept"] == exp["blocks_kept"], doc_id
        assert got["blocks_dropped"] == exp["blocks_dropped"], doc_id


def test_sections_equality(result_by_id, golden_by_id):
    for doc_id, exp in golden_by_id.items():
        got = result_by_id[doc_id]["sections"].asDict()
        want = {name: exp["sections"].get(name) for name in SECTIONS_FIELDS}
        assert got == want, f"sections mismatch for {doc_id}"


def test_contact_equality(result_by_id, golden_by_id):
    for doc_id, exp in golden_by_id.items():
        got = result_by_id[doc_id]["contact"].asDict()
        assert got == exp["contact"], f"contact mismatch for {doc_id}"


def test_summary_equality(result_by_id, golden_by_id):
    for doc_id, exp in golden_by_id.items():
        assert result_by_id[doc_id]["summary"] == exp["summary"], doc_id


def test_skills_equality(result_by_id, golden_by_id):
    for doc_id, exp in golden_by_id.items():
        assert list(result_by_id[doc_id]["skills"]) == exp["skills"], doc_id


def test_certifications_equality(result_by_id, golden_by_id):
    for doc_id, exp in golden_by_id.items():
        assert (
            list(result_by_id[doc_id]["certifications"])
            == exp["certifications"]
        ), doc_id


def test_education_experience_projects(spark, corpus_rows, result_by_id):
    """Entity-array golden equality, via the shared deterministic core."""
    from document_parser_private_spark import semantics as S
    from document_parser_private_spark.oracle import extract_doc, build_skill_index

    lo, v2c, idx = build_skill_index()
    for row in corpus_rows:
        doc_id = row["doc_id"]
        e = extract_doc(doc_id, row["spans"])
        got = result_by_id[doc_id]

        exp_edu = S.extract_education_entries(e.sections.get("education", ""))
        got_edu = [r.asDict() for r in got["education"]]
        assert len(got_edu) == len(exp_edu), doc_id
        for g, x in zip(got_edu, exp_edu):
            assert g["institution"] == x["institution"], doc_id
            assert g["degree"] == x["degree"], doc_id
            assert g["field_of_study"] == x["field_of_study"], doc_id
            assert g["start_date"] == x["start_date"], (doc_id, g, x)
            assert g["end_date"] == x["end_date"], doc_id
            assert g["gpa"] == pytest.approx(x["gpa"]) if x["gpa"] is not None else g["gpa"] is None
            assert g["description"] == x["description"], doc_id  # F26 rewrite
            assert list(g["achievements"]) == x["achievements"], doc_id

        exp_exp = S.extract_experience_entries(
            e.sections.get("experience", ""),
            skill_lower_index=lo, skill_var2canon=v2c, skill_index=idx,
        )
        got_exp = [r.asDict() for r in got["experience"]]
        assert len(got_exp) == len(exp_exp), doc_id
        for g, x in zip(got_exp, exp_exp):
            assert g["company"] == x["company"], doc_id
            assert g["position"] == x["position"], doc_id
            assert g["description"] == x["description"], doc_id  # F21 cleanup
            assert g["start_date"] == x["start_date"], doc_id
            assert g["end_date"] == x["end_date"], doc_id
            assert list(g["technologies"]) == x["technologies"], doc_id
            assert g["duration_months"] == x["duration_months"], doc_id

        exp_proj = S.extract_project_entries(
            e.sections.get("projects", ""),
            skill_lower_index=lo, skill_var2canon=v2c, skill_index=idx,
        )
        got_proj = [r.asDict() for r in got["projects"]]
        assert len(got_proj) == len(exp_proj), doc_id
        for g, x in zip(got_proj, exp_proj):
            assert g["name"] == x["name"], doc_id
            assert g["description"] == x["description"], doc_id
            assert list(g["technologies"]) == x["technologies"], doc_id
