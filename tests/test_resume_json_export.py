"""S6 JSON-sink parity: the exported resume_json must parse to exactly
the dict the pure-Python oracle would export (reference main.py:184-186
json.dump of Resume.model_dump(); shape of
sample_expected_output_for_AM CV.json — contact, summary, skills,
education[+achievements, no gpa], experience[technologies], projects,
certifications; dates ISO, nulls explicit)."""

import json

import pytest

from document_parser_private_spark import semantics as S
from document_parser_private_spark.oracle import (
    build_skill_index,
    extract_doc,
)
from document_parser_private_spark.plans.pipeline import (
    export_resume_json,
    extract_pipeline,
)


def _iso(d):
    return d.isoformat() if d is not None else None


def _expected_resume(doc_id, spans):
    lo, v2c, idx = build_skill_index()
    e = extract_doc(doc_id, spans)
    sec = e.sections
    edu = []
    for x in S.extract_education_entries(sec.get("education", "")):
        edu.append({
            "institution": x["institution"],
            "degree": x["degree"],
            "field_of_study": x["field_of_study"],
            "start_date": _iso(x["start_date"]),
            "end_date": _iso(x["end_date"]),
            "description": x["description"],
            "achievements": x["achievements"],
        })
    exp = []
    for x in S.extract_experience_entries(
        sec.get("experience", ""),
        skill_lower_index=lo, skill_var2canon=v2c, skill_index=idx,
    ):
        exp.append({
            "company": x["company"],
            "position": x["position"],
            "start_date": x["start_date"],
            "end_date": x["end_date"],
            "description": x["description"],
            "technologies": x["technologies"],
        })
    proj = S.extract_project_entries(
        sec.get("projects", ""),
        skill_lower_index=lo, skill_var2canon=v2c, skill_index=idx,
    )
    return {
        "contact": S.extract_contact(sec.get("contact", "")),
        "summary": S.extract_summary(sec.get("summary", "")),
        "skills": S.extract_skills(
            sec.get("skills", ""), lo, v2c, idx),
        "education": edu,
        "experience": exp,
        "projects": proj,
        "certifications": S.split_entries(sec.get("certifications", "")),
    }


@pytest.fixture(scope="module")
def exported(spark, corpus_df):
    out = export_resume_json(extract_pipeline(corpus_df, num_partitions=4))
    return {r["doc_id"]: r["resume_json"] for r in out.collect()}


def test_resume_json_shape_and_values(corpus_rows, exported):
    for row in corpus_rows:
        doc_id = row["doc_id"]
        got = json.loads(exported[doc_id])
        want = _expected_resume(doc_id, row["spans"])
        assert got == want, doc_id
