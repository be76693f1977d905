"""Property parity for the ws_trim family: every native Column expression
built on the Python-whitespace class (semantics.PY_WS_JRE) must agree with
its authoritative Python twin on arbitrary Unicode — including \x1c-\x1f,
\x85, \xa0 and the U+2000.. spaces that Java \\s does not cover (the
divergence that made round 1's classify property test red)."""

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from document_parser_private_spark import semantics as S
from document_parser_private_spark.functions.text import (
    split_entries_col,
    split_skills_col,
    summary_col,
    ws_trim,
)

# Bias toward the adversarial region: exotic whitespace, Unicode digits,
# combining marks, plus plain text — st.text already spans full Unicode.
EXOTIC_WS = "\x1c\x1d\x1e\x1f\x85\xa0     　"
TRICKY = st.one_of(
    st.text(max_size=60),
    st.text(alphabet=EXOTIC_WS + " \t\nabcX.Z,;/•0123456789٣²", max_size=30),
    st.sampled_from([
        "\x1f", "a\x1cb", "\xa0word\xa0", "x y", "٣٣", "²",
        "  dot. " + "w" * 600, "Languages: C++, Go\nTools: k8s; git",
        "First Entry\nSECOND Entry\nthird",
    ]),
)


def _batch(spark, texts, col_fn):
    df = spark.createDataFrame([(t,) for t in texts], "v string")
    return [r["out"] for r in df.select(col_fn(F.col("v")).alias("out")).collect()]


@settings(max_examples=25, deadline=None)
@given(st.lists(TRICKY, min_size=1, max_size=8))
def _prop_ws_trim(spark, texts):
    got = _batch(spark, texts, ws_trim)
    assert got == [t.strip() for t in texts], texts


@settings(max_examples=25, deadline=None)
@given(st.lists(TRICKY, min_size=1, max_size=8))
def _prop_summary(spark, texts):
    got = _batch(spark, texts, summary_col)
    assert got == [S.extract_summary(t) for t in texts], texts


def _py_split_entries(text):
    return [e.strip() for e in re.split(S.ENTRY_SPLIT_RE, text) if e.strip()]


@settings(max_examples=25, deadline=None)
@given(st.lists(TRICKY, min_size=1, max_size=8))
def _prop_split_entries(spark, texts):
    got = _batch(spark, texts, split_entries_col)
    assert got == [_py_split_entries(t) for t in texts], texts


def _py_split_skills(text):
    out = []
    for p in re.split(S.SKILL_SPLIT_RE, text):
        p = p.strip()
        if len(p) > 1 and not re.fullmatch(r"\d+", p, re.ASCII):
            out.append(p)
    return out


@settings(max_examples=25, deadline=None)
@given(st.lists(TRICKY, min_size=1, max_size=8))
def _prop_split_skills(spark, texts):
    got = _batch(spark, texts, split_skills_col)
    assert got == [_py_split_skills(t) for t in texts], texts


def test_ws_trim_matches_python_strip(spark):
    _prop_ws_trim(spark)


def test_summary_matches_python(spark):
    _prop_summary(spark)


def test_split_entries_matches_python(spark):
    _prop_split_entries(spark)


def test_split_skills_matches_python(spark):
    _prop_split_skills(spark)
