"""Per-section resume entity extraction (deterministic regex path).

Mix of native expressions and vectorized pandas UDFs:
  contact / summary / certifications — pure Catalyst expressions
  skills / education / experience / projects — pandas UDFs over section
    text (fuzzy ontology normalization + sequential entry parsing), Arrow
    batched; the small ontology dims ride inside the UDF closure (at
    cluster scale they'd be sc.broadcast — same data path, the closure is
    pickled once per executor).

Zero shuffles: every extraction is doc-local. The alternative
explode->broadcast-join->groupBy formulation of skill normalization exists
in operators/normalize.py for relational use; this operator keeps the hot
path narrow (SURVEY §2.10 U3 short-circuit lives inside the UDF: exact
dict hit first, fuzzy only on miss).

Reference behavior: entity_extractor.py:49-286 minus NER (SURVEY §7.3
determinism), certifications from the certifications section (CLI path,
main.py:121).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import semantics as S
from ..corpus import SKILLS_ONTOLOGY
from ..functions.contact import contact_struct
from ..functions.text import summary_col, split_entries_col
from ..oracle import build_skill_index

_LOWER, _V2C, _INDEX = build_skill_index(SKILLS_ONTOLOGY)
# phrase-level fuzzy memo, shared across Arrow batches within the Python
# worker (bounded; see semantics.normalize_skill)
_MEMO: dict = {}

EDUCATION_TYPE = T.ArrayType(T.StructType([
    T.StructField("institution", T.StringType()),
    T.StructField("degree", T.StringType()),
    T.StructField("field_of_study", T.StringType()),
    T.StructField("start_date", T.DateType()),
    T.StructField("end_date", T.DateType()),
    T.StructField("description", T.StringType()),
    T.StructField("gpa", T.DoubleType()),
    T.StructField("achievements", T.ArrayType(T.StringType())),
]))
EXPERIENCE_TYPE = T.ArrayType(T.StructType([
    T.StructField("company", T.StringType()),
    T.StructField("position", T.StringType()),
    T.StructField("start_date", T.StringType()),
    T.StructField("end_date", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("technologies", T.ArrayType(T.StringType())),
    T.StructField("duration_months", T.IntegerType()),
]))
PROJECTS_TYPE = T.ArrayType(T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("technologies", T.ArrayType(T.StringType())),
]))


@pandas_udf(T.ArrayType(T.StringType()))
def _skills_udf(text: pd.Series) -> pd.Series:
    return text.apply(
        lambda t: S.extract_skills(t or "", _LOWER, _V2C, _INDEX, memo=_MEMO)
    )


@pandas_udf(EDUCATION_TYPE)
def _education_udf(text: pd.Series) -> pd.Series:
    return text.apply(lambda t: S.extract_education_entries(t or ""))


@pandas_udf(EXPERIENCE_TYPE)
def _experience_udf(text: pd.Series) -> pd.Series:
    return text.apply(
        lambda t: S.extract_experience_entries(
            t or "",
            skill_lower_index=_LOWER,
            skill_var2canon=_V2C,
            skill_index=_INDEX,
            memo=_MEMO,
        )
    )


@pandas_udf(PROJECTS_TYPE)
def _projects_udf(text: pd.Series) -> pd.Series:
    return text.apply(
        lambda t: S.extract_project_entries(
            t or "",
            skill_lower_index=_LOWER,
            skill_var2canon=_V2C,
            skill_index=_INDEX,
            memo=_MEMO,
        )
    )


from .layout import SPAN_TYPE, order_spans_py
from .sections import SECTIONS_FIELDS, SECTIONS_TYPE, sections_of_span_list

EXTRACT_ALL_TYPE = T.StructType([
    T.StructField("clean_spans", SPAN_TYPE),
    T.StructField("sections", SECTIONS_TYPE),
    T.StructField("skills", T.ArrayType(T.StringType())),
    T.StructField("education", EDUCATION_TYPE),
    T.StructField("experience", EXPERIENCE_TYPE),
    T.StructField("projects", PROJECTS_TYPE),
])


@pandas_udf(EXTRACT_ALL_TYPE)
def _extract_all_udf(spans: pd.Series) -> pd.DataFrame:
    """Fused layout inference + section FSM + entity extraction: the
    plan's ONLY Python node, ONE Arrow crossing.

    Input is the natively-filtered spans (original geometric offsets);
    this pass (1) infers reading order (line clustering / column
    detection, semantics.layout_reading_order) and renumbers offsets,
    (2) runs the section FSM, (3) extracts entities — all on Python-local
    data. The staged path (layout_order_op -> detect_sections_op ->
    extract_resume_op) ships spans across Arrow three times; fusing ships
    them once. Same semantics (golden-parity pytest-enforced); the staged
    ops remain exported for composability.
    """
    rows = []
    for arr in spans:
        ordered = order_spans_py(arr)
        secs = sections_of_span_list(ordered)
        rows.append({
            "clean_spans": ordered,
            "sections": secs,
            "skills": S.extract_skills(
                secs.get("skills") or "", _LOWER, _V2C, _INDEX, memo=_MEMO),
            "education": S.extract_education_entries(
                secs.get("education") or ""),
            "experience": S.extract_experience_entries(
                secs.get("experience") or "",
                skill_lower_index=_LOWER, skill_var2canon=_V2C,
                skill_index=_INDEX, memo=_MEMO),
            "projects": S.extract_project_entries(
                secs.get("projects") or "",
                skill_lower_index=_LOWER, skill_var2canon=_V2C,
                skill_index=_INDEX, memo=_MEMO),
        })
    return pd.DataFrame(rows, columns=[f.name for f in EXTRACT_ALL_TYPE])


def extract_all_op(df: DataFrame, spans_col: str = "clean_spans") -> DataFrame:
    """Fused layout+sections+entities from natively-filtered spans;
    native contact/summary/certifications over the returned sections
    struct (prunable fields).

    Requires the spans column to be optimizer-barriered
    (classify_spans(..., barrier=True)) when it is built from
    higher-order-function expressions: Spark cannot extract a Python UDF
    whose inlined argument carries lambda functions, and CollapseProject
    inlines single-reference producers ("Cannot generate code for
    expression: ..._udf(transform(filter(...)))")."""
    ext = _extract_all_udf(F.col(spans_col))
    df = df.withColumn("_ext", ext)
    sec = F.col("_ext")["sections"]
    return (
        df.withColumn("clean_spans", F.col("_ext")["clean_spans"])
        .withColumn("sections", sec)
        .withColumn("contact", contact_struct(sec["contact"]))
        .withColumn("summary", summary_col(F.coalesce(sec["summary"], F.lit(""))))
        .withColumn("skills", F.col("_ext")["skills"])
        .withColumn("education", F.col("_ext")["education"])
        .withColumn("experience", F.col("_ext")["experience"])
        .withColumn("projects", F.col("_ext")["projects"])
        .withColumn(
            "certifications",
            split_entries_col(F.coalesce(sec["certifications"], F.lit(""))),
        )
        .drop("_ext")
    )


def extract_all_fused_op(df: DataFrame, spans_col: str = "spans",
                         id_col: str = "doc_id") -> DataFrame:
    """Whole-pipeline fused Python pass: classify + layout + section FSM
    + entity extraction in ONE mapInArrow crossing, RAW spans in, final
    extraction columns out (then the same native contact/summary/
    certifications projections as extract_all_op).

    Why this exists next to extract_all_op (native classify + pandas
    UDF): measured at 200k docs / 32 cores, the native classify HOF tree
    (interpreted transform/filter per span) plus the pandas_udf
    nested-struct serialization cost ~15-16 s wall while the pure-Python
    shared-semantics path runs ~3,000 docs/s/core warm — the plan was
    paying more to AVOID Python than the Python costs. mapInArrow hands
    whole Arrow batches to the same semantics the oracle runs
    (guide: do the heavy lifting in native/batch code inside the UDF),
    so golden parity holds by construction; the memoized fuzzy index
    (_MEMO) is module-level and survives across batches and tasks in a
    reused worker. Output carries only id + extraction columns — select
    upstream columns you need before calling, or use the staged ops.
    """
    id_field = df.schema[id_col]
    out_type = T.StructType([
        T.StructField(id_col, id_field.dataType, id_field.nullable),
        T.StructField("clean_spans", SPAN_TYPE),
        T.StructField("blocks_kept", T.IntegerType()),
        T.StructField("blocks_dropped", T.IntegerType()),
        T.StructField("sections", SECTIONS_TYPE),
        T.StructField("skills", T.ArrayType(T.StringType())),
        T.StructField("education", EDUCATION_TYPE),
        T.StructField("experience", EXPERIENCE_TYPE),
        T.StructField("projects", PROJECTS_TYPE),
    ])
    from pyspark.sql.pandas.types import to_arrow_schema
    pa_schema = to_arrow_schema(out_type)

    def fused(batches):
        import pyarrow as pa

        from ..oracle import classify_and_emit

        # bounded section-level memos (same lifetime/justification as
        # _MEMO): education/projects section TEXTS repeat heavily on
        # template-shaped corpora (measured 41%/50% distinct across 4k
        # docs) and the extractors are pure functions of the text, so a
        # content-keyed dict skips the whole parse on a repeat; on
        # corpora with no repeats the cost is one dict miss per doc.
        edu_memo: dict = {}
        proj_memo: dict = {}

        def memoed(memo, key, fn):
            hit = memo.get(key)
            if hit is None and key not in memo:
                hit = fn(key)
                if len(memo) > 50_000:
                    memo.clear()
                memo[key] = hit
            return hit

        for b in batches:
            ids = b.column(id_col).to_pylist()
            # span decode via FLAT child arrays: one to_pylist per
            # primitive child + one C-speed zip, then per-doc slices of
            # the flat dict list — measured 226 -> 80 us/doc vs
            # ListArray.to_pylist's nested dict materialization (~12%
            # of the whole warm per-doc budget). Null spans rows keep
            # the None contract via the validity bitmap.
            sc = b.column(spans_col)
            sv = sc.values
            flat = [
                {"kind": k, "text": tx, "media_ref": m, "offset": o}
                for k, tx, m, o in zip(
                    sv.field("kind").to_pylist(),
                    sv.field("text").to_pylist(),
                    sv.field("media_ref").to_pylist(),
                    sv.field("offset").to_pylist(),
                )
            ]
            offs = sc.offsets.to_pylist()
            if sc.null_count:
                valid = [v.is_valid for v in sc]
                spans_in = [
                    flat[offs[i]:offs[i + 1]] if valid[i] else None
                    for i in range(len(sc))
                ]
            else:
                spans_in = [flat[offs[i]:offs[i + 1]]
                            for i in range(len(sc))]
            cols: dict[str, list] = {f.name: [] for f in out_type.fields}
            for did, arr in zip(ids, spans_in):
                if arr is None:
                    # contract pinned by the staged path: null spans ->
                    # empty clean_spans, NULL metrics, empty sections
                    clean, kept, dropped = [], None, None
                else:
                    clean, kept, dropped = classify_and_emit(arr)
                secs = sections_of_span_list(clean)
                cols[id_col].append(did)
                cols["clean_spans"].append(clean)
                cols["blocks_kept"].append(kept)
                cols["blocks_dropped"].append(dropped)
                cols["sections"].append(secs)
                cols["skills"].append(S.extract_skills(
                    secs.get("skills") or "", _LOWER, _V2C, _INDEX,
                    memo=_MEMO))
                cols["education"].append(memoed(
                    edu_memo, secs.get("education") or "",
                    S.extract_education_entries))
                cols["experience"].append(S.extract_experience_entries(
                    secs.get("experience") or "",
                    skill_lower_index=_LOWER, skill_var2canon=_V2C,
                    skill_index=_INDEX, memo=_MEMO))
                cols["projects"].append(memoed(
                    proj_memo, secs.get("projects") or "",
                    lambda t: S.extract_project_entries(
                        t, skill_lower_index=_LOWER, skill_var2canon=_V2C,
                        skill_index=_INDEX, memo=_MEMO)))
            yield pa.record_batch(
                [pa.array(cols[f.name], type=f.type) for f in pa_schema],
                schema=pa_schema,
            )

    out = df.select(id_col, spans_col).mapInArrow(fused, out_type)
    sec = F.col("sections")
    return (
        out.withColumn("contact", contact_struct(sec["contact"]))
        .withColumn("summary",
                    summary_col(F.coalesce(sec["summary"], F.lit(""))))
        .withColumn(
            "certifications",
            split_entries_col(F.coalesce(sec["certifications"], F.lit(""))),
        )
    )


def extract_resume_op(df: DataFrame, sections_col: str = "sections") -> DataFrame:
    sec = F.col(sections_col)
    return (
        df.withColumn("contact", contact_struct(sec["contact"]))
        .withColumn("summary", summary_col(F.coalesce(sec["summary"], F.lit(""))))
        .withColumn("skills", _skills_udf(sec["skills"]))
        .withColumn("education", _education_udf(sec["education"]))
        .withColumn("experience", _experience_udf(sec["experience"]))
        .withColumn("projects", _projects_udf(sec["projects"]))
        .withColumn(
            "certifications",
            split_entries_col(F.coalesce(sec["certifications"], F.lit(""))),
        )
    )
