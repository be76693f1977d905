"""Adapter: flat text documents -> interleaved span table (input_hint shape).

The Spark analogue of the reference's plain-text source
(parsing_engine/text_parser.py:17-76): each line becomes a span; heading
lines (the ALL-CAPS heading alternation, text_parser.py:47-54) get
kind='heading', everything else kind='text'. Fully native (split +
transform with index) — the 100 TB ingest path for raw-text corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex flavor of the reference's heading alternation
# (text_parser.py:47-54); anchored full-line match.
HEADING_LINE_JRE = (
    r"(?i)^\s*(CONTACT(\s*INFO)?|(PROFESSIONAL\s+)?SUMMARY|PROFILE|OBJECTIVE|"
    r"(WORK|PROFESSIONAL|EMPLOYMENT)\s+EXPERIENCE|EXPERIENCE|"
    r"CAREER\s+(HISTORY|PATH)|(ACADEMIC\s+)?EDUCATION|QUALIFICATIONS|DEGREES|"
    r"TRAINING|CERTIFICATIONS?|(TECHNICAL\s+)?SKILLS|COMPETENCIES|EXPERTISE|"
    r"(KEY\s+)?PROJECTS|PORTFOLIO|PERSONAL\s+DETAILS|ABOUT\s+ME"
    r")\s*:?\s*$"
)


def text_to_spans_col(text: Column) -> Column:
    lines = F.split(text, "\n")
    return F.transform(
        lines,
        lambda line, i: F.struct(
            F.when(line.rlike(HEADING_LINE_JRE), F.lit("heading"))
            .otherwise(F.lit("text"))
            .alias("kind"),
            line.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )


def text_docs_to_span_table(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        text_to_spans_col(F.col(text_col)).alias("spans"),
    )
