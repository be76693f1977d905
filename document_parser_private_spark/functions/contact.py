"""Contact-field regex extraction as native Spark expressions.

Reference behavior: parsing_engine/entity_extractor.py:49-84 (regex path;
NER-location intentionally excluded — nondeterministic, SURVEY §7.3).
Patterns are shared with ``semantics`` (Python flavor) and kept
Java-compatible; `regexp_extract` returns '' on miss, mapped to NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..semantics import PY_WS_JRE

# Java-regex flavor of semantics.{EMAIL_RE, PHONE_RE, ...}
EMAIL_JRE = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b"
PHONE_JRE = r"(\b\d{3}[-.\s]?\d{3}[-.\s]?\d{4}\b|\+\d{1,3}[-.\s]?\d{3,}[-.\s]?\d{4,})"
LINKEDIN_JRE = r"(https?://)?(www\.)?linkedin\.com/(in|pub)/[a-zA-Z0-9-]+"
GITHUB_JRE = r"(https?://)?(www\.)?github\.com/[a-zA-Z0-9-]+/?"
NAME_JRE = r"^([A-Z][a-zA-Z\s]+)\n"


def _nullable_extract(col: Column, pattern: str, group: int = 0) -> Column:
    return F.nullif(F.regexp_extract(col, pattern, group), F.lit(""))


def email_col(text: Column) -> Column:
    return _nullable_extract(text, EMAIL_JRE)


def phone_col(text: Column) -> Column:
    return _nullable_extract(text, PHONE_JRE)


def linkedin_col(text: Column) -> Column:
    return _nullable_extract(text, LINKEDIN_JRE)


def github_col(text: Column) -> Column:
    return _nullable_extract(text, GITHUB_JRE)


def name_col(text: Column) -> Column:
    """First-line name (entity_extractor.py:53-56): leading capitalized
    letters/whitespace run terminated by a newline. Python-strip
    equivalence needs the regex trim (Spark trim = spaces only)."""
    name = F.regexp_replace(
        F.regexp_extract(text, NAME_JRE, 1), f"^{PY_WS_JRE}+|{PY_WS_JRE}+$", ""
    )
    return F.nullif(name, F.lit(""))


def contact_struct(text: Column) -> Column:
    return F.struct(
        name_col(text).alias("name"),
        email_col(text).alias("email"),
        phone_col(text).alias("phone"),
        linkedin_col(text).alias("linkedin"),
        github_col(text).alias("github"),
    )
