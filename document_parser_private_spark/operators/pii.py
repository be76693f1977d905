"""PII anonymization over free text (SURVEY §2.10 U6, reference
parsing_engine/pii_handler.py:29-101 semantics, regex recognizers only).

Two forms:
  anonymize_op    — full multi-entity pass (hash / mask / token
                    strategies, left-to-right, overlap-safe) as a
                    vectorized pandas UDF on semantics.anonymize_text
  mask_emails_col — the mask-emails-in-text strategy as ONE native
                    regexp_replace with a backreference (SQL-portable)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import semantics as S


def _make_udf(strategy: str, salt: str):
    @pandas_udf(T.StringType())
    def _udf(text: pd.Series) -> pd.Series:
        return text.apply(
            lambda t: S.anonymize_text(t or "", strategy=strategy, salt=salt)
        )
    return _udf


def anonymize_op(df: DataFrame, text_col: str = "text",
                 strategy: str = "hash",
                 salt: str = S.DEFAULT_SALT,
                 out_col: str = "anonymized") -> DataFrame:
    return df.withColumn(out_col, _make_udf(strategy, salt)(F.col(text_col)))


EMAIL_IN_TEXT_JRE = r"([A-Za-z0-9._%+-])[A-Za-z0-9._%+-]*(@[A-Za-z0-9.-]+\.[A-Za-z]{2,})"


def mask_emails_col(text: Column) -> Column:
    """Mask every email in text to first-char***@domain — single native
    regexp_replace with backreferences (pii_handler.py:52-60 mask
    semantics for the common localpart>=1 case)."""
    return F.regexp_replace(text, EMAIL_IN_TEXT_JRE, r"$1***$2")
