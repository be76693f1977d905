"""JSONL document source (S4-family source format).

Reads newline-delimited JSON documents carrying the interleaved span
schema of BASELINE.json's input_hint —
``{"doc_id": ..., "spans": [{"kind","text","media_ref","offset"}, ...]}``
— with an ENFORCED schema (no sampling-based inference: at 100 TB,
schema inference reads the data twice and drifts with the sample) and
PERMISSIVE corrupt-record capture so one malformed line quarantines
instead of failing the ingest.

Round trip: ``write_docs_jsonl`` exports any span-table DataFrame to
JSONL; ``read_docs_jsonl`` loads it back bit-identically (pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import DOCS_DDL

CORRUPT_COL = "_corrupt_record"
JSONL_DDL = DOCS_DDL + f", {CORRUPT_COL} string"


def read_docs_jsonl(
    spark: SparkSession, path: str, keep_corrupt: bool = False
) -> DataFrame:
    """documents table from JSONL. keep_corrupt=True retains the
    quarantine column (rows whose line failed to parse have every data
    column NULL and the raw line in _corrupt_record)."""
    df = (
        spark.read.schema(JSONL_DDL)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_docs_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
