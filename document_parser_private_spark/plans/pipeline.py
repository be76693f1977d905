"""End-to-end extraction pipeline (BASELINE.json north_star).

    documents(doc_id, spans, [byte_size, part])
      -> salted repartition by doc byte-size bucket   (skew)
      -> reading-order sort                            (native, narrow)
      -> classify content/boilerplate/media-anchor     (native, narrow)
      -> section FSM                                   (pandas UDF, narrow)
      -> per-section entity extraction                 (native + UDF, narrow)

After the single up-front repartition the whole pipeline is narrow — no
further shuffle at any scale; throughput scales linearly with executors
(the ≥0.8 N->4N efficiency target). Skew from giant PDFs is handled by
routing heavy docs (byte_size above threshold) across dedicated hash
buckets so no single task owns several giants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.classify import classify_spans
from ..operators.layout import layout_order_op
from ..operators.resume import extract_all_op
from ..operators.sections import detect_sections_op

HEAVY_BYTES = 8 * 1024  # ~3x the mean doc: above this, the giant-doc salt
HEAVY_BUCKETS = 16

FINAL_COLUMNS = (
    "doc_id", "clean_spans", "blocks_kept", "blocks_dropped", "sections",
    "contact", "summary", "skills", "education", "experience", "projects",
    "certifications",
)


def repartition_salted(
    df: DataFrame,
    num_partitions: int | None = None,
    heavy_bytes: int = HEAVY_BYTES,
    heavy_buckets: int | None = None,
) -> DataFrame:
    """Salted repartition on doc byte-size buckets (north_star skew rule).

    Light docs hash uniformly over all partitions; heavy docs get an
    independent salt spread over ALL partitions (heavy_buckets defaults to
    num_partitions — capping it below the core count turns the giant-doc
    tail into a straggler ceiling and destroys N->4N scaling). byte_size
    is computed when absent (cheap native proxy: sum of span text lengths).
    """
    if "byte_size" not in df.columns:
        df = df.withColumn(
            "byte_size",
            F.aggregate(
                "spans",
                F.lit(0).cast("long"),
                lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
            ),
        )
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # 4x finer than the partition count: repartition() HASHES the salt
    # value to place rows, so coarse salts (one per partition) suffer
    # balls-into-bins collisions that leave partitions empty of giants;
    # finer salt smooths the composed doc->partition map
    hb = heavy_buckets or n * 4
    salt = F.when(
        F.col("byte_size") > heavy_bytes,
        F.concat(F.lit("H"), F.pmod(F.xxhash64("doc_id"), F.lit(hb))),
    ).otherwise(
        F.concat(F.lit("L"), F.pmod(F.xxhash64("doc_id"), F.lit(n * 4)))
    )
    return df.repartition(n, salt)


def extract_pipeline(
    df: DataFrame,
    num_partitions: int | None = None,
    with_resume: bool = True,
    repartition: bool = True,
) -> DataFrame:
    """Full pipeline; returns one row per doc with clean spans, sections,
    extraction metrics columns, and (optionally) resume entities.

    repartition=False skips the salted exchange for inputs whose STORAGE
    is already salt-bucketed (the 100 TB deployment writes the documents
    table bucketed by byte-size salt, e.g. Iceberg `bucket(N, salt)`
    partitioning — so steady-state runs are exchange-free and the whole
    pipeline is one narrow stage). Keep the default for ad-hoc inputs.
    """
    out = repartition_salted(df, num_partitions) if repartition else df
    # classify is per-span and order-free, so it runs FIRST, natively
    # (whole-stage codegen), keeping original geometric offsets; layout
    # inference happens inside the single Python pass that needs Python
    # anyway (fused UDF below / layout_order_op on the sections-only path)
    out = classify_spans(out, renumber=False)
    if with_resume:
        # fused layout+FSM+entities: one Arrow crossing, one worker/task
        out = extract_all_op(out)
        return out.select(*FINAL_COLUMNS)
    out = layout_order_op(out)
    out = detect_sections_op(out)
    return out.select(
        "doc_id", "clean_spans", "blocks_kept", "blocks_dropped", "sections"
    )


def extraction_metrics(result: DataFrame, part_col: str | None = None) -> DataFrame:
    """A6 metrics side table: per-partition doc/block counters
    (north_rule's extraction-metric side table)."""
    keys = [part_col] if part_col and part_col in result.columns else []
    agg = result.groupBy(*keys).agg(
        F.count("*").alias("doc_count"),
        F.sum("blocks_kept").alias("blocks_kept"),
        F.sum("blocks_dropped").alias("blocks_dropped"),
        F.sum(F.when(F.col("blocks_kept") == 0, 1).otherwise(0)).alias(
            "empty_docs"
        ),
    )
    return agg
