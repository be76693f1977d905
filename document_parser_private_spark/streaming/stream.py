"""Structured Streaming variant of the extraction pipeline.

The reference is strictly batch (SURVEY §2.9) and the north_rule targets
batch Iceberg snapshots, but the extraction transforms are all narrow
per-document maps — so the identical operator chain runs unchanged as a
streaming query (`readStream` on a documents directory → transforms →
`writeStream`). This module exists to prove that property and to provide
the micro-batch ingestion path a continuously-fed 100 TB corpus would
use (file-source backpressure via maxFilesPerTrigger; exactly-once via
the streaming checkpoint + idempotent sink).

Also includes the canonical event-time windowed aggregation with
watermark (late-data handling) over an events stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import DOCS_DDL
from ..operators.classify import classify_spans
from ..operators.layout import reading_order_sort
from ..operators.sections import detect_sections_op


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream(documents dir) -> layout -> classify -> sections.

    No shuffle anywhere: every micro-batch is a pure narrow map, so the
    query needs no state store and sustains source-rate throughput.
    """
    reader = (
        spark.readStream.schema(DOCS_DDL).format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.load(input_dir)
    out = detect_sections_op(classify_spans(reading_order_sort(docs)))
    return out.select(
        "doc_id", "clean_spans", "blocks_kept", "blocks_dropped", "sections"
    )


def run_stream_to_parquet(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain the input directory once (availableNow) into parquet with a
    streaming checkpoint — kill/rerun resumes from the last committed
    micro-batch (file-source offsets in the checkpoint)."""
    out = stream_extract(spark, input_dir)
    flat = out.select(
        "doc_id", "blocks_kept", "blocks_dropped",
        F.to_json("clean_spans").alias("clean_spans_json"),
        F.to_json("sections").alias("sections_json"),
    )
    q = (
        flat.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_event_counts(events: DataFrame, watermark: str = "10 minutes",
                          window: str = "5 minutes") -> DataFrame:
    """Event-time tumbling-window counts with late-data watermark —
    works on both a static and a streaming `events` DataFrame."""
    ts = F.col("ts").cast("timestamp")
    return (
        events.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "avg_value",
        )
    )
