"""Streaming variant: availableNow drain produces the same extraction
results as the batch pipeline; windowed watermark aggregation works on
the events table."""

from document_parser_private_spark.corpus import write_corpus_parquet
from document_parser_private_spark.streaming.stream import (
    run_stream_to_parquet,
    windowed_event_counts,
)


def test_stream_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F
    from document_parser_private_spark.operators.classify import classify_spans
    from document_parser_private_spark.operators.layout import reading_order_sort
    from document_parser_private_spark.operators.sections import detect_sections_op

    in_dir = str(tmp_path / "in")
    write_corpus_parquet(in_dir, n=60, seed=9, shards=4)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    run_stream_to_parquet(spark, in_dir, out_dir, ckpt)
    streamed = {
        r["doc_id"]: (r["blocks_kept"], r["clean_spans_json"])
        for r in spark.read.parquet(out_dir).collect()
    }

    batch_df = detect_sections_op(
        classify_spans(reading_order_sort(spark.read.parquet(in_dir)))
    ).select(
        "doc_id", "blocks_kept",
        F.to_json("clean_spans").alias("clean_spans_json"),
    )
    batch = {
        r["doc_id"]: (r["blocks_kept"], r["clean_spans_json"])
        for r in batch_df.collect()
    }
    assert streamed == batch
    assert len(streamed) == 60


def test_windowed_event_counts(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(events).collect()
    assert len(out) > 0
    total = sum(r["n"] for r in out)
    assert total == events.count()
