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
    from document_parser_private_spark.operators.layout import layout_order_op
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
        layout_order_op(classify_spans(spark.read.parquet(in_dir),
                                       renumber=False))
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


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState gap sessionization: a >30min gap closes a
    session and emits it; the still-open trailing session stays in state
    (not emitted in a single availableNow drain)."""
    import datetime as dt
    from document_parser_private_spark.streaming.stream import sessionize_stream

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two events, 40min gap, then two more -> first session closes
        (1, t0), (1, t0 + dt.timedelta(minutes=10)),
        (1, t0 + dt.timedelta(minutes=50)), (1, t0 + dt.timedelta(minutes=60)),
        # user 2: single event -> stays open, nothing emitted
        (2, t0),
    ]
    in_dir = str(tmp_path / "events_in")
    spark.createDataFrame(rows, "user_id long, ts timestamp") \
        .coalesce(1).write.parquet(in_dir)

    stream = spark.readStream.schema("user_id long, ts timestamp") \
        .format("parquet").load(in_dir)
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()

    got = [r.asDict() for r in spark.sql(
        "select * from sessions order by user_id, session_start").collect()]
    assert len(got) == 1
    s = got[0]
    assert s["user_id"] == 1
    assert s["session_start"] == t0
    assert s["session_end"] == t0 + dt.timedelta(minutes=10)
    assert s["n_events"] == 2
    assert s["closed"] is True


def test_stream_dedup_matches_batch_survivors(spark, tmp_path):
    """Semantic-drift guard between the streaming dedup
    (dropDuplicatesWithinWatermark over the span-text fingerprint) and
    the batch exact_dedup: replaying the same corpus (with planted
    duplicates) through both must yield the same survivor fingerprint
    set at the watermark horizon — one survivor per fingerprint."""
    from pyspark.sql import functions as F
    from document_parser_private_spark.operators.dedup import exact_dedup
    from document_parser_private_spark.streaming.stream import (
        run_stream_dedup_to_parquet,
    )

    in_dir = str(tmp_path / "in")
    write_corpus_parquet(in_dir, n=40, seed=5, shards=4)
    docs = spark.read.parquet(in_dir)
    # plant exact duplicates under fresh ids (same span text)
    both_dir = str(tmp_path / "both")
    docs.unionByName(
        docs.withColumn("doc_id", F.concat("doc_id", F.lit("_dup")))
    ).write.parquet(both_dir)

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_stream_dedup_to_parquet(spark, both_dir, out_dir, ckpt)
    streamed = spark.read.parquet(out_dir).collect()
    streamed_fps = [r["fingerprint"] for r in streamed]

    text = F.concat_ws(
        "\n", F.transform("spans", lambda s: F.coalesce(s["text"], F.lit("")))
    )
    batch = exact_dedup(
        spark.read.parquet(both_dir).withColumn("text", text),
        text_col="text",
    ).collect()

    # same survivor fingerprints, exactly one stream survivor per fp
    assert sorted(streamed_fps) == sorted(r["fingerprint"] for r in batch)
    assert len(streamed_fps) == len(set(streamed_fps))
    # every planted duplicate collapsed: batch saw 2x copies per fp
    assert all(r["dup_count"] >= 2 for r in batch)
