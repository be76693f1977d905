"""JSONL source: enforced-schema round trip + corrupt-line quarantine,
and streaming dedup with bounded state."""

import json
import os

from document_parser_private_spark.sources.jsonl_docs import (
    read_docs_jsonl,
    write_docs_jsonl,
)


def _sorted_rows(df):
    return sorted(
        (r["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["offset"])
                       for s in r["spans"]], r["byte_size"])
        for r in df.collect()
    )


def test_jsonl_round_trip(spark, corpus_df, tmp_path):
    path = str(tmp_path / "docs_jsonl")
    write_docs_jsonl(corpus_df, path)
    back = read_docs_jsonl(spark, path)
    assert _sorted_rows(back) == _sorted_rows(corpus_df)


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    path = str(tmp_path / "mixed")
    os.makedirs(path)
    good = {"doc_id": "d1", "spans": [
        {"kind": "text", "text": "hello", "media_ref": None, "offset": 0}
    ], "byte_size": 5, "doc_type": "txt", "part": 0}
    with open(f"{path}/part-0.json", "w") as f:
        f.write(json.dumps(good) + "\n")
        f.write('{"doc_id": "broken", "spans": [oops\n')  # malformed line
    clean = read_docs_jsonl(spark, path)
    assert [r["doc_id"] for r in clean.collect()] == ["d1"]
    quarantined = read_docs_jsonl(spark, path, keep_corrupt=True)
    bad = [r for r in quarantined.collect() if r["_corrupt_record"]]
    assert len(bad) == 1 and "oops" in bad[0]["_corrupt_record"]


def test_stream_dedup_bounded_state(spark, corpus_df, tmp_path):
    """Duplicate docs within the watermark horizon are suppressed; the
    drained output carries one row per distinct fingerprint."""
    from document_parser_private_spark.streaming.stream import (
        run_stream_dedup_to_parquet,
    )
    from document_parser_private_spark.operators.textstats import (
        fingerprint_col,
    )
    from pyspark.sql import functions as F

    inp = str(tmp_path / "in")
    sample = corpus_df.limit(40)
    dup = sample.union(
        sample.withColumn("doc_id", F.concat(F.col("doc_id"), F.lit("_copy")))
    )
    dup.write.parquet(inp)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_stream_dedup_to_parquet(spark, inp, out, ckpt)

    got = spark.read.parquet(out)
    n_distinct_fp = dup.select(
        fingerprint_col(F.concat_ws("\n", F.transform(
            "spans", lambda s: F.coalesce(s["text"], F.lit(""))
        ))).alias("fp")
    ).distinct().count()
    assert got.count() == n_distinct_fp
    assert got.select("fingerprint").distinct().count() == n_distinct_fp
