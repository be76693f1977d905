"""spark-submit entry point (north_rule: "run via spark-submit
--py-files on a multi-executor cluster").

Usage:
    zip -qr /tmp/dpps.zip document_parser_private_spark
    spark-submit --py-files /tmp/dpps.zip tools/submit_job.py \
        <input_parquet> <output_dir> [--resume]

Reads a documents table (doc_id, spans[, byte_size, part]), runs the
extraction pipeline, writes either a plain parquet of the final columns
or (with --resume and a `part` column present) the checkpointed
per-partition layout with lineage + metrics side tables.

The script only imports from the shipped package, so the same file works
with any cluster master; locally it falls back to local[*] via
SparkSession defaults. Exercised end-to-end (real `spark-submit
--py-files` subprocess) by tests/test_spark_submit.py.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    inp, out_dir = args

    spark = SparkSession.builder.appName("dpps-extract").getOrCreate()
    df = spark.read.parquet(inp)

    if "--resume" in flags and "part" in df.columns:
        from document_parser_private_spark.plans.checkpoint import (
            run_with_checkpoint,
        )
        res = run_with_checkpoint(df, out_dir)
        print(
            f"processed={len(res['processed_parts'])} "
            f"skipped={len(res['skipped_parts'])} run_id={res['run_id']}"
        )
    else:
        from document_parser_private_spark.plans.pipeline import (
            export_resume_json,
            extract_pipeline,
        )
        result = extract_pipeline(df)
        export_resume_json(result).write.mode("overwrite").parquet(
            f"{out_dir}/resumes_json"
        )
        print(f"rows={spark.read.parquet(f'{out_dir}/resumes_json').count()}")
    spark.stop()


if __name__ == "__main__":
    main()
