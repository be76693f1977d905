"""Per-partition checkpoint/resume with lineage + metrics side tables
(BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics", "exactly-once via atomic append + idempotent
overwrite-by-partition").

Layout under `out_dir` (parquet here; the design maps 1:1 onto Iceberg —
lineage append == snapshot commit, partition overwrite == overwrite-by-
partition; parquet is used because the sandbox ships no Iceberg runtime):

    out_dir/extracted/part=<p>/...   extraction output, dynamic overwrite
    out_dir/lineage/...              append-only ledger: one row per
                                     completed partition per run
    out_dir/metrics/...              extraction metrics per partition

Correctness argument (kill anywhere, rerun, identical final output):
  1. a partition's data is written with dynamic partition overwrite —
     rewriting partition p replaces exactly partition p, so a retry after
     a mid-write kill cannot duplicate rows;
  2. the lineage row for p is appended only AFTER p's data commit; a kill
     between the two re-processes p (idempotent by 1);
  3. resume = anti-join of all partitions against lineage 'done' rows, so
     completed partitions are never recomputed.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import extract_pipeline

LINEAGE_SCHEMA = (
    "part int, status string, run_id string, doc_count long, "
    "started_at double, finished_at double"
)
METRICS_SCHEMA = (
    "part int, doc_count long, blocks_kept long, blocks_dropped long, "
    "parse_failures long, run_id string"
)


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """Crash-consistent metrics view: metrics are appended (step 2)
    BEFORE the lineage commit point (step 3), so a kill between the two
    re-processes the group and appends metrics again. Naive sums over the
    raw metrics table double-count those orphans; joining to lineage
    'done' rows on (part, run_id) drops them — a metrics row is valid
    only if its exact (part, run_id) reached the commit point."""
    metrics = spark.read.parquet(f"{out_dir}/metrics")
    lineage = (
        spark.read.parquet(f"{out_dir}/lineage")
        .where(F.col("status") == "done")
        .select("part", "run_id")
        .distinct()
    )
    # Keyed dedupe guards the resume-with-same-run_id case: the orphan and
    # its re-run carry the same (part, run_id) — the pipeline is
    # deterministic, so whichever row survives is correct. Keying on the
    # explicit commit key (not whole-row equality) keeps the invariant
    # even if a nondeterministic metric column (e.g. timing) is added.
    return metrics.join(lineage, ["part", "run_id"], "left_semi") \
        .dropDuplicates(["part", "run_id"])


def _lineage_done(spark: SparkSession, out_dir: str) -> set[int]:
    try:
        rows = (
            spark.read.parquet(f"{out_dir}/lineage")
            .where(F.col("status") == "done")
            .select("part")
            .distinct()
            .collect()
        )
        return {r["part"] for r in rows}
    except Exception:  # no lineage yet (AnalysisException: path missing)
        return set()


def run_with_checkpoint(
    df: DataFrame,
    out_dir: str,
    parts_per_commit: int = 4,
    run_id: str | None = None,
    fail_after_commits: int | None = None,
    fail_before_lineage: int | None = None,
) -> dict:
    """Run the extraction pipeline over `df` (must carry an int `part`
    column), committing per group of partitions; resumes past partitions
    already recorded 'done' in the lineage ledger.

    fail_after_commits: test hook — raise after N commits to simulate a
    mid-run kill. fail_before_lineage: test hook — raise during the Nth
    commit after the metrics append but before the lineage commit point
    (the orphan-metrics window read_metrics must survive).

    Returns {"processed_parts": [...], "skipped_parts": [...]}.
    """
    spark = df.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]

    # Resume correctness REQUIRES dynamic partition overwrite: with
    # Spark's default (static), step 1's overwrite would delete every
    # previously committed partition while lineage still marks them done
    # — a resume would then silently produce incomplete output. Enforce
    # rather than assume (session.get_spark sets it, but this operator
    # must be safe under any session) — and restore the caller's value on
    # exit so unrelated writes keep their overwrite semantics.
    _OVERWRITE_KEY = "spark.sql.sources.partitionOverwriteMode"
    prev_mode = spark.conf.get(_OVERWRITE_KEY, None)
    spark.conf.set(_OVERWRITE_KEY, "dynamic")
    try:
        all_parts = sorted(
            r["part"] for r in df.select("part").distinct().collect()
        )
        done = _lineage_done(spark, out_dir)
        pending = [p for p in all_parts if p not in done]
        skipped = [p for p in all_parts if p in done]

        processed: list[int] = []
        commits = 0
        for i in range(0, len(pending), parts_per_commit):
            group = pending[i:i + parts_per_commit]
            started = time.time()
            chunk = df.where(F.col("part").isin(group))
            result = extract_pipeline(chunk).join(
                chunk.select("doc_id", "part"), "doc_id"
            )
            flat = result.select(
                "doc_id", "part", "blocks_kept", "blocks_dropped",
                F.to_json("clean_spans").alias("clean_spans_json"),
                F.to_json("sections").alias("sections_json"),
                F.to_json("contact").alias("contact_json"),
                "summary",
                F.to_json("skills").alias("skills_json"),
            )
            # 1. idempotent data commit (dynamic partition overwrite)
            flat.write.mode("overwrite").partitionBy("part").parquet(
                f"{out_dir}/extracted"
            )
            # 2. metrics append
            metrics = (
                result.groupBy("part")
                .agg(
                    F.count("*").alias("doc_count"),
                    F.sum("blocks_kept").alias("blocks_kept"),
                    F.sum("blocks_dropped").alias("blocks_dropped"),
                    F.sum(
                        F.when(F.col("blocks_kept").isNull(), 1).otherwise(0)
                    ).alias("parse_failures"),
                )
                .withColumn("run_id", F.lit(run_id))
            )
            metrics.write.mode("append").parquet(f"{out_dir}/metrics")
            if fail_before_lineage is not None and commits + 1 >= fail_before_lineage:
                raise RuntimeError(
                    "simulated failure between metrics append and lineage "
                    "commit (test hook)"
                )
            # 3. lineage append LAST (commit point)
            finished = time.time()
            lineage = spark.createDataFrame(
                [
                    (p, "done", run_id, None, started, finished)
                    for p in group
                ],
                schema=LINEAGE_SCHEMA,
            )
            lineage.write.mode("append").parquet(f"{out_dir}/lineage")
            processed.extend(group)
            commits += 1
            if fail_after_commits is not None and commits >= fail_after_commits:
                raise RuntimeError(
                    f"simulated failure after {commits} commits (test hook)"
                )
    finally:
        if prev_mode is None:
            spark.conf.unset(_OVERWRITE_KEY)
        else:
            spark.conf.set(_OVERWRITE_KEY, prev_mode)
    return {"processed_parts": processed, "skipped_parts": skipped,
            "run_id": run_id}
