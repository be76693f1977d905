"""Checkpoint/resume correctness (north_rule): kill mid-run, rerun,
assert only pending partitions are processed and final output is
identical to an uninterrupted run."""

import pytest

from document_parser_private_spark.plans.checkpoint import (
    run_with_checkpoint,
)


def _collect_extracted(spark, out_dir):
    rows = spark.read.parquet(f"{out_dir}/extracted").collect()
    return sorted(
        (r["doc_id"], r["part"], r["blocks_kept"], r["clean_spans_json"])
        for r in rows
    )


def test_full_run_then_noop_resume(spark, corpus_df, tmp_path):
    out = str(tmp_path / "out")
    r1 = run_with_checkpoint(corpus_df, out, parts_per_commit=3)
    assert sorted(r1["processed_parts"]) == list(range(8))
    assert r1["skipped_parts"] == []
    data1 = _collect_extracted(spark, out)
    assert len(data1) == corpus_df.count()

    # rerun: everything already checkpointed -> nothing processed
    r2 = run_with_checkpoint(corpus_df, out, parts_per_commit=3)
    assert r2["processed_parts"] == []
    assert sorted(r2["skipped_parts"]) == list(range(8))
    assert _collect_extracted(spark, out) == data1


def test_kill_midway_resume_identical(spark, corpus_df, tmp_path):
    out_a = str(tmp_path / "killed")
    out_b = str(tmp_path / "clean")

    # uninterrupted reference run
    run_with_checkpoint(corpus_df, out_b, parts_per_commit=3)
    expected = _collect_extracted(spark, out_b)

    # killed run: fails after 1 commit (3 parts done)
    with pytest.raises(RuntimeError, match="simulated failure"):
        run_with_checkpoint(
            corpus_df, out_a, parts_per_commit=3, fail_after_commits=1
        )
    done_after_kill = {
        r["part"]
        for r in spark.read.parquet(f"{out_a}/lineage").collect()
    }
    assert len(done_after_kill) == 3

    # resume processes exactly the remaining partitions
    r = run_with_checkpoint(corpus_df, out_a, parts_per_commit=3)
    assert sorted(r["skipped_parts"]) == sorted(done_after_kill)
    assert sorted(r["processed_parts"]) == sorted(
        set(range(8)) - done_after_kill
    )
    assert _collect_extracted(spark, out_a) == expected


def test_metrics_side_table(spark, corpus_df, tmp_path):
    out = str(tmp_path / "m")
    run_with_checkpoint(corpus_df, out, parts_per_commit=8)
    metrics = spark.read.parquet(f"{out}/metrics").collect()
    assert {r["part"] for r in metrics} == set(range(8))
    total_docs = sum(r["doc_count"] for r in metrics)
    assert total_docs == corpus_df.count()
    assert all(r["blocks_dropped"] >= 0 for r in metrics)


def test_metrics_survive_orphan_window(spark, corpus_df, tmp_path):
    """Kill between the metrics append and the lineage commit: the raw
    metrics table double-counts the re-processed group, read_metrics
    does not (lineage semi-join on (part, run_id) drops orphans)."""
    from document_parser_private_spark.plans.checkpoint import read_metrics

    out = str(tmp_path / "orphan")
    with pytest.raises(RuntimeError, match="between metrics append"):
        run_with_checkpoint(
            corpus_df, out, parts_per_commit=3, fail_before_lineage=1
        )
    # resume (fresh run_id) completes all 8 partitions
    run_with_checkpoint(corpus_df, out, parts_per_commit=3)

    raw = spark.read.parquet(f"{out}/metrics").collect()
    clean = read_metrics(spark, out).collect()
    n_docs = corpus_df.count()
    # the orphaned group's rows inflate the raw sum ...
    assert sum(r["doc_count"] for r in raw) > n_docs
    # ... while the lineage-joined view is exact, one row per partition
    assert sum(r["doc_count"] for r in clean) == n_docs
    assert sorted(r["part"] for r in clean) == list(range(8))


def test_checkpoint_forces_dynamic_overwrite(spark, corpus_df, tmp_path):
    """run_with_checkpoint must not rely on the session having
    partitionOverwriteMode=dynamic — under 'static' a resume would wipe
    committed partitions."""
    out = str(tmp_path / "static")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
        with pytest.raises(RuntimeError, match="simulated failure"):
            run_with_checkpoint(
                corpus_df, out, parts_per_commit=3, fail_after_commits=1
            )
        run_with_checkpoint(corpus_df, out, parts_per_commit=3)
        assert len(_collect_extracted(spark, out)) == corpus_df.count()
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
