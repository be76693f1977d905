"""Glass-box evidence for the north_rule's explicit skew handling: the
salted repartition must spread giant docs across partitions and strictly
improve byte balance over an adversarial input layout (all giants
concentrated in few shards). Hash salting has sampling variance at small
G/n (~80 giants over 8 partitions here); the bound tightens as 1/sqrt
at bench/cluster scale."""

from pyspark.sql import functions as F

from document_parser_private_spark.corpus import write_corpus_parquet
from document_parser_private_spark.plans.pipeline import (
    HEAVY_BYTES,
    repartition_salted,
)


def _loads(df):
    rows = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum("byte_size").alias("bytes"))
        .collect()
    )
    return [r["bytes"] for r in rows]


def test_salted_repartition_balances_giant_docs(spark, tmp_path):
    # 10% giant-doc tail in only 2 shards: adversarial input layout that
    # byte-based input splitting cannot fix
    path = str(tmp_path / "skewed")
    write_corpus_parquet(path, n=800, seed=13, shards=2, skew_frac=0.10)
    df = spark.read.parquet(path)

    n_parts = 8
    before = _loads(df.repartition(n_parts, F.col("part")))  # naive keying
    after = _loads(repartition_salted(df, num_partitions=n_parts))

    mean = sum(after) / n_parts
    assert len(after) == n_parts
    # salted layout: bounded imbalance...
    assert max(after) < 2.5 * mean, f"worst={max(after)} mean={mean:.0f}"
    # ...and strictly better than the naive partition-keyed layout
    assert max(after) < max(before), (max(after), max(before))

    # giant docs must not pile into few partitions
    giants = (
        repartition_salted(df, num_partitions=n_parts)
        .withColumn("pid", F.spark_partition_id())
        .where(F.col("byte_size") > HEAVY_BYTES)
        .groupBy("pid").count().collect()
    )
    per_pid = [r["count"] for r in giants]
    # hashing coverage: giants reach most partitions, none dominates
    assert len(per_pid) >= (3 * n_parts) // 4, per_pid
    assert max(per_pid) <= 3 * (sum(per_pid) / n_parts), per_pid
