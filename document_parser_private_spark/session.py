"""SparkSession factory tuned for the extraction workload.

Scale posture (100 TB / 1000-executor mindset, tested on local[N]):
  - AQE on: runtime shuffle coalescing + skew-join splitting.
  - Arrow on: every pandas UDF moves columnar batches, never rows.
  - shuffle.partitions sized to cores locally; on a real cluster this is
    set to ~2-3x total executor cores via spark-submit conf.
  - UTC session TZ so DuckDB-oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "document_parser_private_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    cores=None -> local[*]. On a cluster this function is a no-op wrapper:
    spark-submit provides the master and the builder just picks up the conf.
    """
    if cores is None:
        cores_env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(cores_env) if cores_env else 0
    master = f"local[{cores}]" if cores else "local[*]"
    n = cores or (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # small enough that each UDF task streams several batches (JVM
        # Arrow serialization overlaps Python compute), large enough to
        # amortize per-batch overhead; giant docs (~100KB spans) keep a
        # batch well under executor memory
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # local corpora are few-MB shards; the 128MB default packs the
        # whole scan into 2-3 map tasks and serializes the shuffle-write
        # side. 16MB/64KB keeps scan parallelism ~cores at bench sizes
        # while remaining sane for big files (cluster deployments override
        # via spark-submit conf).
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "65536")
        # partitionOverwriteMode=dynamic -> idempotent overwrite-by-partition,
        # the checkpoint/resume correctness primitive (plans/checkpoint.py).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
