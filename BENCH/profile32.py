"""Decompose the 32-side fixed per-job cost (VERDICT r4 item 1).

Runs pinned to 32 CPUs (invoke under `taskset -c 0-31`). Times, on the
600k-doc probe corpus:
  floor_commit : noop write of spark.range(64)   -> plan+schedule+commit floor
  floor_scan   : corpus.count()                  -> parquet scan floor
  floor_scanw  : corpus noop write               -> scan + task launch + commit
  full         : extract_pipeline noop write x3  -> the probe job itself
Prints one JSON line; the gap full-floor_scanw is the Arrow/Python compute.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from document_parser_private_spark.session import get_spark
from document_parser_private_spark.plans.pipeline import extract_pipeline
from bench_scaling import scaling_corpus

corpus_path = scaling_corpus()
cores = int(os.environ.get("SPARK_GRAFT_PROF_CORES", "32"))
extra = {}
oc = os.environ.get("SPARK_GRAFT_PROF_OPENCOST")
if oc:
    extra["spark.sql.files.openCostInBytes"] = oc
spark = get_spark(app_name=f"prof{cores}", cores=cores,
                  shuffle_partitions=cores, extra_conf=extra)
corpus = spark.read.parquet(corpus_path)
n = corpus.count()


def t(fn, k=3):
    fn()  # warm
    secs = []
    for _ in range(k):
        t0 = time.perf_counter()
        fn()
        secs.append(round(time.perf_counter() - t0, 3))
    return sorted(secs)


out = {"cores": cores, "docs": n}
out["floor_commit"] = t(lambda: spark.range(64).write.format("noop").mode("overwrite").save())
out["floor_scan"] = t(lambda: corpus.count())
out["floor_scanw"] = t(lambda: corpus.write.format("noop").mode("overwrite").save())
out["scan_tasks"] = corpus.rdd.getNumPartitions()
out["full"] = t(lambda: extract_pipeline(corpus, repartition=False).write.format("noop").mode("overwrite").save(), k=3)
print(json.dumps(out), flush=True)
