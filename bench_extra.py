"""Extra per-query benchmarks (guide §1.4 noop-sink isolation).

`bench.py` is FROZEN for driver measurement; this harness exists for
optimization-round A/B work: time any subset of declared queries
against any data dir (e.g. the sf1-scale simulated documents table
under /root/scratch) without touching the driver contract.

Usage:
    python bench_extra.py SF_DIR query [query ...]
Env:
    SPARK_GRAFT_CPUS       cores (default 32)
    SPARK_GRAFT_XRUNS      timed runs per query (default 3, min kept)

Prints one JSON line: {"sf_dir":..., "queries": {name: [secs...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_XRUNS", "3"))

    from document_parser_private_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark(app_name="bench_extra", cores=cpus,
                      shuffle_partitions=cpus,
                      extra_conf={"spark.sql.files.openCostInBytes":
                                  "16777216"})
    qs = E.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        secs = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            (qs[name](spark, sf_dir).write.format("noop")
             .mode("overwrite").save())
            secs.append(round(time.perf_counter() - t0, 3))
        out[name] = secs
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": out}))


if __name__ == "__main__":
    main()
