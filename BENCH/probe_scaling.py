"""One-off probe: where does scaling efficiency go between local[N] levels?

Runs three job variants at several core counts, each in its own JVM:
  full    — the complete extract_pipeline (what bench_scaling measures)
  native  — only the native stages (layout sort + classify), no Python
  udf     — only the pandas-UDF stages (sections FSM + resume extraction)
            applied directly to raw spans (no native prep)

Prints per-variant docs/sec per core count so we can see which stage
class stops scaling.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from document_parser_private_spark.session import get_spark
from document_parser_private_spark.plans.pipeline import extract_pipeline
from document_parser_private_spark.operators.layout import reading_order_sort
from document_parser_private_spark.operators.classify import classify_spans
from document_parser_private_spark.operators.sections import detect_sections_op
from document_parser_private_spark.operators.resume import extract_resume_op
cores, variant = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app_name=f"probe{cores}", cores=cores, shuffle_partitions=cores)
corpus = spark.read.parquet(%(corpus)r)
n = corpus.count()

def build():
    if variant == "full":
        return extract_pipeline(corpus, num_partitions=cores, repartition=False)
    if variant == "native":
        return classify_spans(reading_order_sort(corpus))
    if variant == "udf":
        d = classify_spans(reading_order_sort(corpus))
        return extract_resume_op(detect_sections_op(d))
    raise SystemExit(f"unknown variant {variant}")

build().write.format("noop").mode("overwrite").save()  # warm
t0 = time.perf_counter()
build().write.format("noop").mode("overwrite").save()
dt = time.perf_counter() - t0
print(json.dumps({"cores": cores, "variant": variant, "sec": round(dt, 3),
                  "docs_per_sec": round(n / dt, 1)}))
"""


def run(cores: int, variant: str, corpus: str) -> dict:
    code = CHILD % {"repo": REPO, "corpus": corpus}
    out = subprocess.run([sys.executable, "-c", code, str(cores), variant],
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sys.path.insert(0, REPO)
    os.environ.setdefault("SPARK_GRAFT_SCALE_DOCS", "50000")
    from bench_scaling import scaling_corpus
    corpus = scaling_corpus()
    core_levels = [int(c) for c in (sys.argv[1:] or ["1", "2", "4", "8"])]
    variants = os.environ.get("PROBE_VARIANTS", "full,native,udf").split(",")
    results = []
    for variant in variants:
        per = {}
        for cores in core_levels:
            r = run(cores, variant, corpus)
            per[cores] = r["docs_per_sec"]
            print(json.dumps(r), flush=True)
        base = core_levels[0]
        for c in core_levels[1:]:
            eff = per[c] / ((c / base) * per[base])
            print(f"  {variant}: eff {base}->{c} = {eff:.3f}", flush=True)
        results.append((variant, per))


if __name__ == "__main__":
    main()
