"""Interleaved A/B: does the explicit PY_WS character class cost anything
vs Java's ASCII \\s in the native textstats expressions? (VERDICT r2 #2 —
textstats 0.93->2.81 s and extract_pipeline_salted 3.50->8.47 s slowed in
the round-2 bench; split VM noise from regex cost by alternating both
variants inside ONE session on the same cached input.)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from document_parser_private_spark.semantics import PY_WS_JRE, PY_WS_JRE_INNER
from document_parser_private_spark.session import get_spark

ASCII = {
    "word": r"\S+",
    "bpe": r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]",
    "punct": r"[^A-Za-z0-9\s]",
    "ws": r"\s",
}
PYWS = {
    "word": f"[^{PY_WS_JRE_INNER}]+",
    "bpe": f"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{PY_WS_JRE_INNER}]",
    "punct": f"[^A-Za-z0-9{PY_WS_JRE_INNER}]",
    "ws": PY_WS_JRE,
}


def stats_cols(t, pats):
    words = F.size(F.regexp_extract_all(t, F.lit(pats["word"]), F.lit(0)))
    bpe = F.size(F.regexp_extract_all(t, F.lit(pats["bpe"]), F.lit(0)))
    punct = F.size(F.regexp_extract_all(t, F.lit(pats["punct"]), F.lit(0)))
    fp = F.md5(F.regexp_replace(
        F.regexp_replace(F.lower(t), pats["ws"] + "+", " "), r"^ | $", ""))
    return [words.alias("w"), bpe.alias("b"), punct.alias("p"),
            fp.alias("f")]


def main():
    spark = get_spark(app_name="ab_pyws", cores=8, shuffle_partitions=8)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet") \
        .select("doc_id", "text").cache()
    docs.count()
    t = F.col("text")
    variants = {"ascii": stats_cols(t, ASCII), "pyws": stats_cols(t, PYWS)}
    # warm both
    for cols in variants.values():
        docs.select(*cols).write.format("noop").mode("overwrite").save()
    times = {k: [] for k in variants}
    for _ in range(7):
        for k, cols in variants.items():
            t0 = time.perf_counter()
            docs.select(*cols).write.format("noop").mode("overwrite").save()
            times[k].append(round(time.perf_counter() - t0, 3))
    out = {k: {"min": min(v), "median": statistics.median(v), "all": v}
           for k, v in times.items()}
    out["pyws_over_ascii_median"] = round(
        out["pyws"]["median"] / out["ascii"]["median"], 3)
    out["pyws_over_ascii_min"] = round(
        out["pyws"]["min"] / out["ascii"]["min"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
