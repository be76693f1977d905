"""Benchmark harness (driver contract).

Runs the headline workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" {name: sec},
"sf", plus extraction docs/sec extras}.

Headline = the extraction pipeline itself (north_star metric is docs/sec)
over a deterministic synthetic interleaved corpus sized by sf, plus the
heaviest analytics queries from __spark_entry__ at the sf tables.
Forced with a noop sink (full computation, no disk write).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench")


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def corpus_path(sf: float) -> str:
    os.makedirs(BENCH_DIR, exist_ok=True)
    n_docs = max(2000, int(200_000 * sf))
    path = os.path.join(BENCH_DIR, f"corpus_{n_docs}_sharded")
    if not os.path.exists(path):
        from document_parser_private_spark.corpus import write_corpus_parquet
        write_corpus_parquet(path, n=n_docs, seed=42, shards=64)
    return path


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
MAX_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_RUNS", "4"))


def timed_min(fn) -> float:
    """Min wall time of N_RUNS executions, extended up to MAX_RUNS when
    the observed spread is wide — the sandbox VM suffers episodic
    hypervisor throttling (measured 2-8x BIMODAL swings on identical
    jobs, CLAUDE.md), so two samples can BOTH land in the slow mode;
    min-of-adaptive-N estimates unthrottled performance. Extension
    triggers on max/min > 1.5 (a clean window's run-to-run spread is
    under ~20%) and stops as soon as two samples agree within 20%."""
    secs: list[float] = []
    for i in range(MAX_RUNS):
        t0 = time.perf_counter()
        fn()
        secs.append(time.perf_counter() - t0)
        if i + 1 >= N_RUNS:
            s = sorted(secs)
            if len(s) >= 2 and s[1] / s[0] < 1.2:
                break
            if max(secs) / min(secs) <= 1.5:
                break
    return round(min(secs), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)

    from document_parser_private_spark.session import get_spark
    from document_parser_private_spark.plans.pipeline import extract_pipeline
    import __spark_entry__ as E

    # One scan task per corpus shard (openCost >= maxPartitionBytes
    # defeats small-file bin packing): default packing glues the 64
    # equal shards into ~cores+2 ragged splits -> a straggler wave that
    # idles most cores at 32 (PLANS.md §20; single-file sf tables are
    # unaffected — packing only applies across files).
    spark = get_spark(app_name="bench", cores=cpus, shuffle_partitions=cpus,
                      extra_conf={"spark.sql.files.openCostInBytes":
                                  "16777216"})

    cpath = corpus_path(sf)
    corpus = spark.read.parquet(cpath)
    n_docs = corpus.count()

    timings: dict[str, float] = {}

    # untimed warmup: the first execution of the extraction plan pays
    # JVM JIT + whole-stage-codegen compilation (measured ~2x on run 1 of
    # a fresh session); the headline is the steady-state number
    force(extract_pipeline(corpus, repartition=False))

    # headline: the steady-state plan (storage already salt-bucketed and
    # balanced -> exchange-free); the ad-hoc path with the salted
    # repartition is timed alongside
    timings["extract_pipeline"] = timed_min(
        lambda: force(extract_pipeline(corpus, repartition=False))
    )
    timings["extract_pipeline_salted"] = timed_min(
        lambda: force(extract_pipeline(corpus, num_partitions=cpus))
    )
    docs_per_sec = round(n_docs / timings["extract_pipeline"], 1)

    qs = E.queries()
    for name in (
        "textstats", "minhash", "minhash_candidates",
        "jaccard_on_candidates", "jaccard_pairs", "simhash",
        "exact_dedup", "cosine_topk", "ivf_topk", "lsh_buckets",
        "eval_metrics", "lineitem_agg", "region_revenue",
        "event_sessions", "token_histogram", "skill_normalize_join",
        "repetition_stats", "decontaminate", "chunk_documents",
        "event_asof",
        "hll_distinct", "bm25_terms", "lm_score", "pagerank",
        "strip_boilerplate", "ngram_counts", "pack_sequences",
        "mixture_sample",
        "bpe_tokens", "quantile_sketch", "incident_window_join",
        "bloom_prune", "lexical_stats",
        "weighted_sample", "event_funnel", "triangle_count",
        "cohort_retention", "substring_dedup",
    ):
        timings[name] = timed_min(lambda: force(qs[name](spark, sf_dir)))

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "extraction+analytics wall time (headline: extraction docs/sec)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extraction_docs": n_docs,
        "extraction_docs_per_sec": docs_per_sec,
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
