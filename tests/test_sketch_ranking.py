"""Unit tests for operators/sketch.py (deterministic HLL) and
operators/ranking.py (BM25) and curation.strip_boilerplate.

The HLL test checks the estimator against a pure-Python replica of the
md5-register contract (exact register equality) AND against the true
cardinality (error within the m=256 theoretical envelope). BM25 is
checked against a naive pure-Python scorer. Boilerplate stripping is
checked on a handcrafted corpus with known shared/unique lines.
"""

import hashlib
import math
import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from document_parser_private_spark.operators.curation import (
    strip_boilerplate,
)
from document_parser_private_spark.operators.ranking import (
    BM25_B,
    BM25_K1,
    bm25_top_terms,
)
from document_parser_private_spark.operators.sketch import (
    HLL_ALPHA,
    HLL_M,
    HLL_W,
    hll_distinct,
)

_TOK = re.compile(r"[^\x09-\x0d\x20]+")


def _py_hll(values):
    regs = defaultdict(int)
    for val in values:
        h = hashlib.md5(str(val).encode()).hexdigest()
        reg = int(h[:2], 16)
        v = int(h[2:17], 16)
        rank = HLL_W + 1 if v == 0 else HLL_W + 1 - v.bit_length()
        regs[reg] = max(regs[reg], rank)
    m = float(HLL_M)
    s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    zeros = m - len(regs)
    e_raw = HLL_ALPHA * m * m / s
    if e_raw <= 2.5 * m and zeros > 0:
        return round(m * math.log(m / zeros), 4)
    return round(e_raw, 4)


def test_hll_matches_python_replica_and_truth(spark):
    n = 20000
    df = spark.range(n).select(
        (F.col("id") % 4).cast("string").alias("grp"),
        F.concat(F.lit("tok-"), F.col("id").cast("string")).alias("val"),
    )
    got = {
        r["grp"]: (r["hll_estimate"], r["hll_registers"])
        for r in hll_distinct(df, ["grp"], "val").collect()
    }
    for g in range(4):
        vals = [f"tok-{i}" for i in range(n) if i % 4 == g]
        est, _regs = got[str(g)]
        assert est == _py_hll(vals)
        # m=256 -> std err ~6.5%; 3 sigma envelope
        assert abs(est - len(vals)) / len(vals) < 0.20


def test_hll_small_range_exactish(spark):
    # 30 distinct values: small-range correction regime, near-exact
    df = spark.range(30).select(
        F.lit("g").alias("grp"),
        F.col("id").cast("string").alias("val"),
    )
    [row] = hll_distinct(df, ["grp"], "val").collect()
    assert abs(row["hll_estimate"] - 30) < 3


def _py_bm25_top(docs, k=3):
    toks = {d: [t.lower() for t in _TOK.findall(text)]
            for d, text in docs.items()}
    tf = {d: Counter(ts) for d, ts in toks.items()}
    dfreq = Counter()
    for d, c in tf.items():
        dfreq.update(c.keys())
    n = len(docs)
    dls = {d: sum(c.values()) for d, c in tf.items()}
    avgdl = sum(dls.values()) / n
    out = {}
    for d, c in tf.items():
        scored = []
        for term, f_ in c.items():
            idf = math.log(
                1.0 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
            s = (idf * (f_ * (BM25_K1 + 1.0))
                 / (f_ + BM25_K1 * ((1.0 - BM25_B)
                                    + BM25_B * dls[d] / avgdl)))
            scored.append((round(s, 6), term, f_))
        scored.sort(key=lambda x: (-x[0], x[1]))
        out[d] = [(t, f_, s) for s, t, f_ in scored[:k]]
    return out


def test_bm25_matches_python(spark):
    docs = {
        1: "apple banana apple cherry the the the",
        2: "banana cherry date date date elderberry",
        3: "the quick brown fox jumps over the lazy dog apple",
        4: "unique singleton tokens here only once",
    }
    sdf = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string")
    got = defaultdict(list)
    for r in bm25_top_terms(sdf, k=3).orderBy("doc_id", "rnk").collect():
        got[r["doc_id"]].append((r["term"], r["tf"], r["score"]))
    assert dict(got) == _py_bm25_top(docs)


def test_strip_boilerplate(spark):
    rows = []
    for i in range(12):
        rows.append((i, f"unique line {i}\nSHARED FOOTER\nbody {i}"))
    rows.append((99, "all alone\n\ntrailing empty ok\n"))
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           strip_boilerplate(sdf, min_docs=10).collect()}
    for i in range(12):
        r = out[i]
        assert r["n_lines"] == 3 and r["n_removed"] == 1
        assert r["clean_text"] == f"unique line {i}\nbody {i}"
    r99 = out[99]
    # empty lines are never boilerplate candidates and always survive
    assert r99["n_removed"] == 0
    assert r99["clean_text"] == "all alone\n\ntrailing empty ok\n"


def test_strip_boilerplate_all_boilerplate_doc(spark):
    rows = [(i, "SAME") for i in range(10)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    out = strip_boilerplate(sdf, min_docs=10).collect()
    assert all(r["clean_text"] == "" and r["n_removed"] == 1 for r in out)
