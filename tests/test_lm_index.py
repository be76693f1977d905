"""Unit tests for operators/lm.py (bigram LM scoring) and
ranking.inverted_index, each against a naive pure-Python replica."""

import math
import re
from collections import Counter, defaultdict

from document_parser_private_spark.operators.lm import LM_K, lm_score
from document_parser_private_spark.operators.ranking import inverted_index

_TOK = re.compile(r"[^\x09-\x0d\x20]+")


def _py_lm(docs, k=LM_K):
    bigrams = {}
    for d, text in docs.items():
        t = [x.lower() for x in _TOK.findall(text)]
        bigrams[d] = list(zip(t, t[1:]))
    c2 = Counter(g for gs in bigrams.values() for g in gs)
    c1 = Counter(g[0] for gs in bigrams.values() for g in gs)
    v = len(c1)
    out = {}
    for d, gs in bigrams.items():
        if not gs:
            out[d] = (0, None, None)
            continue
        slp = sum(
            math.log((c2[g] + k) / (c1[g[0]] + k * v)) for g in gs)
        avg = slp / len(gs)
        out[d] = (len(gs), round(avg, 6), round(math.exp(-avg), 4))
    return out


def test_lm_score_matches_python(spark):
    docs = {
        1: "the cat sat on the mat",
        2: "the cat ran",
        3: "dogs bark",
        4: "single",          # 0 bigrams -> NULL scores
        5: "the cat sat on the mat again and again",
    }
    sdf = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["ppl"])
        for r in lm_score(sdf).collect()
    }
    assert got == _py_lm(docs)


def test_lm_score_separate_train_corpus(spark):
    train = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(9, "a b"), (10, "z q")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm_score(score, train=train).collect()}
    # "a b" seen in training -> much higher logp than unseen "z q"
    assert got[9]["avg_logp"] > got[10]["avg_logp"]
    assert got[10]["ppl"] > got[9]["ppl"]


def test_inverted_index_matches_python(spark):
    docs = {
        1: "apple banana apple",
        2: "banana cherry",
        3: "apple banana cherry",
        4: "banana",
    }
    sdf = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string")
    got = {
        r["term"]: (r["df"], r["cf"], r["postings"])
        for r in inverted_index(sdf, min_df=2, max_postings=2).collect()
    }
    tf = defaultdict(Counter)
    for d, text in docs.items():
        tf[d].update(x.lower() for x in _TOK.findall(text))
    exp = {}
    for term in {"apple", "banana", "cherry"}:
        ds = sorted(d for d in docs if tf[d][term])
        df_, cf = len(ds), sum(tf[d][term] for d in ds)
        if df_ >= 2:
            exp[term] = (df_, cf, ",".join(str(d) for d in ds[:2]))
    assert got == exp


def _py_ngrams(docs, n=3):
    c = Counter()
    dfreq = Counter()
    for text in docs.values():
        t = [x.lower() for x in _TOK.findall(text)]
        grams = [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]
        c.update(grams)
        dfreq.update(set(grams))
    return c, dfreq


def test_ngram_counts_matches_python(spark):
    from document_parser_private_spark.operators.lm import ngram_counts
    docs = {
        1: "the cat sat on the mat",
        2: "the cat sat on a hat",
        3: "the cat sat on the mat",   # exact repeat: occurrences 2x
        4: "to be",                     # < n tokens -> no grams
        5: "",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string")
    out = {
        r["gram"]: (r["n_occurrences"], r["n_docs"])
        for r in ngram_counts(df, n=3, min_count=2).collect()
    }
    c, dfreq = _py_ngrams(docs)
    expect = {g: (cnt, dfreq[g]) for g, cnt in c.items() if cnt >= 2}
    assert out == expect
    assert "the cat sat" in out and out["the cat sat"] == (3, 3)
