"""BPE tokenizer (priority-merge encode, distributed learn) and the
fixed-grid mergeable quantile sketch."""

import random
import re

import pyspark.sql.functions as F

from document_parser_private_spark.operators.bpe import (
    DEFAULT_MERGES,
    MAX_WORD_LEN,
    bpe_encode_words,
    bpe_learn,
    bpe_token_counts,
)
from document_parser_private_spark.operators.sketch import (
    quantile_bucket_col,
    quantile_sketch,
)

_NO = 1 << 30


def _py_encode(word, merges, max_len=MAX_WORD_LEN):
    """Canonical priority merge: lowest rank first, leftmost on ties."""
    if len(word) > max_len:
        return [word]
    ranks = {f"{l} {r}": i + 1 for i, (l, r) in enumerate(merges)}
    syms = list(word)
    for _ in range(63):
        if len(syms) < 2:
            break
        prs = [ranks.get(f"{syms[i]} {syms[i + 1]}", _NO)
               for i in range(len(syms) - 1)]
        best = min(prs)
        if best == _NO:
            break
        i = prs.index(best)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]
    return syms


def test_bpe_encode_matches_priority_reference(spark):
    rng = random.Random(5)
    words = list({
        "".join(rng.choice("etaoinshr") for _ in range(rng.randint(1, 14)))
        for _ in range(150)
    }) + ["the", "thermal", "inthe", "x", "z" * (MAX_WORD_LEN + 6)]
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: r["bpe_syms"] for r in bpe_encode_words(wdf).collect()}
    for w in words:
        assert got[w] == _py_encode(w, DEFAULT_MERGES), w


def test_bpe_long_word_is_one_opaque_symbol(spark):
    blob = "a" * (MAX_WORD_LEN + 1)
    wdf = spark.createDataFrame([(blob,)], "word string")
    row = bpe_encode_words(wdf).collect()[0]
    assert row["bpe_syms"] == [blob] and row["n_bpe"] == 1


def test_bpe_learn_matches_python_learner(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the thermal printer prints the paper in the office",
        "learning tokenizers the hard way with merge tables",
        "the inner workings of the engine are interesting",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    word_re = re.compile(r"[^\t-\r ]+")
    vocab = {}
    for t in texts:
        for w in word_re.findall(t.lower()):
            if len(w) <= MAX_WORD_LEN:
                vocab[tuple(w)] = vocab.get(tuple(w), 0) + 1
    exp = []
    for _ in range(10):
        pc = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get(
                    (syms[i], syms[i + 1]), 0) + c
        if not pc:
            break
        best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] <= 1:
            break
        left, right = best[0]
        exp.append((left, right))
        nv = {}
        for syms, c in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv

    assert bpe_learn(df, n_merges=10) == exp


def test_bpe_token_counts_shape(spark):
    df = spark.createDataFrame(
        [(1, "the the the"), (2, "xyzzy")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in bpe_token_counts(df).collect()}
    assert got[1]["n_words"] == 3 and got[1]["n_bpe"] == 3  # 'the' -> 1 sym
    assert got[2]["n_words"] == 1 and got[2]["n_bpe"] > 1


def test_quantile_sketch_error_bounded_by_grid(spark):
    rng = random.Random(11)
    rows = [(f"s{i % 3}", rng.randint(0, 30000)) for i in range(3000)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    for r in quantile_sketch(df, "n_chars", ["source"]).collect():
        width = 16 if r["est"] < 1024 else 256 if r["est"] < 16384 else 4096
        # midpoint of the picked bucket: off by at most one bucket width
        # (half-width for grid resolution + rank-vs-interpolation slack)
        assert r["abs_err"] <= width, r


def test_quantile_sketch_histograms_merge(spark):
    """The sketch is mergeable by construction: bucket counts from two
    corpus halves sum to the whole corpus's counts, so the whole-corpus
    estimate equals the estimate from merged partial histograms."""
    rng = random.Random(13)
    rows = [("s", rng.randint(0, 5000)) for _ in range(2000)]
    whole = spark.createDataFrame(rows, "source string, n_chars long")
    h1 = spark.createDataFrame(rows[:1000], "source string, n_chars long")
    h2 = spark.createDataFrame(rows[1000:], "source string, n_chars long")

    def hist(df):
        return {
            (r["source"], r["b"]): r["c"]
            for r in df.select(
                "source",
                quantile_bucket_col(F.col("n_chars")).alias("b"),
            ).groupBy("source", "b").agg(
                F.count(F.lit(1)).alias("c")).collect()
        }

    merged = hist(h1)
    for k, v in hist(h2).items():
        merged[k] = merged.get(k, 0) + v
    assert merged == hist(whole)
