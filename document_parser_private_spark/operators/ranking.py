"""Corpus term-ranking operators: TF-IDF / BM25 scoring and per-doc
top terms.

Classic lexical relevance over the documents table, expressed as pure
codegen aggregations so the whole thing stays JVM-side:

  tf(d, t)  — term frequency, one shuffle keyed (doc, term) with
              map-side partial counts;
  df(t)     — document frequency, one shuffle keyed (term) over the
              already-collapsed (doc, term) pairs (never raw tokens);
  idf(t)    — BM25's ln(1 + (N - df + 0.5) / (df + 0.5)), always > 0;
  score     — idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).

100 TB posture: the only join keyed on a skewed key is tf x df on
`term`; its per-term row count is bounded by n_docs (pairs, not token
occurrences), Zipf-head terms are exactly the AQE skew-join case, and
the corpus-level scalar (N, avgdl) rides a 1-row broadcast. Top-k per
doc is a window over the doc key — no global sort.

All floating literals are Python-computed doubles passed verbatim to
both engines (repr round-trips IEEE), so the DuckDB twin reproduces
scores bit-for-bit before the final round(6).

Reference scope note: the reference engine has no ranking/IR operators
(verified); part of the beyond-reference training-data tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


BM25_K1 = 1.2
BM25_B = 0.75


def _doc_term_freqs(docs: DataFrame, id_col: str,
                    text_col: str) -> DataFrame:
    """(_id, term, tf) — the per-doc term-frequency table both ranking
    operators start from, via the shared mapInArrow tokenizer+counter
    (textstats._word_count_rows_arrow): the JVM regexp explode +
    groupBy(doc, term) hash agg it replaces was the dominant cost at
    50k docs (guide §4.2), and counts are exact by construction (a
    row's tokens never split across batches). Case folding stays
    native (lower() ahead of the boundary)."""
    from .textstats import _word_count_rows_arrow

    return (
        _word_count_rows_arrow(
            docs.select(F.col(id_col).alias("_id"),
                        F.lower(F.col(text_col)).alias("_t")),
            "_id", "_t",
        )
        .select("_id", F.col("token").alias("term"),
                F.col("cnt").alias("tf"))
    )


def inverted_index(
    docs: DataFrame,
    min_df: int = 5,
    max_postings: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Build a capped inverted index: per term, document frequency,
    collection frequency, and the first `max_postings` posting doc ids
    (ascending, csv). Terms below `min_df` are dropped (the long tail
    that bloats an index without serving queries).

    The posting cap is applied BEFORE collect_list via a per-term
    row_number window, so a stop-word term's postings never materialize
    beyond max_postings rows in any aggregation buffer — the guard that
    keeps index build safe when one term appears in billions of docs.
    """
    # tf feeds both the stats agg and the capped-postings window —
    # persist it so the tokenizer pass runs once (no cross-branch CSE,
    # PLANS.md §21); both consumers shuffle on `term`, vocab-bounded.
    tf = _doc_term_freqs(docs, id_col, text_col).persist()
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    w = Window.partitionBy("term").orderBy(F.col("_id").asc())
    capped = (
        tf.select("term", "_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_postings)
    )
    postings = capped.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings")
    )
    out = (
        stats.where(F.col("df") >= min_df)
        .join(postings, "term")
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("cf").cast("long").alias("cf"),
            "postings",
        )
    )
    try:
        out = out.localCheckpoint()
    finally:
        tf.unpersist()
    return out


def bm25_top_terms(
    docs: DataFrame,
    k: int = 3,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25-scored terms per document (ties break on term asc).

    Returns (id, term, tf, score, rnk) with score rounded to 6 after
    ranking on the unrounded double.
    """
    # tf is referenced by three branches (dl, dfreq, the join) and
    # Catalyst recomputes a subtree per reference (no cross-branch CSE,
    # PLANS.md §21) — the tokenizer pass ran 3x. Persist the collapsed
    # tf table once; release after an eager checkpoint of the (tiny)
    # top-k result. dfreq is vocabulary-bounded (Heaps' law), the
    # classic broadcast side (guide §3.1) — broadcasting it removes the
    # term-keyed exchange of the whole tf table, leaving one exchange
    # on _id that the top-k window then reuses (guide §2.4).
    tf = _doc_term_freqs(docs, id_col, text_col).persist()
    dl = tf.groupBy("_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    j = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    score = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    # Rank on the ROUNDED score (term asc tie-break): the last-ulp of
    # ln() is not guaranteed identical across engines (JVM Math.log vs
    # libm), and ranking on raw doubles would let a 1-ulp divergence
    # flip the order of two nearly-equal terms in the oracle twin.
    w = Window.partitionBy("_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    out = (
        j.select(
            "_id", "term", "tf", F.round(score, 6).alias("score")
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            F.col("_id").alias(id_col),
            "term",
            F.col("tf").cast("long").alias("tf"),
            "score",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )
    try:
        out = out.localCheckpoint()
    finally:
        tf.unpersist()
    return out
