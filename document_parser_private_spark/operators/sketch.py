"""Deterministic cardinality sketches for corpus-scale statistics.

`hll_distinct` is a HyperLogLog distinct-count estimator whose every bit
is reproducible across engines: the hash is md5 (not engine-native
hash functions, which differ between Spark and DuckDB), the register
index is the first 2 hex chars (m = 256 registers, p = 8), and the rank
is the leading-zero count of the next 15 hex chars (w = 60 bits) — all
computable with portable SQL (`conv`/hex-cast + `bin`), so the DuckDB
oracle twin reproduces the estimate exactly, double for double.

Why this exists at 100 TB: `count(distinct x)` shuffles every distinct
value; groups with billions of distinct tokens move billions of rows.
The sketch shuffles at most m = 256 (group, register) rows per group —
two codegen aggregations with map-side partial max/merge, associative
and resumable. Standard error at m = 256 is 1.04/sqrt(256) ≈ 6.5%.

Parity contract (mirrored in __spark_entry__._HLL_DISTINCT_SQL):
  h      = md5(value)
  reg    = int(h[0:2], 16)                       -- 0..255
  v      = int(h[2:17], 16)                      -- 60-bit
  rank   = 61 - bitlength(v)   (v = 0 -> 61)
  M_j    = max(rank) per (group, reg); absent registers count as 0
  E_raw  = alpha_m * m^2 / (sum(2^-M_j) + (m - present))
  E      = m * ln(m / zeros)  when E_raw <= 2.5 m and zeros > 0
           else E_raw          (standard small-range correction)

Reference scope note: the reference engine has no sketch operators
(verified — no estimator code in any of its 58 files); this is part of
the beyond-reference training-data tier the builder adds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_M = 256          # registers (p = 8 -> first 2 hex chars)
HLL_W = 60           # rank-value bit width (next 15 hex chars)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

CM_DEPTH = 4         # count-min hash rows (salts "0".."3")
CM_WIDTH = 1024      # counters per row (first 5 hex chars mod width)


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate of `value_col`.

    Returns one row per group with `hll_estimate` (double, rounded to 4)
    and `hll_registers` (count of touched registers, <= 256). Exactly
    two shuffles: (group, reg) for the register max, then (group) for
    the harmonic merge — both carry <= m rows per group regardless of
    input cardinality.
    """
    g = list(group_cols)
    h = F.md5(F.col(value_col).cast("string"))
    v = F.conv(F.substring(h, 3, 15), 16, 10).cast("bigint")
    rank = (
        F.when(v == 0, F.lit(HLL_W + 1))
        .otherwise(F.lit(HLL_W + 1) - F.length(F.bin(v)))
        .cast("int")
    )
    regs = (
        df.select(
            *g,
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("_reg"),
            rank.alias("_rank"),
        )
        .groupBy(*g, "_reg")
        .agg(F.max("_rank").alias("_m_j"))
    )
    m = float(HLL_M)
    merged = regs.groupBy(*g).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("_m_j"))).alias("_s_present"),
        F.count(F.lit(1)).alias("_present"),
    )
    s = F.col("_s_present") + (F.lit(m) - F.col("_present"))
    zeros = (F.lit(m) - F.col("_present")).cast("double")
    e_raw = F.lit(HLL_ALPHA * m * m) / s
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(m) * F.log(F.lit(m) / zeros),
    ).otherwise(e_raw)
    return merged.select(
        *g,
        F.round(est, 4).alias("hll_estimate"),
        F.col("_present").cast("long").alias("hll_registers"),
    )


def _cm_col(value, row: int):
    """Counter index of `value` in count-min row `row`: md5 of the
    salted value, first 5 hex chars (20 bits) mod CM_WIDTH. Salting the
    INPUT (not the output) gives CM_DEPTH independent hash functions
    from one md5 primitive — portable to any engine with md5."""
    h = F.md5(F.concat(F.lit(f"cm{row}:"), value.cast("string")))
    return (
        F.pmod(F.conv(F.substring(h, 1, 5), 16, 10).cast("bigint"),
               F.lit(CM_WIDTH))
        .cast("int")
    )


def count_min_sketch(df: DataFrame, value_col: str) -> DataFrame:
    """Build a count-min sketch of `value_col` occurrences: returns the
    counter table (cm_row, cm_col, cnt) with at most CM_DEPTH*CM_WIDTH
    rows total. One explode(DEPTH) + one shuffle on (row, col) with
    map-side partial counts — the fixed-size frequency summary that
    replaces a full token-count table at 100 TB (the sketch is
    mergeable across corpus shards by summing counters)."""
    v = F.col(value_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("cm_row"),
                        _cm_col(v, r).alias("cm_col"),
                    )
                    for r in range(CM_DEPTH)
                ]
            )
        ).alias("c")
    ).select("c.cm_row", "c.cm_col")
    return cells.groupBy("cm_row", "cm_col").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cm_estimate(sketch: DataFrame, items: DataFrame,
                item_col: str = "item") -> DataFrame:
    """Point-query the sketch for each row of `items`: the classic
    min-over-rows upper bound (estimate >= true count always; equality
    unless all CM_DEPTH cells collided). The sketch side is tiny
    (<= DEPTH*WIDTH counters) and broadcasts; items never shuffle."""
    v = F.col(item_col)
    probes = items.select(
        item_col,
        *[
            _cm_col(v, r).alias(f"_c{r}")
            for r in range(CM_DEPTH)
        ],
    )
    out = probes
    for r in range(CM_DEPTH):
        side = sketch.where(F.col("cm_row") == r).select(
            F.col("cm_col").alias(f"_c{r}"),
            F.col("cnt").alias(f"_n{r}"),
        )
        out = out.join(F.broadcast(side), f"_c{r}", "left")
    est = F.least(
        *[F.coalesce(F.col(f"_n{r}"), F.lit(0)) for r in range(CM_DEPTH)]
    )
    return out.select(item_col, est.cast("long").alias("cm_count"))


# ---------------------------------------------------------------------------
# quantile sketch: fixed integer grid (mergeable, engine-portable)
# ---------------------------------------------------------------------------

# Three-tier integer grid over non-negative longs. All arithmetic is
# integer division, so Spark and DuckDB agree bit-for-bit (a float
# log-grid would hinge on libm ulps at bucket boundaries).
#   tier 1: v <  1024   -> bucket = v // 16          (0..63,    width 16)
#   tier 2: v <  16384  -> 64 + (v - 1024) // 256    (64..123,  width 256)
#   tier 3: v >= 16384  -> 124 + min((v-16384)//4096, 875)  (width 4096,
#           capped at bucket 999 so the grid is bounded by construction)
QS_DEFAULT = (0.25, 0.5, 0.75, 0.95)


def quantile_bucket_col(v) -> "F.Column":
    v = v.cast("long")
    return (
        F.when(v < 1024, F.floor(v / 16))
        .when(v < 16384, 64 + F.floor((v - 1024) / 256))
        .otherwise(124 + F.least(F.floor((v - 16384) / 4096), F.lit(875)))
    ).cast("long")


def quantile_bucket_mid_col(b) -> "F.Column":
    """Bucket midpoint (the estimate read off the grid)."""
    return (
        F.when(b < 64, b * 16 + 8.0)
        .when(b < 124, 1024 + (b - 64) * 256 + 128.0)
        .otherwise(16384 + (b - 124) * 4096 + 2048.0)
    ).cast("double")


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    qs: Sequence[float] = QS_DEFAULT,
) -> DataFrame:
    """Per-group quantile estimates from a mergeable fixed-grid
    histogram, next to the exact percentile and the absolute error.

    Why this exists at 100 TB: exact per-group `percentile()` is a full
    sort of every group's values. The sketch shuffles at most 1000
    (group, bucket) count rows per group — built with one map-side
    partial aggregation, associative/mergeable by construction (merging
    two corpora's sketches = adding histograms). Worst-case estimate
    error is half a bucket width (8 / 128 / 2048 per tier).

    Quantile rule (mirrored in the DuckDB twin): estimate(q) = midpoint
    of the smallest bucket whose cumulative count reaches ceil(q * n).
    Output: (group..., q, est, exact, abs_err, n_rows) — `exact` is the
    interpolated percentile, present to surface the error; production
    at scale reads `est` only.
    """
    g = list(group_cols)
    v = F.col(value_col)
    hist = (
        df.select(*g, quantile_bucket_col(v).alias("_b"))
        .groupBy(*g, "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    from pyspark.sql import Window
    wcum = (
        Window.partitionBy(*g).orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*g)
    cum = hist.select(
        *g, "_b",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(wall).alias("_n"),
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    picked = (
        cum.select(*g, "_b", "_cum", "_n",
                   F.explode(qarr).alias("q"))
        .where(F.col("_cum") >= F.ceil(F.col("q") * F.col("_n")))
        .groupBy(*g, "q")
        .agg(F.min("_b").alias("_b"), F.min("_n").alias("n_rows"))
        .select(
            *g, "q",
            F.round(quantile_bucket_mid_col(F.col("_b")), 4).alias("est"),
            F.col("n_rows").cast("long").alias("n_rows"),
        )
    )
    exact = (
        df.groupBy(*g)
        .agg(F.percentile(v.cast("double"), qarr).alias("_ex"))
        .select(*g, F.posexplode("_ex").alias("_i", "_exact"))
        .select(*g, F.element_at(qarr, F.col("_i") + 1).alias("q"),
                F.round("_exact", 4).alias("exact"))
    )
    return picked.join(exact, [*g, "q"]).select(
        *g, "q", "est", "exact",
        F.round(F.abs(F.col("est") - F.col("exact")), 4).alias("abs_err"),
        "n_rows",
    )
