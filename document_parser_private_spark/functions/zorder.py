"""Z-order (Morton) codes for multi-dimensional data clustering.

The lakehouse layout technique: interleave the bits of two scan-filter
columns and range-partition / sort files by the resulting code, so
min/max file statistics prune on BOTH dimensions at once (the effect
Delta's OPTIMIZE ZORDER and Iceberg's sort orders buy). The code is
pure integer bit arithmetic — whole-stage codegen, portable to the
DuckDB twin operator-for-operator.

`cluster_by_zorder` is the write-side operator: compute the code and
repartitionByRange over it, which gives each output file a tight
z-range (= a tight rectangle in (x, y) space) that a later scan prunes
with ordinary column stats.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16


def zorder_code_col(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton-interleave the low `bits` bits of two non-negative
    integer columns: x occupies even bit positions, y odd. Monotone in
    the interleaved lattice — nearby (x, y) points share long code
    prefixes."""
    xb = x.cast("bigint")
    yb = y.cast("bigint")
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(
                F.shiftrightunsigned(xb, i).bitwiseAND(F.lit(1)), 2 * i
            )
        )
        terms.append(
            F.shiftleft(
                F.shiftrightunsigned(yb, i).bitwiseAND(F.lit(1)),
                2 * i + 1,
            )
        )
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def zorder_sql(x_expr: str, y_expr: str, bits: int = ZORDER_BITS) -> str:
    """The DuckDB-SQL twin of zorder_code_col — same bit arithmetic,
    generated term-for-term (used by the correctness oracle)."""
    # NB: each term is fully parenthesized — DuckDB gives `+` higher
    # precedence than `<<`, so `a << 0 + b << 1` would chain the shifts.
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Attach `zcode` and range-partition by it: the write-side layout
    step. Each output partition covers a contiguous z-range, so file
    min/max stats stay tight on both source columns and scans with
    either predicate prune files. (Range partitioning samples the code
    distribution — skewed inputs still split evenly.)"""
    coded = df.withColumn(
        "zcode", zorder_code_col(F.col(x_col), F.col(y_col), bits)
    )
    return coded.repartitionByRange(num_partitions, "zcode")
