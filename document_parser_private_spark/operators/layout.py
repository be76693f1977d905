"""Layout pass: recover reading order from the span offset layout key.

Fully native (no Python): the generator/PDF pass encodes reading order as
ascending `offset` (two-column docs: offset = col*COL_STRIDE + y, stored
array order is the physical row-major interleave — see corpus.py). This
operator is the Spark analogue of the north_star's "line clustering by
y-offset, column detection, reading-order sort"; the reference itself only
relies on implicit block order (reference parsing_engine/layout_analyzer.py:17-31).

Implementation note: `array_sort(col)` on struct arrays sorts by fields in
declared order (kind first — wrong), so we sort with an explicit comparator
lambda on `offset`. Whole plan stays inside WholeStageCodegen: per-doc array
work, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def reading_order_col(spans: Column) -> Column:
    return F.array_sort(
        spans,
        lambda l, r: F.when(l["offset"] < r["offset"], F.lit(-1))
        .when(l["offset"] > r["offset"], F.lit(1))
        .otherwise(F.lit(0)),
    )


def reading_order_sort(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    return df.withColumn(spans_col, reading_order_col(F.col(spans_col)))
