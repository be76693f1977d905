"""As-of join: match each left row to the most recent right row
at-or-before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive
formulations — a range theta-join (quadratic per key) or a per-key
LATERAL/limit-1 subquery (not expressible) — do not scale. This
operator uses the classic union-and-window formulation instead:

  1. Tag right rows side=0, left rows side=1, union on (keys, ts).
  2. One window per key, ordered by (ts, side, right-payload), frame
     = unbounded preceding .. current row.
  3. last(right_payload, ignorenulls) gives, at every left row, the
     latest right row with right.ts <= left.ts (side ordering puts
     equal-ts right rows BEFORE the left row, so "at-or-before" is
     inclusive; among equal-ts right rows the payload-struct ordering
     makes the winner deterministic: greatest payload tuple).
  4. Keep left rows, unpack the matched payload.

Cost: ONE shuffle on the join keys (the union sorts within each key
partition) — the same price as a plain equi-join, independent of time
range or match distance. At 100 TB both inputs partition by key; a
hot key degrades to a big sort, not a cross product. Matches
DuckDB's `ASOF JOIN` semantics with an explicit deterministic
tie-break (greatest (ts, payload...) wins).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str,
              right_cols: Sequence[str] | None = None,
              prefix: str = "m_") -> DataFrame:
    """Left as-of join: every left row, plus `prefix`-renamed columns of
    the most recent right row with right_ts <= left_ts and equal `on`
    keys (NULLs when no right row precedes). Ties on right_ts resolve
    to the greatest (right_ts, *right_cols) tuple — deterministic.

    `right_cols` defaults to all right columns except the keys; the
    right timestamp is always included as `{prefix}{right_ts}`.
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in on and c != right_ts]
    pay_fields = [right_ts, *[c for c in right_cols if c != right_ts]]

    pay = F.struct(*[F.col(c).alias(c) for c in pay_fields])
    # A NULL right_ts can never satisfy right_ts <= left_ts, but under
    # asc-nulls-first ordering it would sort before every left row and
    # carry a non-null payload into last(ignorenulls) — drop it here so
    # the contract (and the LATERAL ... WHERE p.ts <= l.ts twin) holds.
    right = right.where(F.col(right_ts).isNotNull())
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        pay.alias("_asof_pay"),
    )
    left_cols = left.columns
    l = left.select(  # noqa: E741
        *[F.col(c) for c in left_cols],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
    )
    pay_type = r.schema["_asof_pay"].dataType
    l = l.withColumn("_asof_pay", F.lit(None).cast(pay_type))  # noqa: E741
    r_aligned = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols
          if c not in on],
        *[F.col(c) for c in on],
        "_asof_ts", "_asof_side", "_asof_pay",
    ).select(*left_cols, "_asof_ts", "_asof_side", "_asof_pay")

    u = l.select(*left_cols, "_asof_ts", "_asof_side", "_asof_pay") \
        .unionByName(r_aligned)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_ts").asc(), F.col("_asof_side").asc(),
                 F.col("_asof_pay").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "_asof_match", F.last("_asof_pay", ignorenulls=True).over(w)
    ).where(F.col("_asof_side") == 1)
    return matched.select(
        *left_cols,
        *[F.col(f"_asof_match.{c}").alias(f"{prefix}{c}")
          for c in pay_fields],
    )
