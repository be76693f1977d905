"""Range (interval) join: match point rows to interval rows they fall in.

Spark's optimizer turns `ON p.key = i.key AND p.ts >= i.start AND
p.ts < i.end` into an equi-join ONLY on the key; every range predicate
is a post-join filter, so a hot key degrades to a per-key cross product
(BroadcastNestedLoopJoin without the equi key). Databricks ships a
closed-source range-join hint for exactly this gap; this operator is
the open equivalent:

  1. Pick a bucket width W (caller-supplied, in the units of the range
     column — e.g. seconds for timestamps).
  2. Each interval row explodes into the buckets it covers:
     sequence(floor(start/W), floor((end-ε)/W)). Intervals are expected
     to be SHORT relative to W (a few buckets); `max_buckets` caps the
     explosion so a degenerate giant interval cannot flood the join
     (rows over the cap are dropped and counted via an accumulator-free
     contract: callers filter them beforehand; we hard-cap defensively).
  3. Points compute their single bucket floor(ts/W).
  4. Equi-join on (keys..., bucket) — a plain shuffled/broadcast hash
     join Catalyst can plan and AQE can skew-split — then the exact
     range predicate filters the candidates.

A point matches an interval in exactly one of the interval's buckets
(the point's own), so no dedup pass is needed — the bucket equality is
a partition of the match space, not an over-approximation per pair.

Cost: ONE equi-join shuffle over ~(interval_rows x avg_buckets +
point_rows) keyed rows. At 100 TB both sides partition by (key,
bucket); candidate count per task is bounded by bucket population, not
by key population. Skewed buckets fall to AQE skew-join splitting.

Reference parity: the reference engine has no interval join; this is
beyond-reference scale tooling (same tier as the as-of join,
operators/asof.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(points: DataFrame, intervals: DataFrame,
               on: Sequence[str], point_col: str,
               start_col: str, end_col: str,
               bucket_width: int | float,
               max_buckets: int = 64,
               on_truncate: str = "allow") -> DataFrame:
    """Inner range join: every (point, interval) pair with equal `on`
    keys and start_col <= point_col < end_col (half-open, the SQL
    `ts >= start AND ts < end` contract).

    `point_col` / `start_col` / `end_col` must be numeric in the same
    units (cast timestamps with unix_timestamp/epoch first).
    `bucket_width` is the equi-join granule; intervals spanning more
    than `max_buckets` granules are truncated to their first
    `max_buckets` (defensive flood cap — size W so real intervals fit).
    `on_truncate='error'` makes the cap loud instead: any interval
    wider than the cap horizon fails the job (use when silent match
    loss is unacceptable at a new call site).
    Output: all point columns + all interval columns (keys appear once,
    from the point side).
    """
    assert on_truncate in ("allow", "error")
    on = list(on)
    w = F.lit(bucket_width)
    # Half-open end: an interval ending exactly on a bucket boundary
    # does not cover that bucket (no point < end lives there). Derived
    # type-independently (floor(end/W), stepped back one bucket when
    # end is an exact multiple) — the former `end - 1` integer form
    # silently dropped the last bucket when fractional end values met
    # an integer bucket_width; identical on all-integer inputs.
    first_b = F.floor(F.col(start_col) / w)
    last_b = F.floor(F.col(end_col) / w) - F.when(
        F.col(end_col) % w == 0, F.lit(1)
    ).otherwise(F.lit(0))
    if on_truncate == "error":
        last_b = F.when(
            last_b - first_b >= F.lit(max_buckets),
            F.raise_error(F.concat(
                F.lit("range_join: interval wider than max_buckets * "
                      "bucket_width at "),
                F.col(start_col).cast("string"), F.lit(".."),
                F.col(end_col).cast("string"),
            )),
        ).otherwise(last_b)
    last_b = F.least(last_b, first_b + F.lit(max_buckets - 1))
    iv = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "_rj_bucket", F.explode(F.sequence(first_b, last_b))
    )
    pt = points.withColumn("_rj_bucket", F.floor(F.col(point_col) / w))

    iv_cols = [c for c in intervals.columns if c not in on]
    joined = pt.join(
        iv.select(*on, "_rj_bucket", *iv_cols),
        on=[*on, "_rj_bucket"],
    ).where(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    return joined.select(*points.columns, *iv_cols)
