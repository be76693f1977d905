"""Ordered funnel analysis over an event stream.

"Of the users who did stage 1, how many went on to do stage 2 AFTER
stage 1, then stage 3 after that?" — the sequential constraint (each
stage's timestamp must be >= the previous stage's chosen timestamp) is
what separates a funnel from three independent filters, and it is what
makes the naive formulations scale-hostile:

  - collect_list(events) per user + a per-user scan buffers every
    event of a hot user in one aggregation buffer;
  - a self-join per consecutive stage pair explodes on users with many
    events per stage.

This operator computes the canonical greedy funnel (earliest possible
timestamp at every stage, which maximizes completion counts) as ONE
hash aggregation per stage: stage i is a min(ts) over the stage-i
events joined to the stage-(i-1) frontier, filtered to ts >= t_{i-1}.
Every groupBy keys on the user id, so after the first exchange the
data is already co-partitioned; per-stage state is one row per user —
no buffers, no explosion, hot users cost the same as cold ones.

Greedy-earliest is exactly right: taking the earliest valid timestamp
at each stage dominates any other choice (it can only admit a superset
of later-stage matches), so `stage_ts[i] IS NOT NULL` == "user
completed stages 0..i in order".

Reference scope note: the reference engine has no event-stream
analytics (verified); beyond-reference tier alongside the events-table
sessionization/as-of/window operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel", "cohort_retention"]


def funnel(events: DataFrame, stages: Sequence[str],
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts") -> DataFrame:
    """Per-user funnel: one row per user who reached stage 1, with
    `t1..tn` (earliest valid timestamp per stage, NULL once the user
    drops out) and `stages_completed`.
    """
    stages = list(stages)
    if not stages:
        raise ValueError("funnel needs at least one stage")
    # Each iteration references the previous frontier TWICE (the nxt
    # aggregation and the left join) — unpersisted, Catalyst inlines
    # the subtree per reference and the events table is re-scanned
    # 2^(n_stages-1) times (14 scans for 3 stages; PLANS.md §21).
    # Persist each frontier (user-level rows, tiny next to events),
    # materialize the result with an eager localCheckpoint, release
    # the caches before returning — the pagerank/triangle pattern.
    frontier = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
        .persist()
    )
    cached = [frontier]
    try:
        for i, stage in enumerate(stages[1:], start=2):
            nxt = (
                events.where(F.col(type_col) == stage)
                .select(user_col, F.col(ts_col).alias("_f_ts"))
                .join(frontier.select(user_col, F.col(f"t{i - 1}")),
                      user_col)
                .where(F.col("_f_ts") >= F.col(f"t{i - 1}"))
                .groupBy(user_col)
                .agg(F.min("_f_ts").alias(f"t{i}"))
                .select(user_col, f"t{i}")
            )
            frontier = frontier.join(nxt, user_col, "left").persist()
            cached.append(frontier)
        # deepest non-null stage wins: test greatest-first
        completed = F.coalesce(
            *[F.when(F.col(f"t{i}").isNotNull(), F.lit(i))
              for i in range(len(stages), 0, -1)],
            F.lit(0),
        )
        out = frontier.withColumn(
            "stages_completed", completed.cast("int")
        ).localCheckpoint()
    finally:
        for c in cached:
            c.unpersist()
    return out


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     granularity: str = "month") -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period
    (month or day) of their first event; a cohort's age-k cell counts
    how many of its users were active (any event) k periods later.

    Scale shape: (user, period) activity is collapsed with DISTINCT
    before anything else, so a user firing a million events in a
    period contributes ONE row downstream; the cohort join is
    user-keyed (co-partitioned with the activity collapse), and the
    final cohort_size join is a broadcast — cohorts are a
    calendar-sized dim no matter how many users exist.
    """
    if granularity not in ("month", "day"):
        raise ValueError("granularity must be 'month' or 'day'")
    period = F.date_trunc(granularity, F.col(ts_col))
    # `first` feeds both the activity join and the cohort-size agg —
    # persist it or the events table is scanned once per reference
    # (PLANS.md §21); user-level rows, tiny next to events.
    first = (
        events.groupBy(user_col)
        .agg(F.min(period).alias("cohort"))
        .persist()
    )
    try:
        activity = events.select(F.col(user_col),
                                 period.alias("p")).distinct()
        if granularity == "month":
            age = F.months_between(F.col("p"), F.col("cohort")).cast("int")
        else:
            age = F.datediff(F.col("p"), F.col("cohort")).cast("int")
        per = (
            activity.join(first, user_col)
            .groupBy("cohort", age.alias("age"))
            .agg(F.count(F.lit(1)).alias("active_users"))
        )
        sizes = first.groupBy("cohort").agg(
            F.count(F.lit(1)).alias("cohort_size")
        )
        out = (
            per.join(F.broadcast(sizes), "cohort")
            .select(
                F.col("cohort").cast("date").alias("cohort"),
                "age",
                F.col("active_users").cast("long").alias("active_users"),
                F.col("cohort_size").cast("long").alias("cohort_size"),
                F.round(
                    F.col("active_users") * 1.0 / F.col("cohort_size"), 6
                ).alias("retention_rate"),
            )
        ).localCheckpoint()
    finally:
        first.unpersist()
    return out
