"""Bloom-filter semi-join reduction — prune a huge probe side early.

At 100 TB the canonical shape "filter fact rows to those whose key
exists in a (still large) build side" costs a full shuffle of the fact
table into a shuffled hash join. A Bloom filter built from the build
side and broadcast to the scan cuts that: probe rows whose k hash
positions are not ALL set can be dropped AT THE SCAN, before any
shuffle, at the price of a controlled false-positive rate
(~(1 - e^{-kn/m})^k). Spark's own runtime-filter feature
(spark.sql.optimizer.runtime.bloomFilter.enabled) injects this
opportunistically; this operator makes it an explicit, deterministic,
engine-portable primitive the caller controls (and the DuckDB oracle
can replay bit for bit).

Hash contract (mirrors operators/sketch.py — md5, not engine-native
hashes, which differ between Spark and DuckDB):

  pos_i(key) = int(md5(cast(key as string) || '#' || i)[0:8], 16) % m
  for i in 0..k-1; the filter is the distinct set of set positions.

The "bitmap" stays a relational table of <= m distinct positions — no
driver-side collect, no binary blob; broadcast-joined it is exactly the
bitmap lookup, and it unions/merges across builds by construction.

Reference scope: no bloom/semi-join reduction exists in the reference
engine (pure single-node); this is beyond-reference scale tooling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_prune"]

BLOOM_M = 8192   # default bits
BLOOM_K = 4      # default hash count


def _pos_col(value: Column, i: int, m_bits: int) -> Column:
    h = F.md5(F.concat(value.cast("string"), F.lit(f"#{i}")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(m_bits)
    ).cast("int")


def bloom_build(keys: DataFrame, key_col: str,
                m_bits: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Build the filter from a key set: one `pos` column, <= m_bits
    distinct rows. Map-side partial distinct collapses duplicate keys
    before the (tiny) shuffle; the result is broadcastable by size
    construction (m_bits rows max, one int each)."""
    v = F.col(key_col)
    return (
        keys.select(
            F.explode(F.array(*[_pos_col(v, i, m_bits) for i in range(k)]))
            .alias("pos")
        )
        .distinct()
    )


def bloom_prune(probe: DataFrame, probe_col: str, bloom: DataFrame,
                m_bits: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Keep probe rows whose key passes the filter (all k positions
    set). Adds `bloom_pass` (int 0/1) rather than filtering, so callers
    can audit the false-positive rate; filter on it for the prune.

    Plan shape: k broadcast-hash LEFT joins, one per hash — each probe
    row looks up each of its k positions in the (distinct, <= m_bits
    row) position table, so no row ever multiplies and the probe side
    NEVER shuffles; the only exchange is the tiny broadcast. Works
    unchanged as the pre-filter in front of any shuffled join.
    """
    v = F.col(probe_col)
    out = probe
    pass_expr = F.lit(True)
    for i in range(k):
        hit = f"_bl_p{i}"
        out = out.withColumn(hit + "q", _pos_col(v, i, m_bits)).join(
            F.broadcast(bloom.select(F.col("pos").alias(hit))),
            on=F.col(hit + "q") == F.col(hit),
            how="left",
        ).drop(hit + "q")
        pass_expr = pass_expr & F.col(hit).isNotNull()
    return out.withColumn("bloom_pass", pass_expr.cast("int")).drop(
        *[f"_bl_p{i}" for i in range(k)]
    )
