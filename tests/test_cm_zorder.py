"""Unit tests for the count-min sketch and Z-order codes, against
pure-Python replicas of the portable md5/bit contracts."""

import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from document_parser_private_spark.functions.zorder import (
    ZORDER_BITS,
    cluster_by_zorder,
    zorder_code_col,
)
from document_parser_private_spark.operators.sketch import (
    CM_DEPTH,
    CM_WIDTH,
    cm_estimate,
    count_min_sketch,
)


def _py_cm_cells(value):
    out = []
    for r in range(CM_DEPTH):
        h = hashlib.md5(f"cm{r}:{value}".encode()).hexdigest()
        out.append((r, int(h[:5], 16) % CM_WIDTH))
    return out


def test_count_min_upper_bound_and_replica(spark):
    vals = [f"w{i % 37}" for i in range(500)] + ["hot"] * 200
    df = spark.createDataFrame([(v,) for v in vals], "val string")
    sketch = count_min_sketch(df, "val")
    # replica of the counter table
    cells = defaultdict(int)
    for v in vals:
        for rc in _py_cm_cells(v):
            cells[rc] += 1
    got_cells = {
        (r["cm_row"], r["cm_col"]): r["cnt"] for r in sketch.collect()
    }
    assert got_cells == dict(cells)
    items = spark.createDataFrame(
        [(v,) for v in sorted(set(vals))], "item string")
    est = {r["item"]: r["cm_count"]
           for r in cm_estimate(sketch, items).collect()}
    exact = Counter(vals)
    for v, e in exact.items():
        assert est[v] >= e  # count-min never underestimates
    assert est["hot"] == 200 or est["hot"] > 200


def test_cm_estimate_unseen_item(spark):
    df = spark.createDataFrame([("a",)], "val string")
    sketch = count_min_sketch(df, "val")
    items = spark.createDataFrame([("zzz-unseen",)], "item string")
    [row] = cm_estimate(sketch, items).collect()
    assert row["cm_count"] in (0, 1)  # 0 unless all 4 cells collide


def _py_z(x, y, bits=ZORDER_BITS):
    code = 0
    for i in range(bits):
        code |= ((x >> i) & 1) << (2 * i)
        code |= ((y >> i) & 1) << (2 * i + 1)
    return code


def test_zorder_matches_python(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 65535, 70000)
            for y in (0, 3, 1023)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_code_col(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _py_z(x, y)


def test_cluster_by_zorder_partitions_are_code_ranges(spark):
    rows = [(i, (i * 13) % 64, (i * 7) % 64) for i in range(256)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = cluster_by_zorder(df, "x", "y", num_partitions=4)
    parts = out.select(
        F.spark_partition_id().alias("p"), "zcode"
    ).collect()
    by_p = defaultdict(list)
    for r in parts:
        by_p[r["p"]].append(r["zcode"])
    # range partitioning => per-partition code intervals do not overlap
    spans = sorted((min(v), max(v)) for v in by_p.values())
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2
