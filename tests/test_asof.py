"""As-of join tests: handcrafted edge cases (inclusive boundary, ties,
no-match, key isolation) plus a randomized parity check against a naive
pure-Python reference."""

import random
from datetime import datetime, timedelta

from document_parser_private_spark.operators.asof import asof_join

T0 = datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + timedelta(minutes=minutes)


def _py_asof(left, right):
    """left: (lid, key, ts); right: (key, ts, rid, val) ->
    {lid: (ts, rid, val) | None}, tie -> greatest (ts, rid, val)."""
    out = {}
    for lid, key, lts in left:
        cands = [(rts, rid, val) for k, rts, rid, val in right
                 if k == key and rts <= lts]
        out[lid] = max(cands) if cands else None
    return out


def _run(spark, left, right):
    ldf = spark.createDataFrame(left, "lid long, key long, ts timestamp")
    rdf = spark.createDataFrame(
        right, "key long, ts timestamp, rid long, val double")
    got = asof_join(ldf, rdf, on=["key"], left_ts="ts", right_ts="ts",
                    right_cols=["rid", "val"]).collect()
    return {
        r["lid"]: (None if r["m_ts"] is None
                   else (r["m_ts"], r["m_rid"], r["m_val"]))
        for r in got
    }


def test_asof_join_edges(spark):
    left = [
        (1, 10, _ts(5)),    # normal: matches rid 100 at t=3
        (2, 10, _ts(3)),    # inclusive boundary: equal ts matches
        (3, 10, _ts(2)),    # before any right row -> NULL
        (4, 20, _ts(9)),    # tie at t=7: greatest rid wins (201)
        (5, 30, _ts(9)),    # key with no right rows at all -> NULL
    ]
    right = [
        (10, _ts(3), 100, 1.0),
        (10, _ts(4), 101, 2.0),
        (20, _ts(7), 200, 3.0),
        (20, _ts(7), 201, 4.0),
    ]
    got = _run(spark, left, right)
    assert got[1] == (_ts(4), 101, 2.0)
    assert got[2] == (_ts(3), 100, 1.0)
    assert got[3] is None
    assert got[4] == (_ts(7), 201, 4.0)
    assert got[5] is None
    assert len(got) == len(left)  # left join: every left row survives


def test_asof_join_random_parity(spark):
    rng = random.Random(7)
    left = [(i, rng.randrange(6), _ts(rng.randrange(200)))
            for i in range(120)]
    right = [(rng.randrange(6), _ts(rng.randrange(200)), 1000 + j,
              float(rng.randrange(50)))
             for j in range(150)]
    assert _run(spark, left, right) == _py_asof(left, right)


def test_asof_join_default_right_cols(spark):
    ldf = spark.createDataFrame([(1, 10, _ts(5))],
                                "lid long, key long, ts timestamp")
    rdf = spark.createDataFrame([(10, _ts(3), 9, 1.5)],
                                "key long, ts timestamp, rid long, val double")
    out = asof_join(ldf, rdf, on=["key"], left_ts="ts", right_ts="ts")
    assert set(out.columns) == {"lid", "key", "ts", "m_ts", "m_rid", "m_val"}
