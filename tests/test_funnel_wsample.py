"""funnel and weighted_sample vs brute-force python references."""

import hashlib
import math
import random

from document_parser_private_spark.operators.curation import weighted_sample
from document_parser_private_spark.operators.funnel import funnel


def _mk_events(seed=11, n=600, users=25):
    rng = random.Random(seed)
    types = ["signup", "click", "purchase", "error"]
    return [(rng.randrange(users), i, rng.choice(types),
             rng.randrange(0, 100_000)) for i in range(n)]


def _py_funnel(rows, stages):
    out = {}
    by_user = {}
    for u, _, t, ts in rows:
        by_user.setdefault(u, []).append((t, ts))
    for u, evs in by_user.items():
        ts_list = []
        prev = None
        for s in stages:
            cand = [ts for t, ts in evs
                    if t == s and (prev is None or ts >= prev)]
            if not cand:
                break
            prev = min(cand)
            ts_list.append(prev)
        if ts_list:
            out[u] = ts_list
    return out


def test_funnel_matches_bruteforce(spark):
    rows = _mk_events()
    ev = spark.createDataFrame(
        rows, "user_id int, event_id int, event_type string, ts long")
    stages = ["signup", "click", "purchase"]
    got = {r.user_id: r for r in funnel(ev, stages).collect()}
    want = _py_funnel(rows, stages)
    assert set(got) == set(want)
    for u, ts_list in want.items():
        r = got[u]
        assert r.stages_completed == len(ts_list)
        for i, ts in enumerate(ts_list, start=1):
            assert getattr(r, f"t{i}") == ts
        for i in range(len(ts_list) + 1, 4):
            assert getattr(r, f"t{i}") is None


def test_funnel_order_constraint(spark):
    # purchase BEFORE the click must not count
    ev = spark.createDataFrame(
        [(1, 0, "signup", 10), (1, 1, "purchase", 20), (1, 2, "click", 30),
         (2, 3, "signup", 10), (2, 4, "click", 20), (2, 5, "purchase", 30)],
        "user_id int, event_id int, event_type string, ts long")
    got = {r.user_id: r for r in
           funnel(ev, ["signup", "click", "purchase"]).collect()}
    assert got[1].stages_completed == 2 and got[1].t3 is None
    assert got[2].stages_completed == 3 and got[2].t3 == 30


def _py_score(key, w):
    u = (int(hashlib.md5(str(key).encode()).hexdigest()[:13], 16) + 1.0) \
        / float(1 << 52)
    return round(math.log(u) / w, 6)


def test_weighted_sample_matches_bruteforce(spark):
    rng = random.Random(5)
    rows = [(i, f"s{i % 3}", rng.randrange(1, 500)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    got = sorted(
        (r.source, r.sample_rank, r.doc_id)
        for r in weighted_sample(df, k=4, weight_col="w",
                                 group_cols=["source"]).collect()
    )
    want = []
    for src in ("s0", "s1", "s2"):
        scored = sorted(
            ((-_py_score(i, w), i) for i, s, w in rows if s == src),
        )[:4]
        want += [(src, rank, i)
                 for rank, (_, i) in enumerate(scored, start=1)]
    assert got == sorted(want)


def test_weighted_sample_skew_and_determinism(spark):
    # one giant group, two runs identical, zero-weight rows excluded
    rows = [(i, "g", (i % 7) + 1) for i in range(3000)] + [(9999, "g", 0)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    a = sorted(r.doc_id for r in weighted_sample(
        df, k=10, weight_col="w", group_cols=["source"]).collect())
    b = sorted(r.doc_id for r in weighted_sample(
        df, k=10, weight_col="w", group_cols=["source"]).collect())
    assert a == b and len(a) == 10 and 9999 not in a


# --------------------------------------------------------- cohort_retention

def test_cohort_retention_matches_bruteforce(spark):
    import datetime as dt
    from collections import defaultdict

    from document_parser_private_spark.operators.funnel import (
        cohort_retention,
    )

    rng = random.Random(3)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(800):
        u = rng.randrange(40)
        ts = base + dt.timedelta(days=rng.randrange(20),
                                 seconds=rng.randrange(86400))
        rows.append((u, ts))
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp")

    first = {}
    active = defaultdict(set)
    for u, ts in rows:
        d = ts.date()
        first[u] = min(first.get(u, d), d)
        active[u].add(d)
    per = defaultdict(int)
    size = defaultdict(int)
    for u, c in first.items():
        size[c] += 1
    for u, days in active.items():
        for d in days:
            per[(first[u], (d - first[u]).days)] += 1
    want = {
        (c, age): (n, size[c], round(n / size[c], 6))
        for (c, age), n in per.items()
    }
    got = {
        (r.cohort, r.age):
            (r.active_users, r.cohort_size, r.retention_rate)
        for r in cohort_retention(ev, granularity="day").collect()
    }
    assert got == want
    assert all(age == 0 or v[2] <= 1.0 for (c, age), v in got.items())
