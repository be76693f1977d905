"""Property test: the pruned best_fuzzy_match is EXACTLY the naive argmax
scan (the upper bounds must never skip a winning candidate)."""

import random

from hypothesis import given, settings, strategies as st

from document_parser_private_spark import semantics as S


def naive_best(query, index, threshold):
    best_score, best = -1.0, None
    for cand in index:
        s = S.wratio(query, cand)
        if s > best_score:
            best_score, best = s, cand
    return best if best is not None and best_score >= threshold else None


WORDS = ["python", "java", "spark", "docker", "aws", "sql", "dev",
         "senior", "3", "x", "batch", "job", "maintained", "using",
         "pythn", "jva", "sprk"]


@st.composite
def phrase(draw):
    n = draw(st.integers(1, 6))
    return " ".join(draw(st.sampled_from(WORDS)) for _ in range(n))


@given(
    q=phrase(),
    idx=st.lists(phrase(), min_size=1, max_size=20),
    thr=st.sampled_from([60.0, 80.0, 85.0, 90.0]),
)
@settings(max_examples=300, deadline=None)
def test_pruned_equals_naive(q, idx, thr):
    assert S.best_fuzzy_match(q, idx, thr) == naive_best(q, idx, thr)


def test_pruned_equals_naive_random_chars():
    rng = random.Random(1)
    alphabet = "abcdef ghij"
    for _ in range(300):
        q = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 25)))
        idx = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 25)))
            for _ in range(rng.randint(1, 15))
        ]
        thr = rng.choice([50.0, 75.0, 80.0, 90.0])
        assert S.best_fuzzy_match(q, idx, thr) == naive_best(q, idx, thr), (q, idx, thr)


def test_index_cache_is_content_keyed():
    """Regression: the token cache must not serve stale data when a new
    same-length list reuses a freed list's address (id() keying bug)."""
    idx1 = ["python one two", "java three four"]
    assert S.best_fuzzy_match("pythn one two", idx1, 60.0) == "python one two"
    del idx1
    # different content, same length — must be recomputed, not aliased
    idx2 = ["completely unrelated", "nothing matches here"]
    assert S.best_fuzzy_match("pythn one two", idx2, 90.0) is None
    idx3 = ["pythn one two", "another candidate x"]
    assert S.best_fuzzy_match("pythn one two", idx3, 90.0) == "pythn one two"


LONG_WORDS = WORDS + ["microservices", "infrastructure", "observability",
                      "kubernetes", "application"]


@st.composite
def long_phrase(draw):
    n = draw(st.integers(6, 14))
    return " ".join(draw(st.sampled_from(LONG_WORDS)) for _ in range(n))


@given(
    q=st.one_of(phrase(), long_phrase()),
    idx=st.lists(st.one_of(phrase(), long_phrase()), min_size=1, max_size=15),
    thr=st.sampled_from([60.0, 80.0, 85.0, 90.0]),
)
@settings(max_examples=300, deadline=None)
def test_pruned_equals_naive_length_divergent(q, idx, thr):
    """Short-vs-long pairs hit the partial branch (len_ratio >= 1.5, and
    >= 8 for 1-word vs 14-word extremes) — bounds must stay exact."""
    assert S.best_fuzzy_match(q, idx, thr) == naive_best(q, idx, thr)


def test_wratio_partial_branch_shape():
    """The public WRatio shape: at len_ratio >= 1.5 partial scorers take
    over — a short skill appearing verbatim inside a long bullet scores
    0.9 * partial_ratio(=100) = 90; at len_ratio >= 8 the scale drops to
    0.6 (60). The shared-token-only floor (no substring window) is
    0.95 * 0.9 * 100 = 85.5."""
    bullet = "maintained python batch jobs on a large cluster"  # 48 chars
    assert S.wratio("python", bullet) == 90.0
    giant = bullet + " with monitoring dashboards and alerts"    # > 8x of 'aws'
    assert len(giant) / 3 >= 8
    giant2 = giant.replace("cluster", "aws cluster")
    assert S.wratio("aws", giant2) == 60.0
    # shared token but NO contiguous window (token reordering breaks the
    # substring): the 0.95 * 0.9 * 100 token floor is what remains
    q = "learning machine"
    cand = "machine learning pipelines deployed at scale"
    assert S.wratio(q, cand) >= 85.5
    # misspelled substring: partial_ratio finds the best window
    assert S.wratio("pythn", "maintained python batch jobs") >= 0.9 * 80.0
    # disjoint everything stays low
    assert S.wratio("zzz", bullet) < 30.0


def test_partial_ratio_window_semantics():
    # exact substring -> perfect window
    assert S._partial_ratio("spark", "running spark jobs") == 100.0
    # one-char-off substring of a much longer string
    assert S._partial_ratio("sparc", "running spark jobs") == 80.0
    assert S._partial_ratio("", "") == 100.0
    assert S._partial_ratio("", "abc") == 0.0
    # symmetric in argument order
    assert S._partial_ratio("running spark jobs", "spark") == 100.0
