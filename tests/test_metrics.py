"""Pins for the fuzzy_eval driver oracle (A5 fuzzy variant).

The DuckDB twin of the `fuzzy_eval` query carries the scorer's expected
output as literals (_FUZZY_EVAL_SIMS). This test recomputes them through
semantics.token_set_ratio so any change to the scorer breaks HERE, loudly,
instead of silently hash-mismatching in the driver's correctness gate.
"""

from document_parser_private_spark.semantics import token_set_ratio


def test_fuzzy_eval_pinned_sims():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert len(mod._FUZZY_EVAL_PAIRS) == len(mod._FUZZY_EVAL_SIMS)
    got = [token_set_ratio(p, t) for p, t in mod._FUZZY_EVAL_PAIRS]
    assert got == mod._FUZZY_EVAL_SIMS
    # the pinned pairs must keep exercising every scorer branch
    assert 100.0 in mod._FUZZY_EVAL_SIMS       # equal/subset token sets
    assert 0.0 in mod._FUZZY_EVAL_SIMS         # empty-side edge
    assert any(0.0 < s < 100.0 for s in mod._FUZZY_EVAL_SIMS)  # partial
