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


def test_fuzzy_expected_pinned_resolutions():
    """_FUZZY_EXPECTED (the skill_fuzzy_join twin's miss->canonical map)
    must equal what best_fuzzy_match actually resolves over the ontology
    index at threshold 80 — a scorer tweak must fail HERE, not as an
    opaque value-hash mismatch in the driver gate."""
    import __spark_entry__ as mod
    from document_parser_private_spark.corpus import SKILLS_ONTOLOGY
    from document_parser_private_spark.oracle import build_skill_index
    from document_parser_private_spark.semantics import best_fuzzy_match

    _, v2c, index = build_skill_index(SKILLS_ONTOLOGY)
    for miss, canonical in mod._FUZZY_EXPECTED.items():
        match = best_fuzzy_match(miss, index, 80.0)
        assert match is not None, miss
        assert v2c.get(match, match) == canonical, (miss, match)
    # below-threshold passthrough case stays below threshold
    assert best_fuzzy_match("tensorflw", index, 80.0) is None
