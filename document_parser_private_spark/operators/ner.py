"""Deterministic NER slot (SURVEY §2.10 U5): ORG / LOC / JOB_TITLE
entity extraction filling the reference's NER-pipeline position with a
reproducible heuristic chain instead of an ML model.

The reference (entity_extractor.py:17) loads a BERT NER pipeline and
consults it FIRST at every extraction site, falling back to regexes when
the model finds nothing (entity_extractor.py:191-214 company/position,
:289-301 institution, :79-82 contact location). The model path is
nondeterministic and needs weights this environment doesn't ship, so the
engine's golden semantics use the regex chain (SURVEY §7.3) — but that
left the NER *slot* empty: free-form text where the fallback regexes
miss got nothing. This operator fills the slot deterministically:

  ORG       — capitalized phrase ending in a company suffix (the
              reference's own fallback suffix list, entity_extractor.py
              :197) plus institution shapes ("X University",
              "University of X", :294);
  LOC       — capitalized unigram/bigram candidates joined against a
              broadcast gazetteer table (pluggable: pass your own
              DataFrame; at cluster scale this is the standard
              broadcast-dim pattern, a ~100k-place gazetteer is a few MB);
  JOB_TITLE — the reference's position fallback list
              (entity_extractor.py:211) case-insensitively.

Everything except the gazetteer join is native regexp codegen; the join
broadcasts the gazetteer so the fact side never shuffles. All patterns
are ASCII and mirrored exactly in the DuckDB twin (driver query
`ner_entities`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Company-suffix ORG shape — suffix list from the reference's fallback
# (entity_extractor.py:197); the name grammar is a defined token
# sequence (capitalized words, optional &/digits) rather than the
# reference's greedy [A-Za-z0-9\s,.-]+ so matches can't swallow commas.
ORG_RE = (
    r"\b([A-Z][A-Za-z0-9&-]*(?: [A-Z][A-Za-z0-9&-]*)*"
    r" (?:Inc|LLC|Co|Company|Group|Corp|Corporation|Ltd|Limited))\b"
)
# Institution shapes (entity_extractor.py:294 keyword list)
INST_RE = (
    r"\b((?:University|College|Institute|School|Academy) of"
    r" [A-Z][A-Za-z]*(?: [A-Z][A-Za-z]*)?"
    r"|[A-Z][A-Za-z]*(?: [A-Z][A-Za-z]*)?"
    r" (?:University|College|Institute|School|Academy))\b"
)
# Position fallback list (entity_extractor.py:211), case-insensitive
TITLE_RE = (
    r"(?i)\b(software engineer|developer|data scientist|project manager"
    r"|analyst|consultant)\b"
)
# LOC candidates: every contiguous 1..3-word subspan of each maximal
# capitalized run (r5 — the old bigram-preferred extraction could never
# surface "New York City"-class trigrams, and a greedy trigram regex
# would have swallowed "New York" inside "New York Stock"; emitting all
# subspans keeps both). Candidate order = run order, then start, then
# length — mirrored exactly by the twin's row_number.
RUN_RE = r"\b([A-Z][a-z]+(?: [A-Z][a-z]+)*)\b"
LOC_MAX_NGRAM = 3

# Default gazetteer — deterministic, intentionally small; production
# passes a real places table to `gazetteer`.
DEFAULT_GAZETTEER = (
    "United States", "Canada", "Germany", "France", "India", "Japan",
    "Brazil", "Australia", "Netherlands", "Singapore", "South Africa",
    "New York", "San Francisco", "Seattle", "Austin", "Boston",
    "London", "Berlin", "Paris", "Amsterdam", "Tokyo", "Toronto",
    "Sydney", "Bangalore", "Cape Town", "Johannesburg", "Remote",
    "New York City", "Salt Lake City",
)


def _matches(text: Column, pattern: str, group: int = 1) -> Column:
    return F.regexp_extract_all(text, F.lit(pattern), F.lit(group))


def loc_candidates_col(text: Column) -> Column:
    """All 1..{LOC_MAX_NGRAM}-word contiguous subspans of every maximal
    capitalized run, in (run, start, length) order. Pure HOF expression;
    the per-run word split is bound once (PLANS.md §5)."""
    from ..functions.bind import bind_once

    def spans_of_run(run: Column) -> Column:
        def with_ws(ws: Column) -> Column:
            return F.flatten(F.transform(
                F.sequence(F.lit(1), F.size(ws)),
                lambda i: F.transform(
                    F.sequence(i, F.least(i + F.lit(LOC_MAX_NGRAM - 1),
                                          F.size(ws))),
                    lambda j: F.array_join(F.slice(ws, i, j - i + 1), " "),
                ),
            ))

        return bind_once(F.split(run, " "), with_ws)

    return F.flatten(F.transform(_matches(text, RUN_RE), spans_of_run))


def ner_extract(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                gazetteer: DataFrame | None = None) -> DataFrame:
    """(id, text) -> (id, entity_group, match_idx, entity): every ORG /
    LOC / JOB_TITLE hit, match_idx = first-match order within its group
    (the reference's extractors take the first entity of a group —
    min(match_idx) reproduces that)."""
    spark = df.sparkSession
    base = df.select(F.col(id_col), F.col(text_col).alias("_t"))

    def exploded(col: Column, grp: str) -> DataFrame:
        return base.select(
            F.col(id_col),
            F.lit(grp).alias("entity_group"),
            F.posexplode(col).alias("match_idx", "entity"),
        )

    orgs = exploded(
        F.concat(_matches(F.col("_t"), ORG_RE),
                 _matches(F.col("_t"), INST_RE)),
        "ORG",
    )
    titles = exploded(_matches(F.col("_t"), TITLE_RE), "JOB_TITLE")

    gaz = gazetteer if gazetteer is not None else spark.createDataFrame(
        [(p,) for p in DEFAULT_GAZETTEER], "place string")
    cands = exploded(loc_candidates_col(F.col("_t")), "LOC")
    locs = (
        cands.join(F.broadcast(gaz), cands["entity"] == gaz["place"],
                   "left_semi")
    )
    return orgs.unionByName(titles).unionByName(locs)


def extract_company_col(text: Column) -> Column:
    """First ORG by the deterministic NER chain, else empty — the slot
    entity_extractor.py:191-200 fills with NER-then-regex."""
    return F.regexp_extract(text, ORG_RE, 1)


def extract_position_col(text: Column) -> Column:
    """First JOB_TITLE (entity_extractor.py:202-214 fallback list)."""
    return F.regexp_extract(text, TITLE_RE, 1)
