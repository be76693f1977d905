"""Span classification: content / boilerplate / media-anchor — fully native.

Boilerpipe/Readability-style page-furniture + link-density rules (the
north_star's boilerplate stripper; authoritative semantics defined in
``semantics.classify_span`` and mirrored here as Catalyst higher-order
function expressions — JVM regex, no Python worker, no shuffle).

Output:
  clean_spans   — kept spans in reading order, offsets renumbered 0..n-1,
                  image spans re-kinded to 'media-anchor'
  blocks_kept   — size(clean_spans)
  blocks_dropped — size(spans) - blocks_kept
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.bind import bind_once
from ..semantics import (
    CONTACT_LINE_PAT,
    LINK_TOKEN_PAT,
    NAV_MENU_PAT,
    PAGE_FURNITURE_PAT,
    PY_WS_CHARS,
    PY_WS_JRE,
)

# Fast-path whitespace machinery: a regex character class containing
# codepoints > 0xFF drops Java regex off its ASCII fast path (measured
# ~1.4x on this whole stage, BENCH/ab_pyws.py methodology). Python-strip/
# split PARITY is still exact: ASCII_WS_JRE covers EVERY ASCII codepoint
# Python treats as whitespace (incl. \x1c-\x1f), so it is identical to
# the full PY_WS class on pure-ASCII strings; spans containing ANY
# non-ASCII char are detected with the O(1)-vs-O(n) octet/char length
# comparison (UTF-8 multibyte ⟺ non-ASCII) and routed to the full
# PY_WS class. The detector over-routes non-ASCII letters (accents,
# bullets) to the slow path — 0.25% of corpus spans, measured — which
# only costs time, never parity.
ASCII_WS_JRE = r"[\x{9}-\x{d}\x{1c}-\x{20}]"
_ASCII_PY_WS = {c for c in PY_WS_CHARS if ord(c) < 0x80}
assert _ASCII_PY_WS == set("\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f "), (
    "ASCII_WS_JRE must cover every ASCII Python-whitespace codepoint"
)

# The pattern strings are SHARED with the Python oracle (semantics.py
# compiles them with re.ASCII so \s \S \d \w \b mean the same ASCII
# classes as Java's defaults; `.` is spelled [^\n] in the shared source
# because Java-dot excludes more line terminators than Python-dot).
# Java `rlike` is a substring search; fullmatch patterns keep ^...$.
PAGE_FURNITURE_JRE = PAGE_FURNITURE_PAT
NAV_MENU_JRE = NAV_MENU_PAT
LINK_TOKEN_JRE = LINK_TOKEN_PAT
CONTACT_LINE_JRE = CONTACT_LINE_PAT

LINK_DENSITY_THRESHOLD = 0.5
LINK_DENSITY_MIN_TOKENS = 3


def _is_boilerplate(s: Column) -> Column:
    """Boilerplate predicate for one span struct (non-media).

    The trim and the link-density tokenizer must follow Python
    str.strip()/str.split() (the authoritative semantics) — Java \\s is
    ASCII-only and misses \\x1c-\\x1f, \\x85, \\xa0, U+2000.. which
    Python treats as whitespace (caught by the classify parity property
    test on '\\x1f'). Spans are routed per-row: a translate() charmap
    detects exotic Python-whitespace; only those spans pay the Unicode
    PY_WS_JRE regexes, the rest take the ASCII class (identical result
    on exotic-free strings, ~1.4x faster on this stage).

    The trimmed text (~5 references) and the token array (2 references)
    are bound ONCE per span via bind_once — this predicate runs inside a
    higher-order filter lambda, where every unbound reference re-runs
    its regex per element. The exotic detector (octet/char length
    compare, no regex) is deliberately NOT bound: recomputing it once
    per taken CASE branch is cheaper than another bind level (each
    extra single-element transform costs array alloc + element_at per
    span — measured)."""
    raw = F.coalesce(s["text"], F.lit(""))
    exotic = F.octet_length(raw) != F.length(raw)
    trimmed = F.when(
        exotic, F.regexp_replace(raw, f"^{PY_WS_JRE}+|{PY_WS_JRE}+$", "")
    ).otherwise(
        F.regexp_replace(raw, f"^{ASCII_WS_JRE}+|{ASCII_WS_JRE}+$", "")
    )

    def pred(text: Column) -> Column:
        def with_tokens(tokens: Column) -> Column:
            n_tokens = F.size(tokens)
            n_links = F.size(
                F.filter(tokens, lambda t: t.rlike(LINK_TOKEN_JRE))
            )
            link_farm = (n_tokens >= LINK_DENSITY_MIN_TOKENS) & (
                n_links > n_tokens * LINK_DENSITY_THRESHOLD
            )
            return F.when(F.length(text) == 0, F.lit(True)).otherwise(
                F.when(text.rlike(CONTACT_LINE_JRE), F.lit(False)).otherwise(
                    text.rlike(PAGE_FURNITURE_JRE)
                    | text.rlike(NAV_MENU_JRE)
                    | link_farm
                )
            )

        tokens_expr = F.when(
            exotic, F.split(text, f"{PY_WS_JRE}+")
        ).otherwise(F.split(text, f"{ASCII_WS_JRE}+"))
        return bind_once(tokens_expr, with_tokens)

    return bind_once(trimmed, pred)


def _is_media(s: Column) -> Column:
    return (s["kind"] == "image") | (
        s["media_ref"].isNotNull() & (s["media_ref"] != "")
    )


def clean_spans_col(spans: Column, renumber: bool = True) -> Column:
    """Filter boilerplate, re-kind media. renumber=True rewrites offsets
    0..n-1 (input must already be in reading order); renumber=False keeps
    the original geometric offsets for a downstream layout-inference pass
    (classification is per-span and order-free, so it can run BEFORE
    layout — that ordering keeps the whole filter in whole-stage codegen
    and lets the layout+FSM+entities UDF be the plan's only Python node)."""
    kept = F.filter(
        spans, lambda s: _is_media(s) | ~_is_boilerplate(s)
    )
    return F.transform(
        kept,
        lambda s, i: F.struct(
            F.when(_is_media(s), F.lit("media-anchor"))
            .otherwise(s["kind"])
            .alias("kind"),
            F.coalesce(s["text"], F.lit("")).alias("text"),
            s["media_ref"].alias("media_ref"),
            (i.cast("int") if renumber else s["offset"]).alias("offset"),
        ),
    )


def classify_spans(df: DataFrame, spans_col: str = "spans",
                   renumber: bool = True, barrier: bool = False) -> DataFrame:
    """Adds clean_spans + blocks_kept/blocks_dropped.

    barrier=True additionally wraps clean_spans in a single-element
    shuffle() — identity in fact, nondeterministic to the optimizer — so
    CollapseProject can NEVER inline this higher-order-function tree
    into a consumer. Required when a Python UDF will consume clean_spans
    (Spark cannot extract a UDF whose inlined argument carries lambda
    functions) and also guarantees the classify tree is evaluated once
    even when several consumers each reference it once.

    CAVEATS (documented optimizer contract): this relies on shuffle()
    being classified nondeterministic, which (a) could change in a future
    Spark release — the plan-shape assertions in test_plans.py will catch
    that; fall back to `spark.sql.optimizer.excludedRules =
    org.apache.spark.sql.catalyst.optimizer.CollapseProject` or an
    explicit .localCheckpoint() between classify and the consumer — and
    (b) marks clean_spans nondeterministic, so do NOT use the barriered
    column directly in a join/sort condition (derive a deterministic copy
    first)."""
    clean = clean_spans_col(F.col(spans_col), renumber=renumber)
    if barrier:
        clean = F.element_at(F.shuffle(F.array(clean)), 1)
    out = df.withColumn("clean_spans", clean)
    return (
        out.withColumn("blocks_kept", F.size("clean_spans"))
        .withColumn(
            "blocks_dropped", F.size(F.col(spans_col)) - F.col("blocks_kept")
        )
    )
