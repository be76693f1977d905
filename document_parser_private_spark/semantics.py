"""Deterministic reference-semantics core (pure Python, no Spark).

This module is the single source of truth for the *per-document* sequential
logic that cannot be a Catalyst expression: the section-detection FSM, the
block classifier, date parsing, and the normalizer chains. It is consumed
from two places:

  1. ``oracle.py`` — the golden-fixture generator used by the tests, and
  2. the vectorized pandas-UDF operators (``operators/sections.py`` etc.),
     which call these functions per document while Arrow batches documents
     across the partition.

Everything here is a from-scratch reimplementation of the *behavior* of the
reference pipeline (amos-maganyane/document-parser-private); citations point
at the behavior being mirrored:

  - section FSM            -> reference parsing_engine/section_detector.py:31-107
  - heading match + retry  -> reference parsing_engine/section_detector.py:109-133
  - date-pattern inference -> reference parsing_engine/section_detector.py:151-161
  - heading classifier     -> reference parsing_engine/pdf_parser.py:215-219
  - date normalization     -> reference normalization/date_normalizer.py:33-144
                              (deterministic subset: no dateparser; 'Present'
                              pinned to an explicit ``as_of`` date)
  - skills/degrees/titles  -> reference normalization/{skill,education,
                              experience}_normalizer.py (regex chains +
                              fuzzy fallback; fuzzy scorer reimplemented
                              below from the public token_set_ratio /
                              indel-similarity definitions)
  - PII hash/mask/token    -> reference parsing_engine/pii_handler.py:43-104
                              (regex recognizers only; no presidio)

Determinism contract: no wall clock, no randomness, no model inference.
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache
from datetime import date
from typing import Optional

AS_OF = date(2025, 7, 11)  # pinned replacement for date.today() ("Present")

# ---------------------------------------------------------------------------
# Whitespace contract
# ---------------------------------------------------------------------------
# Structural whitespace (trim / collapse / empty-check / tokenize) follows
# Python ``str.strip()`` / ``str.split()`` — the 29-codepoint set where
# ``str.isspace()`` is true (identical to Python-re Unicode ``\s``). The
# JVM / RE2 sides cannot use their own ``\s`` for this (Java \s is ASCII-only
# and misses \x1c-\x1f, \x85, \xa0, U+1680, U+2000.., which Python strips),
# so they use PY_WS_JRE: an explicit character class rendered with \x{..}
# escapes valid in BOTH Java regex and RE2/DuckDB. Pattern-internal \s in
# the recognition regexes below is intentionally ASCII on all three engines
# (Python patterns pinned with re.ASCII), so e.g. "page\xa03" is content on
# every side rather than furniture on one.
PY_WS_CODEPOINTS = (
    0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20,
    0x85, 0xA0, 0x1680,
    0x2000, 0x2001, 0x2002, 0x2003, 0x2004, 0x2005, 0x2006, 0x2007,
    0x2008, 0x2009, 0x200A, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
)
PY_WS_CHARS = "".join(chr(c) for c in PY_WS_CODEPOINTS)
# Character class usable verbatim in Java regex (Spark) and RE2 (DuckDB).
# Rendered as RANGES, not 29 singleton escapes: the long form measurably
# collapses whole-stage-codegen performance when the pattern literal is
# duplicated through a higher-order-function tree (minhash shingles went
# 3.4s -> 28s at sf0.1 with the 240-char form; ranges restore it).
PY_WS_JRE_INNER = (
    "\\x{9}-\\x{d}\\x{1c}-\\x{1f}\\x{20}\\x{85}\\x{a0}\\x{1680}"
    "\\x{2000}-\\x{200a}\\x{2028}\\x{2029}\\x{202f}\\x{205f}\\x{3000}"
)
PY_WS_JRE = "[" + PY_WS_JRE_INNER + "]"

# ---------------------------------------------------------------------------
# Section detection (FSM) — behavior of section_detector.py
# ---------------------------------------------------------------------------

SECTION_NAMES = (
    "contact",
    "summary",
    "skills",
    "education",
    "experience",
    "projects",
    "certifications",
)

# Pattern sets mirroring config/parsing_rules.yaml:1-113 (searched, not
# anchored unless the pattern anchors itself; IGNORECASE).
SECTION_PATTERNS: dict[str, tuple[str, ...]] = {
    "contact": (
        r"contact\s*information",
        r"personal\s*details",
        r"^\d{3}[-\s]?\d{3}[-\s]?\d{4}",
        r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$",
        r"^linkedin\.com/in/[\w-]+$",
        r"^github\.com/[\w-]+$",
    ),
    "summary": (
        r"^summary$",
        r"professional\s+summary",
        r"profile",
        r"objective",
        r"about\s+me",
        r"career\s+objective",
    ),
    "skills": (
        r"^skills$",
        r"^technical\s+skills$",
        r"^languages:",
        r"technical\s+skills",
        r"skills(\s+&\s+competencies)?",
        r"technologies(\s+used)?",
        r"tools\s+&\s+technologies",
        r"core\s+competencies",
        r"expertise",
        r"^programming\s+languages$",
        r"^frameworks$",
        r"^tools$",
        r"^databases$",
        r"^methodologies$",
    ),
    "education": (
        r"^education$",
        r"education(\s+background)?",
        r"academic(\s+background)?",
        r"qualifications",
        r"academic\s+history",
        r"educational\s+qualifications",
        r"^university\s+of",
        r"^college",
        r"^institute",
    ),
    "experience": (
        r"work\s+experience",
        r"professional\s+experience",
        r"employment\s+history",
        r"experience",
        r"career\s+history",
        r"work\s+history",
        r"job history",
        r"career summary",
        r"professional background",
        r"positions held",
    ),
    "projects": (
        r"^projects$",
        r"^technical\s+projects$",
        r"portfolio",
        r"technical\s+projects",
        r"personal\s+projects",
        r"key\s+projects",
        r"^project\s+\d+:",
    ),
    "certifications": (
        r"certifications?",
        r"certificates?",
        r"awards",
        r"honors",
        r"accomplishments",
    ),
}

_COMPILED_SECTIONS: dict[str, tuple[re.Pattern, ...]] = {
    name: tuple(re.compile(p, re.IGNORECASE) for p in pats)
    for name, pats in SECTION_PATTERNS.items()
}

# One alternation of every section pattern, used as a cheap pre-filter:
# most body lines match nothing, so a single search replaces ~60. The
# ordered per-section scan only runs on pre-filter hits (same result).
_ANY_SECTION_RE = re.compile(
    "|".join(
        f"(?:{p})" for pats in SECTION_PATTERNS.values() for p in pats
    ),
    re.IGNORECASE,
)

DATE_LINE_PATTERNS = (
    r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+\d{4}\s*[-–]\s*"
    r"(?:(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+\d{4}|Present|Current)\b",
    r"\b\d{4}\s*[-–]\s*(?:\d{4}|Present|Current)\b",
    r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+\d{4}\b",
)
_COMPILED_DATE_LINES = tuple(re.compile(p, re.IGNORECASE) for p in DATE_LINE_PATTERNS)

# single alternation equivalent of the three patterns above, usable with
# Spark `rlike` for the native-expression implementation (P6 in SURVEY §2.2)
DATE_LINE_RLIKE = (
    r"(?i)(\b(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+\d{4}\s*[-–]\s*"
    r"((Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+\d{4}|Present|Current)\b)"
    r"|(\b\d{4}\s*[-–]\s*(\d{4}|Present|Current)\b)"
    r"|(\b(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+\d{4}\b)"
)


@lru_cache(maxsize=65536)
def match_section_heading(text: str) -> Optional[str]:
    """Section heading match with the colon/ALL-CAPS retry. Memoized —
    pure function, and heading/bullet lines repeat heavily across docs.

    Mirrors section_detector.py:109-133: first a raw `search` over every
    section's pattern list (dict order), then — only for lines ending in ':'
    or fully uppercase — a retry with the trailing colon stripped.
    """
    if not text:
        return None
    if _ANY_SECTION_RE.search(text):
        for section, patterns in _COMPILED_SECTIONS.items():
            for pat in patterns:
                if pat.search(text):
                    return section
    if text.endswith(":") or text.isupper():
        clean = text.rstrip(":")
        if _ANY_SECTION_RE.search(clean):
            for section, patterns in _COMPILED_SECTIONS.items():
                for pat in patterns:
                    if pat.search(clean):
                        return section
    return None


_ANY_DATE_LINE_RE = re.compile(
    "|".join(f"(?:{p})" for p in DATE_LINE_PATTERNS), re.IGNORECASE
)


@lru_cache(maxsize=65536)
def contains_date_pattern(text: str) -> bool:
    """Date-range predicate (section_detector.py:151-161); single combined
    search — the three alternatives are disjoint so or-ing is equivalent.
    Memoized (pure; date lines repeat across documents)."""
    return _ANY_DATE_LINE_RE.search(text) is not None


def detect_sections(lines: list[str]) -> dict[str, str]:
    """Line FSM assigning lines to sections (section_detector.py:42-67).

    State = current section; heading lines switch state; date-pattern lines
    outside experience/education force state to 'experience'; other lines
    append to the current section (dropped when no state yet). Returns a
    dict of section -> newline-joined content ('' when empty). When nothing
    matched at all, everything lands in a synthetic 'content' section
    (section_detector.py:94-100).
    """
    parts: dict[str, list[str]] = {name: [] for name in SECTION_NAMES}
    current: Optional[str] = None
    for raw in lines:
        line = raw.strip()
        if not line:
            continue
        hit = match_section_heading(line)
        if hit:
            current = hit
            parts[current].append(line)
        elif contains_date_pattern(line):
            if current not in ("experience", "education"):
                current = "experience"
            parts[current].append(line)
        elif current:
            parts[current].append(line)
    sections: dict[str, str] = {
        name: ("\n".join(ps) + "\n" if ps else "") for name, ps in parts.items()
    }
    if not any(v.strip() for v in sections.values()):
        sections["content"] = "\n".join(
            ln.strip() for ln in lines if ln.strip()
        ) + ("\n" if any(ln.strip() for ln in lines) else "")
    return sections


# ---------------------------------------------------------------------------
# Block / span classification — content vs boilerplate vs media-anchor
# ---------------------------------------------------------------------------
# The reference has no boilerplate stripper (it parses single resumes); the
# north_star mandates one (Boilerpipe/Readability-style link-density +
# block-tag scoring). These rules are therefore defined HERE as the
# authoritative semantics, implemented natively in Spark (operators/
# classify.py) and mirrored by the oracle. Every rule is a deterministic
# regex/ratio on the span text.

# Pattern SOURCE STRINGS shared verbatim with the JVM side
# (operators/classify.py). Constraints that keep one string valid and
# equivalent on both engines:
#   - compiled with re.ASCII in Python so \s \S \d \w \b match Java/RE2
#     defaults (ASCII); the classification token syntax is intentionally
#     ASCII — see the whitespace contract above;
#   - `.` is spelled [^\n] because Python-dot excludes only \n while
#     Java-dot also excludes \r, \x85, U+2028, U+2029;
#   - input is pre-stripped with the FULL Python whitespace set on both
#     sides, so the ^\s*/\s*$ anchoring never sees exotic whitespace.
PAGE_FURNITURE_PAT = (
    r"(?i)^\s*("
    r"page\s+\d+(\s+of\s+\d+)?"  # Page 3 of 12
    r"|\d+\s*/\s*\d+"  # 3 / 12
    r"|\d{1,4}"  # bare page number
    r"|[-_=*•.·]{3,}"  # separator rules
    r"|(©|\(c\)|copyright)\s[^\n]*"  # copyright lines
    r"|all\s+rights\s+reserved[^\n]*"
    r"|confidential(\s+document)?"
    r"|generated\s+by\s+\S+"
    r"|downloaded\s+from\s+\S+"
    r")\s*$"
)
NAV_MENU_PAT = (
    # >=3 short title-case tokens separated by | or • : "Home | About | Jobs"
    r"^\s*[A-Z][\w]{1,14}(\s*[|•]\s*[A-Z][\w]{1,14}){2,}\s*$"
)
LINK_TOKEN_PAT = (
    r"(?i)^(https?://\S+|www\.\S+|\S+\.(com|org|net|io|dev|co)(/\S*)?)$"
)
CONTACT_LINE_PAT = (
    r"(?i)(\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"  # email
    r"|\b\d{3}[-.\s]?\d{3}[-.\s]?\d{4}\b"  # phone
    r"|\(\d{3}\)\s*\d{3}[-.\s]?\d{4}"  # (123) 456-7890
    r"|linkedin\.com/(in|pub)/[A-Za-z0-9-]+"
    r"|github\.com/[A-Za-z0-9-]+)"
)

PAGE_FURNITURE_RE = re.compile(PAGE_FURNITURE_PAT, re.ASCII)
NAV_MENU_RE = re.compile(NAV_MENU_PAT, re.ASCII)
LINK_TOKEN_RE = re.compile(LINK_TOKEN_PAT, re.ASCII)
CONTACT_LINE_RE = re.compile(CONTACT_LINE_PAT, re.ASCII)

# Short-circuit gates for the per-span classify hot loop (extraction
# headline): each gate is IMPLIED by its full pattern — every
# CONTACT_LINE_RE alternative requires an '@', a digit, or a
# linkedin/github domain; every LINK_TOKEN_RE alternative requires a
# '.' or '://'. A gate miss therefore proves the full regex cannot
# match, and the (much costlier) alternation scan is skipped for the
# dominant plain-prose case. Values are unchanged by construction —
# pinned by tests/test_classify_property.py over the full span corpus.
CONTACT_GATE_RE = re.compile(r"[@0-9]|linkedin\.com|github\.com", re.I)

LINK_DENSITY_THRESHOLD = 0.5
LINK_DENSITY_MIN_TOKENS = 3


def link_density(text: str) -> float:
    """Fraction of whitespace tokens that are URL-like."""
    tokens = text.split()
    if not tokens:
        return 0.0
    links = sum(1 for t in tokens if LINK_TOKEN_RE.match(t))
    return links / len(tokens)


def classify_span(kind: str, text: str, media_ref: Optional[str]) -> str:
    """Return 'media-anchor' | 'boilerplate' | 'content'.

    Rules (order matters):
      1. image spans (or any span with a media_ref) -> media-anchor
      2. empty/whitespace text -> boilerplate (dropped)
      3. contact-looking lines are always content (guards against the
         link-density rule eating 'linkedin.com/in/x | github.com/y')
      4. page furniture / nav menus / link farms -> boilerplate
      5. else -> content
    """
    if kind == "image" or (media_ref is not None and media_ref != ""):
        return "media-anchor"
    if not text or not text.strip():
        return "boilerplate"
    stripped = text.strip()
    if CONTACT_GATE_RE.search(stripped) and CONTACT_LINE_RE.search(stripped):
        return "content"
    if PAGE_FURNITURE_RE.match(stripped):
        return "boilerplate"
    if NAV_MENU_RE.match(stripped):
        return "boilerplate"
    if "." in stripped or "://" in stripped:
        tokens = stripped.split()
        if (
            len(tokens) >= LINK_DENSITY_MIN_TOKENS
            and link_density(stripped) > LINK_DENSITY_THRESHOLD
        ):
            return "boilerplate"
    return "content"


def is_heading_block(font_size: float, font_name: str, text: str) -> bool:
    """Heading classifier (pdf_parser.py:215-219)."""
    return (
        font_size >= 12
        or font_name.startswith("CMBX")
        or any(w.strip().isupper() for w in text.split())
    )


# ---------------------------------------------------------------------------
# Date normalization — deterministic subset of date_normalizer.py
# ---------------------------------------------------------------------------

MONTH_MAP = {
    "jan": 1, "january": 1, "feb": 2, "february": 2, "mar": 3, "march": 3,
    "apr": 4, "april": 4, "may": 5, "jun": 6, "june": 6, "jul": 7,
    "july": 7, "aug": 8, "august": 8, "sep": 9, "september": 9, "oct": 10,
    "october": 10, "nov": 11, "november": 11, "dec": 12, "december": 12,
}

_PRESENT_RE = re.compile(r"(?i)\b(present|current|ongoing|now)\b")
_QUARTER_RE = re.compile(r"(?i)\bQ([1-4])\s*(\d{4})\b")
_ISO_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})$")
_DMY_RE = re.compile(r"^(\d{2})-(\d{2})-(\d{4})$")
_MDY_RE = re.compile(r"^(\d{1,2})/(\d{1,2})/(\d{4})$")
_MONTH_YEAR_RE = re.compile(r"(?i)([a-z]+)[^\d]*(\d{4})")
_NUM_MONTH_YEAR_RE = re.compile(r"(\d{1,2})[^\d]*(\d{4})")
_YEAR_RE = re.compile(r"(\d{4})")


def normalize_date(date_str: Optional[str], as_of: date = AS_OF) -> Optional[date]:
    """Deterministic date parse (date_normalizer.py:33-126 minus dateparser).

    Order: Present/Current -> as_of; explicit full formats (ISO, d-m-Y,
    m/d/Y); quarter; month-name + year; numeric month + year; bare year.
    Returns None when nothing parses.
    """
    if not date_str:
        return None
    s = date_str.strip()
    if not s:
        return None
    if _PRESENT_RE.search(s):
        return as_of

    m = _ISO_RE.match(s)
    if m:
        try:
            return date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
        except ValueError:
            return None
    m = _DMY_RE.match(s)
    if m:
        try:
            return date(int(m.group(3)), int(m.group(2)), int(m.group(1)))
        except ValueError:
            return None
    m = _MDY_RE.match(s)
    if m:
        try:
            return date(int(m.group(3)), int(m.group(1)), int(m.group(2)))
        except ValueError:
            return None

    m = _QUARTER_RE.search(s)
    if m:
        quarter, year = int(m.group(1)), int(m.group(2))
        return date(year, (quarter - 1) * 3 + 1, 1)

    m = _MONTH_YEAR_RE.search(s)
    if m:
        month = MONTH_MAP.get(m.group(1).lower()) or MONTH_MAP.get(m.group(1).lower()[:3])
        if month:
            return date(int(m.group(2)), month, 1)

    m = _NUM_MONTH_YEAR_RE.search(s)
    if m and 1 <= int(m.group(1)) <= 12:
        return date(int(m.group(2)), int(m.group(1)), 1)

    # bare-year pattern: FIRST 4-digit run anywhere -> Jan 1 of that year
    # (date_normalizer.py:70-105 pattern 3 — reached even when the string
    # holds several numbers, e.g. '(2019-2023)' -> 2019-01-01)
    m = _YEAR_RE.search(s)
    if m:
        return date(int(m.group(1)), 1, 1)
    return None


_PERIOD_DELIMS = tuple(
    re.compile(p)
    for p in (r"\s+to\s+", r"\s+-\s+", r"\s*–\s*", r"\s*—\s*")
)


def extract_period(
    text: str, as_of: date = AS_OF
) -> tuple[Optional[date], Optional[date]]:
    """Split '(start) to|-|–|— (end)' and parse both (date_normalizer.py:128-144).

    The reference lowercases the whole text first; parsing is case-insensitive
    so only the split behavior matters. No delimiter -> (d, d).
    """
    low = text.lower()
    for delim in _PERIOD_DELIMS:
        parts = delim.split(low)
        if len(parts) == 2:
            return (
                normalize_date(parts[0].strip(), as_of),
                normalize_date(parts[1].strip(), as_of),
            )
    d = normalize_date(low, as_of)
    return d, d


def duration_months(start: Optional[date], end: Optional[date], as_of: date = AS_OF) -> int:
    """Whole months between dates, +1 when leftover days exist
    (experience_normalizer.py:163-206)."""
    if start is None:
        return 0
    if end is None:
        end = as_of
    if start > end:
        return 0
    months = (end.year - start.year) * 12 + (end.month - start.month)
    if end.day < start.day:
        months -= 1
        # leftover days always exist in this branch
        return months + 1 if months >= 0 else 0
    if end.day > start.day:
        return months + 1
    return months


# ---------------------------------------------------------------------------
# Fuzzy string similarity (pure Python; rapidfuzz-compatible definitions)
# ---------------------------------------------------------------------------
# Public algorithm definitions: ratio = normalized indel similarity,
# token_sort_ratio = ratio over sorted tokens, token_set_ratio = max ratio
# over set-intersection constructions. WRatio approximated as the weighted
# max used by the public implementations.


def _lcs_len(a: str, b: str) -> int:
    """LCS length via the Allison–Dix bit-vector algorithm: O(len(b))
    big-int operations instead of the O(len(a)*len(b)) DP (fuzz-verified
    against the DP). Builds the match mask over the shorter string."""
    if len(b) < len(a):
        a, b = b, a
    m = len(a)
    if m == 0:
        return 0
    pm: dict[str, int] = {}
    bit = 1
    for ch in a:
        pm[ch] = pm.get(ch, 0) | bit
        bit <<= 1
    mask = bit - 1
    s = mask
    get = pm.get
    for ch in b:
        u = s & get(ch, 0)
        s = ((s + u) | (s - u)) & mask
    return m - s.bit_count()


def _indel_ratio(a: str, b: str) -> float:
    """Normalized indel similarity in [0,100] (LCS-based)."""
    if not a and not b:
        return 100.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    return 200.0 * _lcs_len(a, b) / (la + lb)


def fuzz_ratio(a: str, b: str) -> float:
    return _indel_ratio(a, b)


def token_sort_ratio(a: str, b: str) -> float:
    sa = " ".join(sorted(a.lower().split()))
    sb = " ".join(sorted(b.lower().split()))
    return _indel_ratio(sa, sb)


def token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(a.lower().split()), set(b.lower().split())
    if not ta or not tb:
        return _indel_ratio(a.lower(), b.lower())
    if ta <= tb or tb <= ta:
        # one combined string equals the intersection -> ratio 100
        return 100.0
    inter = " ".join(sorted(ta & tb))
    sa = " ".join(sorted(ta))
    sb = " ".join(sorted(tb))
    combined_a = (inter + " " + " ".join(sorted(ta - tb))).strip()
    combined_b = (inter + " " + " ".join(sorted(tb - ta))).strip()
    return max(
        _indel_ratio(inter, combined_a),
        _indel_ratio(inter, combined_b),
        _indel_ratio(combined_a, combined_b),
    )


def _partial_ratio(a: str, b: str, score_cutoff: float = 0.0) -> float:
    """Best indel ratio of the shorter string against any same-length
    window of the longer (the public partial_ratio shape: optimal
    alignment of the short string inside the long one). Bit-parallel:
    the pattern mask over the short string is built ONCE; each window is
    an O(m) Allison–Dix sweep.

    The scan is pruned EXACTLY three ways (r4 — this was the extraction
    hot-path cost, VERDICT r3 #1):
      * substring fast path: short in long -> some window IS the short
        string -> 100.0, one C-speed `in` instead of the window scan;
      * a sliding char-multiset overlap between the pattern and the
        current window (O(1) per shift): a window's LCS can't exceed its
        overlap, so `ov <= best_lcs` windows skip the O(m) sweep;
      * `score_cutoff`: windows whose overlap can't produce a ratio
        STRICTLY above the cutoff are skipped too. When every window is
        cut off the return value may be any value <= score_cutoff —
        callers must only use the result inside max(best, ...) with
        best >= scale * score_cutoff (wratio does)."""
    if len(a) > len(b):
        a, b = b, a
    m, n = len(a), len(b)
    if m == 0:
        return 100.0 if n == 0 else 0.0
    if a in b:
        return 100.0
    pm: dict[str, int] = {}
    bit = 1
    for ch in a:
        pm[ch] = pm.get(ch, 0) | bit
        bit <<= 1
    mask = bit - 1
    get = pm.get
    need: dict[str, int] = {}
    for ch in a:
        need[ch] = need.get(ch, 0) + 1
    nget = need.get
    have: dict[str, int] = {}
    ov = 0
    for ch in b[:m]:
        h = have.get(ch, 0)
        if h < nget(ch, 0):
            ov += 1
        have[ch] = h + 1
    cm = score_cutoff * m  # skip window unless 100*ov > cm (exact: lcs<=ov)
    best = 0
    for i in range(n - m + 1):
        if i:
            out = b[i - 1]
            h = have[out] - 1
            have[out] = h
            if h < nget(out, 0):
                ov -= 1
            inc = b[i + m - 1]
            h = have.get(inc, 0)
            if h < nget(inc, 0):
                ov += 1
            have[inc] = h + 1
        if ov <= best or 100.0 * ov <= cm:
            continue
        s = mask
        for ch in b[i:i + m]:
            u = s & get(ch, 0)
            s = ((s + u) | (s - u)) & mask
        lcs = m - s.bit_count()
        if lcs > best:
            best = lcs
            if best == m:
                break
    return 100.0 * best / m


def wratio(a: str, b: str) -> float:
    """Weighted max of ratio / token / partial ratios — the public WRatio
    shape: at len_ratio < 1.5, max(ratio, 0.95 * token ratios); at
    len_ratio >= 1.5 the PARTIAL branch takes over with scale 0.9 (or 0.6
    once len_ratio >= 8): max(ratio, scale * partial_ratio,
    0.95 * scale * partial_token ratio). partial_token_set is exactly 100
    whenever the token sets intersect (the sorted intersection string IS
    a window of both combined strings), so only the disjoint case runs a
    sliding-window scan over the sorted token joins.

    The plain-ratio LCS over the FULL strings is skipped when it provably
    cannot exceed the other parts (base <= len_bound): for the dominant
    corpus case — long bullet line vs short skill name, token subset hit
    — no full-string DP runs. Exactness preserved: max(base, t) == t
    whenever base <= t."""
    a_l, b_l = a.lower(), b.lower()
    la, lb = len(a_l), len(b_l)
    if la == 0 or lb == 0:
        return _indel_ratio(a_l, b_l)
    len_ratio = max(la, lb) / min(la, lb)
    if len_ratio < 1.5:
        tset = token_set_ratio(a, b)
        if tset >= 100.0:
            token_part = 95.0  # token_sort <= 100 can't raise the max
        else:
            token_part = max(token_sort_ratio(a, b), tset) * 0.95
        if _len_bound(la, lb) <= token_part:
            return token_part
        return max(_indel_ratio(a_l, b_l), token_part)
    # partial branch
    pscale = 0.9 if len_ratio < 8 else 0.6
    ta, tb = a_l.split(), b_l.split()
    if set(ta) & set(tb):
        ptoken = 100.0
    else:
        ptoken = _partial_ratio(
            " ".join(sorted(ta)), " ".join(sorted(tb))
        )
    best = 0.95 * pscale * ptoken
    # full-string partial_ratio can raise the max only if it STRICTLY
    # beats best/pscale (== 0.95*ptoken); pass that as the scan cutoff so
    # windows that provably can't clear it are skipped (at ptoken == 100
    # only >95-ratio windows — near-exact alignments — ever run the DP)
    best = max(best, pscale * _partial_ratio(a_l, b_l,
                                             score_cutoff=best / pscale))
    if _len_bound(la, lb) <= best:
        return best
    return max(_indel_ratio(a_l, b_l), best)


def _token_lens(s: str):
    """(token set, len of sorted-unique-token join, len of sorted-all-token
    join, len of the lowercased string, char histogram of the lowercased
    string, token count) — the exact string lengths token_set_ratio /
    token_sort_ratio / the base ratio operate on, plus the multiset used
    by the character-overlap LCS bound and the token count used by the
    partial-branch sorted-join bound."""
    low = s.lower()
    toks = low.split()
    tset = frozenset(toks)
    uniq_len = len(" ".join(sorted(tset)))
    sort_len = len(" ".join(sorted(toks)))
    hist: dict[str, int] = {}
    for ch in low:
        hist[ch] = hist.get(ch, 0) + 1
    return tset, uniq_len, sort_len, len(low), hist, len(toks)


def _join_len(tokens) -> int:
    """Length of ' '.join(sorted(tokens)) without building the string."""
    n = len(tokens)
    return sum(len(t) for t in tokens) + (n - 1) if n else 0


class _IndexBounds:
    """Precomputed per-index data for the pruned fuzzy scan: per-candidate
    token stats plus a (n_candidates x vocab) char-count matrix so the
    char-multiset overlap — the dominant bound cost — is one vectorized
    numpy minimum/sum per query instead of a Python dict loop per
    candidate (was 60% of extraction-UDF time under cProfile).

    The vocab is the union of the candidates' chars: a query char outside
    it cannot overlap ANY candidate, so projecting the query histogram
    onto the vocab loses nothing."""

    __slots__ = ("toks", "vocab", "M", "ws_mask", "lc", "uniq", "sort",
                 "ntok")

    def __init__(self, index: list[str]):
        import numpy as np
        self.toks = [_token_lens(c) for c in index]
        vocab: dict[str, int] = {}
        for t in self.toks:
            for ch in t[4]:
                if ch not in vocab:
                    vocab[ch] = len(vocab)
        self.vocab = vocab
        n, v = len(index), max(len(vocab), 1)
        M = np.zeros((n, v), dtype=np.int64)
        for i, t in enumerate(self.toks):
            for ch, c in t[4].items():
                M[i, vocab[ch]] = c
        self.M = M
        ws = np.zeros(v, dtype=bool)
        for ch, j in vocab.items():
            if ch.isspace():
                ws[j] = True
        self.ws_mask = ws
        self.lc = np.array([t[3] for t in self.toks], dtype=np.float64)
        self.uniq = np.array([t[1] for t in self.toks], dtype=np.float64)
        self.sort = np.array([t[2] for t in self.toks], dtype=np.float64)
        self.ntok = np.array([t[5] for t in self.toks], dtype=np.float64)


_INDEX_BOUNDS_CACHE: dict[tuple[str, ...], _IndexBounds] = {}
_INDEX_BOUNDS_CACHE_MAX = 8


def _index_bounds(index: list[str]) -> _IndexBounds:
    # CONTENT-keyed (tuple equality), never id(): a freed list's address
    # can be reused by a different same-length list, which would serve
    # stale token data (observed as flaky fuzzy-match results). The hot
    # path passes the same module-level ontology index every call, so the
    # tuple hash amortizes to one pointer-compare dict hit.
    key = tuple(index)
    ib = _INDEX_BOUNDS_CACHE.get(key)
    if ib is None:
        ib = _IndexBounds(index)
        if len(_INDEX_BOUNDS_CACHE) >= _INDEX_BOUNDS_CACHE_MAX:
            _INDEX_BOUNDS_CACHE.clear()
        _INDEX_BOUNDS_CACHE[key] = ib
    return ib


def _len_bound(la: int, lb: int) -> float:
    """Upper bound of the indel similarity of strings with these lengths."""
    if la == 0 or lb == 0:
        return 100.0 if la == lb else 0.0
    return 200.0 * min(la, lb) / (la + lb)


def best_fuzzy_match(
    query: str, index: list[str], threshold: float
) -> Optional[str]:
    """extractOne equivalent: argmax wratio >= threshold, ties -> first in
    index order (matches the public extractOne tie behavior).

    Pruned with EXACT upper bounds so results are identical to the naive
    scan (property-tested). Both wratio branches are bounded:
      base       <= min(len_bound(la, lb), 200*common_chars/(la+lb)) over
                   the LOWERCASED strings — LCS can't exceed the char-
                   multiset overlap, which kills the similar-length junk
                   the pure length bound lets through
      len_ratio < 1.5 (token branch):
                  subset token sets -> exactly 0.95*100 = 95
                   (token_set_ratio returns 100);
                  intersecting non-subset -> 0.95 * max of the three
                   len_bounds of the exact (inter, inter+diff_a,
                   inter+diff_b) strings token_set_ratio compares plus
                   the sorted-all-token bound — all computable from
                   token character sums, no DP;
                  disjoint -> 0.95 * max(len_bound(uniq), len_bound(sort))
      len_ratio >= 1.5 (partial branch, scale 0.9 / 0.6 from lengths):
                  partial_ratio  <= 100 * min(1, common_chars / min_len)
                   (a window LCS can't beat the whole-string multiset
                   overlap, nor the window length);
                  partial_token: intersecting sets -> exactly 100;
                   disjoint -> 100 * min(1, sorted-join char overlap /
                   min sorted-join len), where the join overlap is the
                   non-whitespace multiset overlap + min(spaces) —
                   joins only reorder non-ws chars and normalize
                   separators to single spaces.
    Candidates whose bound cannot STRICTLY beat the current best are
    skipped (extractOne keeps the first of equals); bullet-like phrases
    sharing one short token with a divergent-length candidate prune to
    zero scorer calls.
    """
    import numpy as np

    q_tokens, q_uniq, q_sort, lq, q_hist, q_ntok = _token_lens(query)
    ib = _index_bounds(index)
    n = len(index)
    if n == 0:
        return None

    # ---- vectorized COARSE bounds (valid upper bounds, cheap) --------
    qv = np.zeros(ib.M.shape[1], dtype=np.int64)
    for ch, c in q_hist.items():
        j = ib.vocab.get(ch)
        if j is not None:
            qv[j] = c
    mins = np.minimum(ib.M, qv)
    common = mins.sum(axis=1).astype(np.float64)
    common_ws = mins[:, ib.ws_mask].sum(axis=1).astype(np.float64)
    lc = ib.lc
    with np.errstate(divide="ignore", invalid="ignore"):
        base = 200.0 * common / (lq + lc)
        ratio = np.maximum(lq, lc) / np.minimum(lq, lc)
        min_len = np.minimum(lq, lc)
        pfull = 100.0 * np.minimum(common, min_len) / min_len
    pscale = np.where(ratio < 8, 0.9, 0.6)
    # token branch cap: 0.95*100; partial branch cap: ptoken <= 100
    cap = np.where(ratio < 1.5, 95.0,
                   np.maximum(pscale * pfull, 0.95 * pscale * 100.0))
    coarse = np.maximum(base, cap)
    empty = (lq == 0) | (lc == 0)
    if empty.any():
        coarse = np.where(empty, np.where(lc == lq, 100.0, 0.0), coarse)

    def exact_bound(i: int) -> float:
        """The tight per-candidate bound (same math as before the numpy
        rewrite), computed LAZILY only for coarse-bound survivors."""
        c_tokens, c_uniq, c_sort, lci, _, c_ntok = ib.toks[i]
        if lq == 0 or lci == 0:
            return _len_bound(lq, lci)
        com = float(common[i])
        base_bound = 200.0 * com / (lq + lci)
        inter = q_tokens & c_tokens
        if max(lq, lci) / min(lq, lci) < 1.5:
            if not inter:
                token_bound = 0.95 * max(
                    _len_bound(q_uniq, c_uniq), _len_bound(q_sort, c_sort)
                )
            elif q_tokens <= c_tokens or c_tokens <= q_tokens:
                token_bound = 95.0
            else:
                inter_len = _join_len(inter)
                ca = inter_len + 1 + _join_len(q_tokens - c_tokens)
                cb = inter_len + 1 + _join_len(c_tokens - q_tokens)
                tset_b = max(
                    _len_bound(inter_len, ca),
                    _len_bound(inter_len, cb),
                    _len_bound(ca, cb),
                )
                token_bound = 0.95 * max(tset_b, _len_bound(q_sort, c_sort))
            return max(base_bound, token_bound)
        psc = 0.9 if max(lq, lci) / min(lq, lci) < 8 else 0.6
        ml = lq if lq < lci else lci
        pfull_b = 100.0 * (com if com < ml else ml) / ml
        if inter:
            ptoken_b = 100.0
        elif q_sort == 0 or c_sort == 0:
            ptoken_b = 100.0 if q_sort == c_sort else 0.0
        else:
            join_common = (com - float(common_ws[i])) + min(
                q_ntok - 1, c_ntok - 1
            )
            mj = q_sort if q_sort < c_sort else c_sort
            ptoken_b = 100.0 * (join_common if join_common < mj else mj) / mj
        return max(base_bound, psc * pfull_b, 0.95 * psc * ptoken_b)

    # Two-stage prune: the vectorized coarse bound filters most of the
    # index with zero Python-per-candidate work (everything below the
    # threshold is gone immediately); survivors get the tight exact
    # bound, and scoring runs in descending EXACT-bound order — the same
    # scoring set and order as a full exact-bound scan, so high scores
    # surface early and cut later scorer calls. Tie semantics preserved
    # exactly: equal scores resolve to the smallest index position
    # (extractOne first-wins).
    # Floor the prune at the threshold: a candidate whose bound is below
    # the threshold can never change the result — if it were the global
    # argmax its score is < threshold and the call returns None anyway,
    # and it can never beat/tie an already-found >= threshold match. For
    # junk phrases (no token overlap, divergent lengths) every coarse
    # bound is below the threshold and the scan does ZERO Python work
    # past the numpy pass.
    survivors = np.flatnonzero(coarse >= threshold)
    if survivors.size == 0:
        return None
    exact = [(exact_bound(int(i)), int(i)) for i in survivors]
    exact.sort(key=lambda t: (-t[0], t[1]))
    best_score = -1.0
    best_pos = -1
    for ub, i in exact:
        if ub < threshold or ub < best_score:
            break
        if ub == best_score and best_pos != -1 and i > best_pos:
            continue  # a tie at larger position can't win
        s = wratio(query, index[i])
        if s > best_score or (s == best_score and (best_pos == -1 or i < best_pos)):
            best_score = s
            best_pos = i
    if best_pos != -1 and best_score >= threshold:
        return index[best_pos]
    return None


# ---------------------------------------------------------------------------
# Entity extraction regexes (entity_extractor.py) — deterministic path only
# ---------------------------------------------------------------------------

EMAIL_RE = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b"
PHONE_RE = r"(\b\d{3}[-.\s]?\d{3}[-.\s]?\d{4}\b|\+\d{1,3}[-.\s]?\d{3,}[-.\s]?\d{4,})"
LINKEDIN_RE = r"(https?://)?(www\.)?linkedin\.com/(in|pub)/[a-zA-Z0-9-]+"
GITHUB_RE = r"(https?://)?(www\.)?github\.com/[a-zA-Z0-9-]+/?"
NAME_RE = r"^([A-Z][a-zA-Z\s]+)\n"
SKILL_SPLIT_RE = r"[\n,;•/]+"
ENTRY_SPLIT_RE = r"\n(?=[A-Z][^a-z])"
DEGREE_FALLBACK_RE = r"(?i)\b(bachelor|master|phd|bsc|msc|mba|ba|bs|ms|ma)\b\.?"
INSTITUTION_FALLBACK_RE = r"(?i)(university|college|institute|school|academy)\b"
COMPANY_FALLBACK_RE = (
    r"\b([A-Z][a-zA-Z0-9\s,.-]+(?:Inc|LLC|Co|Company|Group|Corp|Corporation|Ltd|Limited))\b"
)
POSITION_FALLBACK_RE = (
    r"(?i)\b(software engineer|developer|data scientist|project manager|analyst|consultant)\b"
)
GPA_RE = r"\b(\d\.\d{1,2})\b"
GPA_VETO_RE = r"(?i)out\s+of|on|scale"

FIELDS_OF_STUDY = (
    "computer science", "software engineering", "electrical engineering",
    "mechanical engineering", "civil engineering", "data science",
    "artificial intelligence", "machine learning", "information technology",
    "business administration", "finance", "marketing", "physics",
    "mathematics", "chemistry", "biology", "psychology", "history",
    "literature", "arts", "design",
)

STOP_WORDS = frozenset(
    {"and", "or", "with", "using", "in", "on", "for", "to", "of", "the", "a", "an"}
)

DEGREE_ABBREV = {
    "BS": "Bachelor of Science",
    "BA": "Bachelor of Arts",
    "MS": "Master of Science",
    "MA": "Master of Arts",
    "MBA": "Master of Business Administration",
    "PHD": "Doctor of Philosophy",
}

TITLE_ABBREVIATIONS: tuple[tuple[str, str], ...] = (
    # compound first (experience patterns in config/patterns.yaml:47-71)
    (r"Sr\.?\s*SWE", "Senior Software Engineer"),
    (r"Sr\.?\s*Dev(?:eloper)?", "Senior Developer"),
    (r"Sr\.?\s*Eng(?:ineer)?", "Senior Engineer"),
    (r"Jr\.?\s*SWE", "Junior Software Engineer"),
    (r"Jr\.?\s*Dev(?:eloper)?", "Junior Developer"),
    (r"Jr\.?\s*Eng(?:ineer)?", "Junior Engineer"),
    (r"Sr\.?\s*Tech\s*Lead", "Senior Technical Lead"),
    (r"Tech\s*Lead", "Technical Lead"),
    # single
    (r"Sr\.?", "Senior"),
    (r"Jr\.?", "Junior"),
    (r"Mgr\.?", "Manager"),
    (r"Dir\.?", "Director"),
    (r"VP", "Vice President"),
    (r"PM", "Project Manager"),
    (r"SWE", "Software Engineer"),
    (r"SDE", "Software Development Engineer"),
    (r"Dev\.?", "Developer"),
    (r"Eng\.?", "Engineer"),
    (r"Tech\.?", "Technical"),
    (r"Sys\.?", "Systems"),
    (r"Arch\.?", "Architect"),
)

COMPANY_SUFFIXES = ("Inc|Incorporated", "Corp|Corporation", "Co|Company",
                    "Ltd|Limited", "LLC", "Group")

INSTITUTION_INDICATORS = ("university", "college", "institute", "school")

SKILL_CATEGORY_LABELS = ("Languages", "Tools", "Frameworks", "Libraries")
# precompiled hot-loop patterns (identical semantics to the former
# per-call re.sub/fullmatch string forms; values pinned by the golden
# extraction suite)
_SKILL_LABEL_RES = tuple(
    re.compile(f"^{label}:\\s*") for label in SKILL_CATEGORY_LABELS
)
_PARENTHETICAL_RE = re.compile(r"\([^)]*\)")
_PURE_DIGITS_RE = re.compile(r"\d+", re.ASCII)


def extract_contact(contact_text: str) -> dict[str, Optional[str]]:
    """Contact extraction, regex path only (entity_extractor.py:49-84,
    minus NER location)."""
    out: dict[str, Optional[str]] = {
        "name": None, "email": None, "phone": None,
        "linkedin": None, "github": None,
    }
    text = contact_text
    m = re.match(NAME_RE, text)
    if m:
        out["name"] = m.group(1).strip()
        text = text[m.end():].strip()
    m = re.search(EMAIL_RE, text)
    if m:
        out["email"] = m.group(0)
    m = re.search(PHONE_RE, text)
    if m:
        out["phone"] = m.group(0) if isinstance(m.group(0), str) else "".join(m.groups())
    m = re.search(LINKEDIN_RE, text)
    if m:
        out["linkedin"] = m.group(0)
    m = re.search(GITHUB_RE, text)
    if m:
        out["github"] = m.group(0)
    return out


def extract_summary(summary_text: str) -> str:
    """Whitespace-collapse + 500-char sentence-aware truncation
    (entity_extractor.py:86-91)."""
    cleaned = re.sub(r"\s+", " ", summary_text).strip()
    if len(cleaned) > 500:
        last_period = cleaned[:500].rfind(".")
        return cleaned[: last_period + 1] if last_period > 0 else cleaned[:497] + "..."
    return cleaned


def normalize_skill(
    skill: str,
    lower_index: dict[str, str],
    variant_to_canonical: dict[str, str],
    index: list[str],
    threshold: float = 80.0,
    memo: Optional[dict[str, Optional[str]]] = None,
) -> Optional[str]:
    """Single-skill normalization (skill_normalizer.py:47-81): strip
    category labels + parentheticals, exact case-insensitive lookup, fuzzy
    fallback, else passthrough. `memo` (phrase -> result) amortizes the
    fuzzy scan across an Arrow batch; callers own its lifetime."""
    if skill is None:
        return None
    if skill == "":
        return ""
    if not skill.strip():
        return skill
    if memo is not None:
        hit = memo.get(skill)
        if hit is not None or skill in memo:
            return hit
        original = skill
    for pat in _SKILL_LABEL_RES:
        skill = pat.sub("", skill)
    skill = _PARENTHETICAL_RE.sub("", skill).strip()
    low = skill.lower()
    if low in lower_index:
        hit = lower_index[low]
        result = variant_to_canonical.get(hit, hit)
    else:
        match = best_fuzzy_match(skill, index, threshold)
        if match is not None:
            result = variant_to_canonical.get(match, match)
        else:
            result = skill
    if memo is not None:
        if len(memo) > 200_000:
            memo.clear()
        memo[original] = result
    return result


def extract_skills(
    skills_text: str,
    lower_index: dict[str, str],
    variant_to_canonical: dict[str, str],
    index: list[str],
    threshold: float = 80.0,
    memo: Optional[dict[str, Optional[str]]] = None,
) -> list[str]:
    """Skills pipeline, deterministic path (entity_extractor.py:93-126
    without NER): split on delimiters, drop len<=1/pure digits, normalize,
    distinct + sort."""
    if not skills_text.strip():
        return []
    phrases = [p.strip() for p in re.split(SKILL_SPLIT_RE, skills_text) if p.strip()]
    normalized: set[str] = set()
    for phrase in phrases:
        # ASCII-digit check (not str.isdigit(), which also accepts Unicode
        # Nd/No chars the JVM twin's \d never matches — parity contract).
        if len(phrase) <= 1 or _PURE_DIGITS_RE.fullmatch(phrase):
            continue
        norm = normalize_skill(
            phrase, lower_index, variant_to_canonical, index, threshold,
            memo=memo,
        )
        if norm:
            normalized.add(norm)
    normalized = {s for s in normalized if s.lower() not in STOP_WORDS}
    return sorted(normalized)


def expand_degree(degree: str) -> str:
    """Degree cleanup chain (education_normalizer.py:92-142): strip
    punctuation, expand abbreviations, grammar fixes."""
    if not degree:
        return ""
    clean = re.sub(r"[^\w\s]", "", degree)

    def _expand(m: re.Match) -> str:
        return DEGREE_ABBREV.get(re.sub(r"\.", "", m.group().upper()), m.group())

    clean = re.sub(
        r"(?i)\b(bachelor|master|phd|bsc|msc|mba|ba|bs|ms|ma)\b", _expand, clean
    )
    clean = re.sub(r"(?i)\bMasters\b", "Master", clean)
    clean = re.sub(r"(?i)\bAdmin\b", "Administration", clean)
    clean = re.sub(r"(?i)\bin\b", "of", clean)
    clean = re.sub(r"(?i)\bDegree\b$", "", clean).strip()
    return clean if clean else degree


def normalize_institution_text(name: str) -> str:
    """Institution cleanup (education_normalizer.py:52-72): drop odd chars,
    periods, and indicator words."""
    if not name:
        return ""
    clean = re.sub(r"[^\w\s&.,-]", "", name)
    clean = clean.replace(".", "")
    indicators = "|".join(INSTITUTION_INDICATORS)
    clean = re.sub(rf"(?i)\b({indicators})\b\.?", "", clean).strip()
    return clean


def strip_company_suffixes(name: str) -> str:
    """Company suffix strip (experience_normalizer.py:56-75)."""
    if not name:
        return ""
    cleaned = re.sub(r"[^\w\s&.,-]", "", name)
    for suffix in COMPANY_SUFFIXES:
        cleaned = re.sub(rf"(?i)\b({suffix})\b\.?", "", cleaned).strip()
    return cleaned


def expand_title(title: str) -> str:
    """Two-pass title abbreviation expansion (experience_normalizer.py:77-109).
    Compound patterns first, then single-word with optional periods."""
    if not title:
        return ""
    expanded = title
    for pattern, full in TITLE_ABBREVIATIONS:
        if r"\s*" in pattern or " " in pattern:
            expanded = re.sub(rf"(?i)\b{pattern}\b", full, expanded)
    for pattern, full in TITLE_ABBREVIATIONS:
        if r"\s*" not in pattern and " " not in pattern:
            expanded = re.sub(rf"(?i)\b{pattern}\b", full, expanded)
    return expanded


def extract_gpa(text: str) -> Optional[float]:
    """GPA extract with scale-indicator veto (education_normalizer.py:198-219).

    NOTE the reference vetoes when the string contains 'out of'/'on'/'scale'
    anywhere — '3.8/4.0' alone passes, 'GPA 3.5 on a 4.0 scale' is vetoed.
    """
    if not text:
        return None
    m = re.search(GPA_RE, text)
    if m and re.search(GPA_VETO_RE, text):
        return None
    if m:
        try:
            return float(m.group(1))
        except ValueError:
            return None
    return None


def split_entries(section_text: str) -> list[str]:
    """Entry segmentation `\\n(?=[A-Z][^a-z])` (entity_extractor.py:135,166,280)."""
    if not section_text.strip():
        return []
    return [e.strip() for e in re.split(ENTRY_SPLIT_RE, section_text) if e.strip()]


# --- F14: field-of-study normalization (education_normalizer.py:145-165) ---

FIELD_ABBREV: tuple[tuple[str, str], ...] = (
    (r"\bCS\b", "Computer Science"),
    (r"\bEE\b", "Electrical Engineering"),
    (r"\bCE\b", "Computer Engineering"),
    (r"\bMIS\b", "Management Information Systems"),
)

# The reference ships no data/education/fields.json (its loader falls back
# to {}); this original mapping is shaped like its unit-test fixture so
# variant canonicalization is a real, exercised path.
FIELD_MAPPING: dict[str, list[str]] = {
    "Computer Science": ["Comp Sci", "CompSci", "Computing Science"],
    "Electrical Engineering": ["Electric Engineering"],
    "Computer Engineering": ["Comp Engineering"],
    "Business Administration": ["Business Admin"],
    "Information Technology": ["IT"],
    "Management Information Systems": ["Info Systems"],
}

# raw-field capture for keyword misses: "BS in CS", "Master of Comp Sci".
# The capture is a run of Title-Case words (RE2-compatible, no lookahead)
# so trailing lower-case prose ("... from State" -> stops at 'from')
# never rides along.
FIELD_AFTER_DEGREE_RE = (
    r"\b(?i:bachelor|master|phd|bsc|msc|mba|ba|bs|ms|ma)\b\.?\s*"
    r"(?i:of\s+(?:science|arts)\s+)?(?i:of|in)\s+"
    r"([A-Z][A-Za-z]*(?:\s+[A-Z][A-Za-z]*)*)"
)


def normalize_field(field: str, mapping: Optional[dict[str, list[str]]] = None) -> str:
    """Field-of-study normalization (education_normalizer.py:145-165):
    CS/EE/CE/MIS abbreviation expansion, camelCase word split, then
    case-insensitive canonicalization against the field mapping;
    passthrough otherwise."""
    if not field:
        return ""
    clean = field
    for pat, repl in FIELD_ABBREV:
        clean = re.sub(pat, repl, clean, flags=re.IGNORECASE)
    clean = re.sub(r"([a-z])([A-Z])", r"\1 \2", clean)
    if not clean:
        return field
    mapping = FIELD_MAPPING if mapping is None else mapping
    low = clean.lower()
    for canonical, variants in mapping.items():
        if low == canonical.lower():
            return canonical
        if any(low == v.lower() for v in variants):
            return canonical
    return clean


_FIELD_OF_STUDY_PATTERNS: Optional[list] = None


def extract_field_of_study(text: str) -> Optional[str]:
    """F15 keyword lookup, with an F14 fallback: when no known field
    keyword appears, capture the phrase after 'in/of' following a degree
    word ('BS in CS') and run it through normalize_field."""
    # compile the per-field word-boundary patterns ONCE (lazy, so import
    # order vs FIELDS_OF_STUDY stays irrelevant): the previous inline
    # re.escape + concat + re-cache lookup ran per field per call —
    # ~37 escapes/compile-lookups per entry, ~15% of entity-extraction
    # CPU in the fused pipeline profile. Same patterns, same first-in-
    # list-order semantics.
    global _FIELD_OF_STUDY_PATTERNS
    if _FIELD_OF_STUDY_PATTERNS is None:
        _FIELD_OF_STUDY_PATTERNS = [
            (field, re.compile(r"(?i)\b" + re.escape(field) + r"\b"))
            for field in FIELDS_OF_STUDY
        ]
    for field, pat in _FIELD_OF_STUDY_PATTERNS:
        if pat.search(text):
            return field
    m = re.search(FIELD_AFTER_DEGREE_RE, text)
    if m:
        normalized = normalize_field(m.group(1).strip())
        return normalized or None
    return None


def extract_degree_raw(text: str) -> Optional[str]:
    m = re.search(DEGREE_FALLBACK_RE, text)
    return m.group(0) if m else None


def extract_institution_raw(text: str) -> Optional[str]:
    m = re.search(INSTITUTION_FALLBACK_RE, text)
    return m.group(0) if m else None


def extract_company_raw(text: str) -> Optional[str]:
    m = re.search(COMPANY_FALLBACK_RE, text)
    return m.group(1) if m else None


def extract_position_raw(text: str) -> Optional[str]:
    m = re.search(POSITION_FALLBACK_RE, text)
    return m.group(0) if m else None


PROJECT_BOUNDARIES = (
    r"\n(?=[A-Z][\w\s-]+ - [\w\s]+(?:app|system|platform|game))",
    r"\n(?=\d+\.\s+[A-Z][\w\s-]+)",
    r"\n(?=Project \d+:)",
    r"\n(?=\s*[•\-*]?\s*[A-Z][^\n:]+[:\n])",
    r"\n\n(?=[A-Z])",
)


def split_project_entries(text: str) -> list[str]:
    """Project boundary split (entity_extractor.py:238-253)."""
    pattern = "|".join(PROJECT_BOUNDARIES)
    return [e.strip() for e in re.split(pattern, text) if e.strip()]


def parse_project_entry(text: str) -> tuple[str, Optional[str]]:
    """(name, description) from one project entry
    (entity_extractor.py:255-264)."""
    parts = text.split("\n", 1)
    name = parts[0].strip()
    description = parts[1].strip() if len(parts) > 1 else None
    name = re.sub(r"^[\s•\-*]+\s*", "", name)
    name = re.sub(r":\s*", "", name)
    return name, description


# --- F21: experience description cleanup (experience_normalizer.py:137-154)

def normalize_description(description: str) -> str:
    """Job-description cleanup: strip leading bullets/numbering per line
    (multiline ^[\\s•\\-*]+), collapse whitespace to single spaces, trim,
    capitalize the first letter."""
    if not description:
        return ""
    description = re.sub(r"^[\s•\-*]+", "", description, flags=re.MULTILINE)
    description = re.sub(r"\s+", " ", description).strip()
    if description:
        description = description[0].upper() + description[1:]
    return description


# --- F26: achievements extraction FSM (education_normalizer.py:236-295) ---

ACHIEVEMENT_MARKERS = (
    "achievements:", "accomplishments:", "awards:", "honors:",
    "academic achievements", "notable achievements",
)
ACHIEVEMENT_INDICATORS = (
    "awarded", "received", "achieved", "earned", "graduated",
    "dean's list", "honor roll", "distinction", "cum laude",
    "gpa", "grade", "score", "rank", "medal", "prize",
    "scholarship", "fellowship", "grant",
)
DEFAULT_ACHIEVEMENT = "Successfully completed coursework and requirements"


def extract_achievements(description: str) -> tuple[list[str], str]:
    """Achievements FSM over an education entry's description lines:
    marker lines flip into achievements mode; bullet/numbered lines are
    achievements anywhere; in-mode plain lines are achievements too.
    Falls back to indicator-keyword lines, then to the default filler.
    Returns (achievements, description rewritten to the non-achievement
    lines). A bullet line that strips to nothing falls through to the
    mode branch, exactly like the reference's control flow."""
    achievements: list[str] = []
    kept: list[str] = []
    in_ach = False
    for line in (description or "").split("\n"):
        line = line.strip()
        if not line:
            continue
        low = line.lower()
        if any(m in low for m in ACHIEVEMENT_MARKERS):
            in_ach = True
            continue
        if line.startswith("•") or line.startswith("-") or re.match(r"^\d+\.", line):
            ach = line.lstrip("•- ").strip()
            if ach:
                achievements.append(ach)
                continue
        if in_ach:
            achievements.append(line)
        else:
            kept.append(line)
    if not achievements:
        for line in kept:
            low = line.lower()
            if any(ind in low for ind in ACHIEVEMENT_INDICATORS):
                achievements.append(line)
    if not achievements:
        achievements = [DEFAULT_ACHIEVEMENT]
    return achievements, "\n".join(kept)


# ---------------------------------------------------------------------------
# Composite per-section extraction (deterministic path of
# entity_extractor._extract_{education,experience,projects}; NER excluded)
# ---------------------------------------------------------------------------


def normalize_institution(
    name: str,
    mapping: dict[str, list[str]] | None = None,
    index: list[str] | None = None,
    threshold: float = 85.0,
) -> str:
    """education_normalizer.py:52-89: clean, exact index hit, fuzzy, else
    'Unknown'."""
    if not name:
        return "Unknown"
    clean = normalize_institution_text(name)
    if not clean:
        return "Unknown"
    mapping = mapping or {}
    index = index if index is not None else _index_of(mapping)
    if clean in index:
        return _canonical_of(clean, mapping)
    match = best_fuzzy_match(clean, index, threshold) if index else None
    if match is not None:
        return _canonical_of(match, mapping)
    return "Unknown"


def normalize_degree(
    degree: str,
    mapping: dict[str, list[str]] | None = None,
    index: list[str] | None = None,
    threshold: float = 85.0,
) -> str:
    """education_normalizer.py:92-129: expansion chain, exact, fuzzy,
    else the cleaned string."""
    if not degree:
        return ""
    clean = expand_degree(degree)
    if not clean:
        return degree
    mapping = mapping or {}
    index = index if index is not None else _index_of(mapping)
    if clean in index:
        return _canonical_of(clean, mapping)
    match = best_fuzzy_match(clean, index, threshold) if index else None
    if match is not None:
        return _canonical_of(match, mapping)
    return clean


def normalize_company(
    name: str,
    mapping: dict[str, list[str]] | None = None,
    index: list[str] | None = None,
    threshold: float = 85.0,
) -> str:
    """experience_normalizer.py:56-75: suffix-strip, match, else ORIGINAL name."""
    if not name:
        return ""
    cleaned = strip_company_suffixes(name)
    mapping = mapping or {}
    index = index if index is not None else _index_of(mapping)
    if cleaned in index:
        return _canonical_of(cleaned, mapping)
    match = best_fuzzy_match(cleaned, index, threshold) if index else None
    if match is not None:
        return _canonical_of(match, mapping)
    return name


def normalize_title(
    title: str,
    mapping: dict[str, list[str]] | None = None,
    index: list[str] | None = None,
    threshold: float = 90.0,
) -> str:
    """experience_normalizer.py:77-109: expand abbreviations, match expanded
    then original, else expanded."""
    if not title:
        return ""
    expanded = expand_title(title)
    mapping = mapping or {}
    index = index if index is not None else _index_of(mapping)
    for cand in (expanded, title):
        if cand in index:
            return _canonical_of(cand, mapping)
        match = best_fuzzy_match(cand, index, threshold) if index else None
        if match is not None:
            return _canonical_of(match, mapping)
    return expanded


def _index_of(mapping: dict[str, list[str]]) -> list[str]:
    index: list[str] = []
    for canonical, variants in mapping.items():
        if canonical not in index:
            index.append(canonical)
        for v in variants:
            if v not in index:
                index.append(v)
    return index


def _canonical_of(variant: str, mapping: dict[str, list[str]]) -> str:
    for canonical, variants in mapping.items():
        if variant == canonical or variant in variants:
            return canonical
    return variant


def extract_education_entries(
    text: str,
    institutions: dict[str, list[str]] | None = None,
    degrees: dict[str, list[str]] | None = None,
    as_of: date = AS_OF,
) -> list[dict]:
    """entity_extractor.py:128-157, deterministic path."""
    entries = []
    for entry in split_entries(text):
        start, end = extract_period(entry, as_of)
        achievements, description = extract_achievements(entry)
        entries.append({
            "institution": normalize_institution(
                extract_institution_raw(entry) or "", institutions
            ),
            "degree": normalize_degree(extract_degree_raw(entry) or "", degrees),
            "field_of_study": extract_field_of_study(entry),
            "start_date": start,
            "end_date": end,
            "description": description,
            "gpa": extract_gpa(entry),
            "achievements": achievements,
        })
    return entries


def extract_experience_entries(
    text: str,
    companies: dict[str, list[str]] | None = None,
    titles: dict[str, list[str]] | None = None,
    skill_lower_index: dict[str, str] | None = None,
    skill_var2canon: dict[str, str] | None = None,
    skill_index: list[str] | None = None,
    as_of: date = AS_OF,
    memo: Optional[dict[str, Optional[str]]] = None,
) -> list[dict]:
    """entity_extractor.py:159-189, deterministic path. Dates stringified
    like the reference (str(date) -> ISO)."""
    entries = []
    for entry in split_entries(text):
        start, end = extract_period(entry, as_of)
        technologies: list[str] = []
        if skill_index is not None:
            technologies = extract_skills(
                entry, skill_lower_index or {}, skill_var2canon or {},
                skill_index, memo=memo,
            )
        entries.append({
            "company": normalize_company(extract_company_raw(entry) or "", companies),
            "position": normalize_title(extract_position_raw(entry) or "", titles),
            "start_date": str(start) if start else None,
            "end_date": str(end) if end else None,
            "description": normalize_description(entry),
            "technologies": technologies,
            "duration_months": duration_months(start, end, as_of),
        })
    return entries


def extract_project_entries(
    text: str,
    skill_lower_index: dict[str, str] | None = None,
    skill_var2canon: dict[str, str] | None = None,
    skill_index: list[str] | None = None,
    memo: Optional[dict[str, Optional[str]]] = None,
) -> list[dict]:
    """entity_extractor.py:217-271, deterministic path."""
    projects = []
    for entry in split_project_entries(text):
        name, description = parse_project_entry(entry)
        if not name:
            continue
        technologies: list[str] = []
        if description and skill_index is not None:
            technologies = extract_skills(
                description, skill_lower_index or {}, skill_var2canon or {},
                skill_index, memo=memo,
            )
        projects.append({
            "name": name,
            "description": description,
            "technologies": technologies,
        })
    return projects


# ---------------------------------------------------------------------------
# PII (regex recognizers + hash/mask/token strategies; pii_handler.py)
# ---------------------------------------------------------------------------

PII_RULES: tuple[tuple[str, str], ...] = (
    ("EMAIL", EMAIL_RE),
    ("PHONE", r"\b(?:\+\d{1,2}\s?)?(?:\(\d{3}\)|\d{3})[-.\s]?\d{3}[-.\s]?\d{4}\b"),
    ("SSN", r"\b\d{3}[-]?\d{2}[-]?\d{4}\b"),
)

DEFAULT_SALT = "secure_salt_value"


def pii_hash(value: str, salt: str = DEFAULT_SALT) -> str:
    """Salted sha256 truncated to 8 hex (pii_handler.py:103-104)."""
    return hashlib.sha256(f"{value}{salt}".encode()).hexdigest()[:8]


def mask_email(value: str) -> str:
    parts = value.split("@")
    if len(parts) == 2 and parts[0]:
        return f"{parts[0][0]}***@{parts[1]}"
    return "[EMAIL_REDACTED]"


def mask_phone(value: str) -> str:
    digits = re.sub(r"\D", "", value)
    if len(digits) >= 7:
        return f"{digits[:3]}***{digits[-4:]}"
    return "[PHONE_REDACTED]"


def anonymize_text(text: str, strategy: str = "hash", salt: str = DEFAULT_SALT) -> str:
    """Regex-recognizer anonymization (pii_handler.py:29-101 semantics,
    hash/mask/token strategies; entities replaced left-to-right, first
    matching rule wins per span)."""
    matches: list[tuple[int, int, str, str]] = []
    taken: list[tuple[int, int]] = []
    for ent_type, pattern in PII_RULES:
        for m in re.finditer(pattern, text):
            span = (m.start(), m.end())
            if any(not (span[1] <= s or span[0] >= e) for s, e in taken):
                continue
            taken.append(span)
            matches.append((m.start(), m.end(), ent_type, m.group(0)))
    matches.sort(key=lambda x: x[0])
    counters: dict[str, int] = {}
    out: list[str] = []
    pos = 0
    for start, end, ent_type, value in matches:
        out.append(text[pos:start])
        if strategy == "hash":
            out.append(f"[{ent_type}_{pii_hash(value, salt)}]")
        elif strategy == "mask":
            if ent_type == "EMAIL":
                out.append(mask_email(value))
            elif ent_type == "PHONE":
                out.append(mask_phone(value))
            else:
                out.append(f"[{ent_type}_REDACTED]")
        else:  # token
            counters[ent_type] = counters.get(ent_type, 0) + 1
            out.append(f"[{ent_type}_{counters[ent_type]}]")
        pos = end
    out.append(text[pos:])
    return "".join(out)


# ---------------------------------------------------------------------------
# PDF layout pass: geometric reading-order inference (north_star
# "line clustering by y-offset, column detection, reading-order sort";
# reference analogue: implicit PyMuPDF block order, layout_analyzer.py:17-59)
# ---------------------------------------------------------------------------

X_STRIDE = 1024        # offset = y * X_STRIDE + x (int32-safe to ~2M lines)
LINE_GAP = 1           # y units; larger jumps start a new line cluster
                       # (baseline jitter is <=1, row spacing is >=3, so
                       # chaining cannot bridge rows even when two columns'
                       # baselines interleave)
GUTTER_MIN = 100       # x units; smallest gap that can split columns
COL_MIN_SPANS = 2      # a side needs >= this many spans to be a column


def decode_offset(offset: int) -> tuple[int, int]:
    """(y, x) from a packed geometric offset."""
    return offset // X_STRIDE, offset % X_STRIDE


def encode_offset(y: int, x: int) -> int:
    return y * X_STRIDE + x


def layout_reading_order(spans: list[dict]) -> list[dict]:
    """Infer reading order from span geometry — the layout pass a naive
    y-sorted PDF text dump needs before any downstream stage:

      1. decode offset -> (y, x)
      2. cluster ys into lines (gap > LINE_GAP starts a new line)
      3. detect a column gutter: the largest x-gap >= GUTTER_MIN with
         >= COL_MIN_SPANS spans on each side
      4. reading order = (column, line, x, y, stored index) —
         column-major, top-down, left-right; geometric y-tiebreak within
         a merged line cluster, stored order only for exact (y, x) ties

    Single-column docs (all x within GUTTER_MIN) degrade to plain y-order,
    so the pass is safe to run unconditionally.
    """
    if not spans:
        return []
    pts = []
    for i, s in enumerate(spans):
        y, x = decode_offset(s["offset"] or 0)
        pts.append((y, x, i))

    ys = sorted({p[0] for p in pts})
    line_of: dict[int, int] = {}
    line = 0
    prev = ys[0]
    for y in ys:
        if y - prev > LINE_GAP:
            line += 1
        line_of[y] = line
        prev = y

    xs = sorted({p[1] for p in pts})
    gutter: Optional[int] = None
    if len(xs) >= 2:
        best_gap, best_x = 0, None
        for a, b in zip(xs, xs[1:]):
            if b - a > best_gap:
                best_gap, best_x = b - a, b
        if best_gap >= GUTTER_MIN and best_x is not None:
            left = sum(1 for p in pts if p[1] < best_x)
            if left >= COL_MIN_SPANS and len(pts) - left >= COL_MIN_SPANS:
                gutter = best_x

    def key(p: tuple[int, int, int]) -> tuple[int, int, int, int, int]:
        y, x, i = p
        col = 0 if gutter is None or x < gutter else 1
        # y before stored index: two same-x spans merged into one line
        # cluster must order by geometry, not by array order (hypothesis
        # stored-order-invariance property)
        return (col, line_of[y], x, y, i)

    return [spans[i] for (_, _, i) in sorted(pts, key=key)]
