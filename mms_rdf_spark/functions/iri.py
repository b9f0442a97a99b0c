"""IRI minting + sanitization — the deterministic core of triple identity.

Behavioral parity with the reference converter (see SURVEY.md §2.7):
  - suffix sanitization: whitespace -> '_', '<' and '>' -> '-'
    (reference: src/class/triplifier.js:18-22)
  - element IRIs:   mms-element:<sanitized id>
    (reference: src/class/triplifier.js:24-33)
  - artifact IRIs:  mms-artifact:<Type>.ID:<sanitized id>, with
    mms-artifact:Unknown.ID: as the unknown-type fallback
    (reference: src/class/triplifier.js:35-58)
  - ordered-list member IRIs carry an explicit Index:<i>
    (reference: src/class/triplifier.js:264-277) — we keep the index in
    a dedicated `idx` column instead of baking it into the IRI, which is
    the join-friendly (and order-stable-under-repartition) encoding.

Both a plain-Python form (shared with the single-process oracle so the
P/R comparison tests one semantics, two engines) and a Column form
(whole-stage-codegen'd JVM expressions for the Spark hot path) are
provided. The Column forms are the ones used in the pipeline.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# mention surface syntaxes embedded in transcript text (FIXTURES.md §1).
# Same regex strings are compiled by Python `re` (oracle) and by the JVM
# (Spark regexp_extract_all) — the char classes are identical in both.
MENTION_RE = r"@entity:([A-Za-z0-9_<>-]+)"
URL_RE = r"(https?://[A-Za-z0-9./_-]+)"
EMAIL_RE = r"([A-Za-z0-9._-]+@[A-Za-z0-9-]+\.[a-z]{2,6})"

# mention kinds: (vocab key, regex, artifact type, required literal).
# The kind dimension of the mentions model — each kind is its own
# ordered-list property with its own artifact class (FIXTURES.md
# mentions.kind). The literal is a SOUND pre-filter: the regex cannot
# match a string that lacks it, so `contains(literal)` guards the
# (much more expensive) regex scan — texts without the marker skip the
# regex entirely.
MENTION_KINDS = [
    ("_mentions", MENTION_RE, "Mention", "@entity:"),
    ("_urls", URL_RE, "Url", "http"),
    ("_emails", EMAIL_RE, "Email", "@"),
]

_WS_RE = re.compile(r"\s+")


# ---------------------------------------------------------------- python form
def sanitize_suffix(s: str) -> str:
    """whitespace -> '_', '<'/'>' -> '-' (triplifier.js:18-22 parity)."""
    return _WS_RE.sub("_", s).replace("<", "-").replace(">", "-")


def element_iri(element_id: str) -> str:
    return "mms-element:" + sanitize_suffix(element_id)


def artifact_iri(type_name: str | None, element_id: str) -> str:
    t = type_name if type_name else "Unknown"
    return f"mms-artifact:{t}.ID:" + sanitize_suffix(element_id)


def turn_element_id(conv_id: str, turn_idx: int) -> str:
    """Stable per-turn source id: the analog of the reference's element
    `id` field — derived from data only, never from partition order."""
    return f"{conv_id}.Turn.{turn_idx}"


# ---------------------------------------------------------------- column form
def sanitize_suffix_col(c: Column) -> Column:
    # translate replaces the two single-char regexp_replace calls:
    # identical output (1:1 char map, no pattern semantics involved),
    # one regex engine per value instead of three — this runs on every
    # subject/artifact/mention IRI the extractor mints (round-6; the
    # \s+ RUN-collapse must stay a regex)
    return F.translate(F.regexp_replace(c, r"\s+", "_"), "<>", "--")


def element_iri_col(id_col: Column) -> Column:
    return F.concat(F.lit("mms-element:"), sanitize_suffix_col(id_col))


def artifact_iri_col(type_name: str, id_col: Column) -> Column:
    return F.concat(F.lit(f"mms-artifact:{type_name}.ID:"), sanitize_suffix_col(id_col))


def mention_surfaces_split(text) -> Column:
    """@entity: mention surfaces as the SPLIT formulation — value-
    identical to regexp_extract_all(text, MENTION_RE, 1)
    (property-tested in test_functions.py): split on the literal
    marker, take each tail's class-prefix via a limit-2 split (the
    Matcher stops at the first non-class char of a SHORT string), drop
    empties (regex's +). Built to attack the extractor's regexp
    thread-scaling bottleneck (JFR: UTF8String->String copies +
    Matcher state, BASELINE.md) — MEASURED OUTCOME
    (tools/bench_mention_forms.py): ~2x SLOWER than
    regexp_extract_all at 1 AND 8 cores (two regex passes + array
    churn outweigh the allocation savings), scaling only marginally
    better (2.43x vs 2.24x at 1->8). regexp_extract_all stays the
    production form; this one remains as the pinned-equivalent
    control."""
    t = F.coalesce(text, F.lit(""))
    parts = F.split(t, r"@entity:")
    tails = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    return F.filter(
        F.transform(tails,
                    lambda p: F.split(p, r"[^A-Za-z0-9_<>-]", 2)[0]),
        lambda m: m != "")
