"""Turtle scan (S6): the inverse of sinks.ttl_lines/write_ttl.

The reference's LPG converter consumes the merged master.ttl
(src/lpg/convert.js reads the Turtle graph the triplifier emitted).
This scan reads the line-oriented Turtle this engine writes — one
`subject predicate object .` statement per line, prefixed names, the
sink's minimal literal escaping (backslash, quote, newline) — back
into the canonical triples shape, entirely with column expressions
over `spark.read.text` (line-based splits parallelize for free; no
per-row Python).

Not a general Turtle parser: multi-line statements, semicolon
predicate lists, and bare blank nodes are out of scope (the sink never
emits them). `@prefix` headers and blank lines are skipped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# statement line: subject SP predicate SP object SP '.'
_LINE_RE = r"^(\S+) (\S+) (.*) \.$"

# sentinel for order-safe unescaping (a private-use codepoint the sink
# can never emit: its input is parquet-clean text)
_SENTINEL = "\ue000"


def _unescape(body: Column) -> Column:
    """Invert the sink's escape (backslash first, then quote/newline).
    A literal `\\\\` must not feed the `\\n` rule, so it detours
    through a sentinel."""
    c = F.regexp_replace(body, r"\\\\", _SENTINEL)
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r"\\\"", '"')
    return F.regexp_replace(c, _SENTINEL, r"\\")


def read_ttl(spark: SparkSession, path: str) -> DataFrame:
    """Turtle part files -> (subject, predicate, object, object_is_iri,
    datatype, lang). List positions (idx) are not present in Turtle —
    recover them from collection form via
    operators.collections.unroll_collections when the graph was
    emitted with to_rdf_collection."""
    lines = spark.read.text(path).where(
        (F.col("value") != "") & ~F.col("value").startswith("@prefix"))
    parsed = lines.select(
        F.regexp_extract("value", _LINE_RE, 1).alias("subject"),
        F.regexp_extract("value", _LINE_RE, 2).alias("predicate"),
        F.regexp_extract("value", _LINE_RE, 3).alias("obj"),
    ).where(F.col("subject") != "")
    is_literal = F.col("obj").startswith('"')
    # structural split at the LAST quote — escaping guarantees no raw
    # quote inside the body and none after it, and unlike a
    # (?:[^"\]|\\.)* body regex this never backtracks (long literals
    # blow the JVM regex stack otherwise)
    suffix = F.regexp_extract("obj", r'"([^"]*)$', 1)
    body = F.expr(
        "substring(obj, 2, length(obj) - length("
        "regexp_extract(obj, '\"([^\"]*)$', 1)) - 2)")
    dt = F.when(suffix.startswith("^^"), F.substring(suffix, 3, 1 << 20))
    lang = F.when(suffix.startswith("@"), F.substring(suffix, 2, 1 << 20))
    return parsed.select(
        "subject", "predicate",
        F.when(is_literal, _unescape(body)).otherwise(F.col("obj"))
        .alias("object"),
        (~is_literal).alias("object_is_iri"),
        F.when(is_literal, dt).alias("datatype"),
        F.when(is_literal, lang).alias("lang"),
    )
