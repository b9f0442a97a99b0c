"""JSON-type literal sniffing (F6).

The reference lets the JSON runtime type override a declared xsd:string
range: boolean values become xsd:boolean, numbers xsd:integer /
xsd:double (src/class/triplifier.js:151-172 via the graphy
factory.boolean / factory.number terms). This engine's input is a
typed table, so the common messy case is the inverse: a TEXT-typed
value column holding "true" / "42" / "3.14". `sniffed_datatype`
classifies such strings with anchored regexes — not engine casts — so
Spark and any ANSI oracle agree bit-for-bit, and the literal text is
kept verbatim (the reference also emits the original lexical form).

Order matters and mirrors the reference's switch: boolean, then
integer, then double, else string. INT_RE wins over DOUBLE_RE for bare
digit runs, matching factory.number's integer/decimal split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BOOL_RE = r"^(true|false)$"
INT_RE = r"^[+-]?[0-9]+$"
DOUBLE_RE = (r"^[+-]?([0-9]+\.[0-9]*|\.[0-9]+|[0-9]+)"
             r"([eE][+-]?[0-9]+)?$")


def sniffed_datatype(val: Column) -> Column:
    """xsd datatype for a string literal, by lexical shape."""
    return (F.when(val.rlike(BOOL_RE), F.lit("xsd:boolean"))
            .when(val.rlike(INT_RE), F.lit("xsd:integer"))
            .when(val.rlike(DOUBLE_RE), F.lit("xsd:double"))
            .otherwise(F.lit("xsd:string")))


# the same classifier as ANSI SQL, for oracle parity (DuckDB
# regexp_matches is unanchored-find like Spark rlike; the ^$ anchors
# make both full-match)
SNIFF_SQL = (
    "CASE WHEN regexp_matches({v}, '" + BOOL_RE + "') THEN 'xsd:boolean' "
    "WHEN regexp_matches({v}, '" + INT_RE + "') THEN 'xsd:integer' "
    "WHEN regexp_matches({v}, '" + DOUBLE_RE + "') "
    "THEN 'xsd:double' ELSE 'xsd:string' END"
)


def sniff_string_literals(triples: DataFrame) -> DataFrame:
    """Post-pass over a triples frame: literal rows declared xsd:string
    (and not lang-tagged — lang-tagged text is prose by definition) get
    their datatype overridden by lexical sniffing. Pure projection, no
    shuffle; composes after any extractor:
    `sniff_string_literals(extract_triples(...))`."""
    is_plain_string = ((~F.col("object_is_iri"))
                       & (F.col("datatype") == "xsd:string")
                       & F.col("lang").isNull())
    return triples.withColumn(
        "datatype",
        F.when(is_plain_string, sniffed_datatype(F.col("object")))
        .otherwise(F.col("datatype")))
