"""Export sinks: Turtle text and Neptune-bulk-format LPG CSVs.

Parity with the reference's outputs:
  - Turtle serialization of the triples table (reference: graphy
    ttl_write streams per worker, src/multi/worker.js:35-39, merged by
    `cat`, util/build-local.sh:27). Spark restatement: each partition
    renders its rows to TTL lines; the output directory of part files
    IS the merged graph (any consumer cats them; prefixes emitted once
    in a header part). mapPartitions-free: the rendering is a pure
    column expression, written with the text datasource.
  - LPG CSVs with Neptune bulk-load headers `~id,~label,~from,~to`
    (reference src/lpg/convert.js:129-149).

Both are small, optional exporters — the canonical sink is the
partitioned parquet/Iceberg SPO table (materialize.write_spo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mms_rdf_spark import PREFIXES


def _term(prefixed: str) -> str:
    """Expand a prefixed name to a full IRI in <>s (driver-side, for
    the header); data-side expansion uses the same prefix table."""
    if ":" in prefixed:
        p, s = prefixed.split(":", 1)
        if p in PREFIXES:
            return f"<{PREFIXES[p]}{s}>"
    return f"<{prefixed}>"


def ttl_lines(triples: DataFrame) -> DataFrame:
    """Render each triple to one Turtle line (prefixed-name form).

    Literals are escaped minimally (backslash, quote, newline) and get
    their datatype/lang suffix; IRIs stay in prefixed form — the prefix
    header from `ttl_header()` makes the document valid."""
    lit = F.col("object")
    for pat, rep in (("\\\\", "\\\\\\\\"), ('"', '\\\\"'), ("\n", "\\\\n")):
        lit = F.regexp_replace(lit, pat, rep)
    obj = (
        F.when(F.col("object_is_iri"), F.col("object"))
        .when(F.col("lang").isNotNull(),
              F.concat(F.lit('"'), lit, F.lit('"@'), F.col("lang")))
        .when(F.col("datatype").isNotNull(),
              F.concat(F.lit('"'), lit, F.lit('"^^'), F.col("datatype")))
        .otherwise(F.concat(F.lit('"'), lit, F.lit('"')))
    )
    return triples.select(
        F.concat_ws(" ", F.col("subject"), F.col("predicate"), obj,
                    F.lit(".")).alias("value"))


def ttl_header() -> str:
    return "\n".join(f"@prefix {p}: <{iri}> ."
                     for p, iri in sorted(PREFIXES.items())) + "\n"


def write_ttl(triples: DataFrame, path: str) -> None:
    """Triples -> directory of .ttl part files + header file. The
    concatenation of header + parts is one valid Turtle document (the
    reference's master.ttl merge, without the driver bottleneck)."""
    import os

    ttl_lines(triples).write.mode("overwrite").text(path)
    with open(os.path.join(path, "_prefixes.ttl"), "w") as fh:
        fh.write(ttl_header())


def write_lpg_csvs(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Neptune bulk-loader CSV layout: nodes/ and edges/ directories
    with `~id,~label,...` headers (reference convert.js fd3/fd4)."""
    nodes.write.mode("overwrite").option("header", True).csv(f"{out_dir}/nodes")
    (edges.select("~id", "~label", "~from", "~to")
     .write.mode("overwrite").option("header", True).csv(f"{out_dir}/edges"))
