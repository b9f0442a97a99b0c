"""Amend / gap-fill: resolve dangling object references (J7).

The reference's src/action/ammend.js finds every IRI that appears as
the object of some triple but has no outgoing triples of its own
(`filter not exists {?element ?p ?o}`), fetches each missing element
from MMS over HTTP, and triplifies it — iterating until closure.

Spark restatement: the detection is one left-anti join; there is no
remote system to fetch from, so gap-fill mints placeholder elements
(typed mms-class:Unresolved) for dangling references, making the graph
closed for downstream LPG projection (no Void explosion) while keeping
the unresolved set queryable as its own side output. One batch
iteration is idempotent: re-running on an amended graph finds nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mms_rdf_spark.vocab import RDF_NIL


def dangling_objects(triples: DataFrame) -> DataFrame:
    """Distinct object IRIs (!= rdf:nil) with no outgoing triples —
    the reference's detection query (ammend.js:27-39) as an anti-join."""
    objects = (
        # rdf:type objects are class IRIs, not element references — the
        # reference's detection query likewise scans only object
        # properties (ammend.js:27-39 binds ?p over data properties).
        triples.where(F.col("object_is_iri") & (F.col("object") != RDF_NIL)
                      & (F.col("predicate") != "rdf:type"))
        .select(F.col("object").alias("iri")).distinct()
    )
    subjects = triples.select(F.col("subject").alias("iri")).distinct()
    return objects.join(subjects, on="iri", how="left_anti")


def amend_triples(triples: DataFrame) -> DataFrame:
    """Placeholder triples for every dangling reference (gap-fill).

    Returns new triples (TRIPLE_SCHEMA) to union with the graph:
      (iri, rdf:type, mms-class:Unresolved)
      (iri, mms-ontology:elementId, <iri> literal)
    """
    d = dangling_objects(triples)
    mk = lambda df: (  # noqa: E731
        df.withColumn("datatype", F.lit(None).cast("string"))
        .withColumn("lang", F.lit(None).cast("string"))
        .withColumn("idx", F.lit(None).cast("int"))
        .withColumn("conv_id", F.lit(None).cast("string"))
        .withColumn("turn_idx", F.lit(None).cast("int"))
    )
    cols = ["subject", "predicate", "object", "object_is_iri",
            "datatype", "lang", "idx", "conv_id", "turn_idx"]
    types = mk(
        d.select(F.col("iri").alias("subject"),
                 F.lit("rdf:type").alias("predicate"),
                 F.lit("mms-class:Unresolved").alias("object"),
                 F.lit(True).alias("object_is_iri"))
    ).select(cols)
    ids = mk(
        d.select(F.col("iri").alias("subject"),
                 F.lit("mms-ontology:elementId").alias("predicate"),
                 F.col("iri").alias("object"),
                 F.lit(False).alias("object_is_iri"))
    ).withColumn("datatype", F.lit("xsd:string")).select(cols)
    return types.unionByName(ids)


def amend(triples: DataFrame) -> DataFrame:
    """One idempotent amend pass: graph ∪ placeholders."""
    return triples.unionByName(amend_triples(triples))


def graph_diff(old: DataFrame, new: DataFrame,
               keys: list[str] | None = None) -> DataFrame:
    """Snapshot diff between two graph versions: one row per triple
    present in exactly one side, tagged `change` = 'added' | 'removed'.
    The KG-versioning companion to amend (which closes gaps) and
    merge_upsert (which applies changes): a diff of consecutive
    snapshots is the audit/export artifact a downstream consumer
    replays instead of re-reading the full graph.

    Two anti-joins on the full triple key — each shuffles both sides
    once on the same key, and at scale both snapshots stored bucketed
    on (subject) make them co-partitioned merge joins. Columns compare
    null-safely (eqNullSafe), so triples differing only in a NULL
    field count as different."""
    keys = keys or ["subject", "predicate", "object"]
    o = old.select(*keys)
    n = new.select(*keys)

    def anti(left, right, tag):
        r = right.select(*[F.col(k).alias(f"_r_{k}") for k in keys])
        cond = None
        for k in keys:  # eqNullSafe: NULL fields must match themselves
            c = F.col(k).eqNullSafe(F.col(f"_r_{k}"))
            cond = c if cond is None else cond & c
        return (left.join(r, cond, "left_anti")
                .withColumn("change", F.lit(tag)))

    return anti(n, o, "added").unionByName(anti(o, n, "removed"))
