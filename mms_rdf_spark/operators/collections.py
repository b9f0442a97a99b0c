"""RDF collection (rdf:first/rdf:rest) emission and the inverse walk.

The engine's internal encoding for ordered lists is the `idx` column
(functions/iri.py:12-15) — join-friendly and repartition-stable. The
reference emits REAL RDF collections: every ordered-list value becomes
a cons chain of rdf:first/rdf:rest triples, with per-index sequence
IRIs `…Element:<id>.Index:<i>` for ElementList members
(reference src/class/triplifier.js:256-288), and downstream consumers
walk the chain — SPARQL `p/rdf:rest*/rdf:first` or the recursive
unroll in src/lpg/convert.js:28-46.

This module closes that interchange gap, both directions:

  to_rdf_collection    idx-encoded triples -> collection-form triples.
                       Cons cells get deterministic IRIs carrying the
                       reference's `.Index:<i>` suffix (never blank
                       nodes — blank-node labels are not stable across
                       distributed writers). One shuffle: the
                       (subject, predicate) window that links each cons
                       cell to its successor.

  unroll_collections   collection-form triples -> idx-encoded triples.
                       Does NOT parse the Index suffix (foreign graphs
                       won't have it): positions come from a
                       pointer-doubling walk over reversed rdf:rest
                       edges — O(log L) self-joins for the longest
                       list L, the distributed restatement of
                       convert.js's driver-side recursion.

  sequence_member_elements   the ElementList variant: ordered members
                       are re-minted as per-index sequence elements
                       with an mms-ontology:path back-pointer
                       (triplifier.js:260-277).

Round-trip (idx -> collection -> idx) is byte-identical for dense
0-based idx — which every emitter in this engine produces (window
row_number - 1 for turns, regexp match position for mentions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mms_rdf_spark.functions.iri import sanitize_suffix_col
# one source of truth for the triple column set (drives _blank and
# every select below) — never a hand-copied list
from mms_rdf_spark.operators.extract import TRIPLE_COLS
from mms_rdf_spark.vocab import RDF_NIL

RDF_FIRST = "rdf:first"
RDF_REST = "rdf:rest"


def _cons_iri(subject: Column, predicate: Column, idx: Column) -> Column:
    """Deterministic cons-cell IRI:
    `<subject>.<sanitized-full-predicate>.Index:<i>`.

    Carries the reference's `.Index:<i>` member-IRI convention
    (triplifier.js:266) so a human reading the graph sees the position;
    the inverse walk never relies on it. The FULL predicate (prefix
    included, ':' mapped to '_') keys the cell — a local name alone
    would collide two prefixes sharing it on one subject and merge
    their chains."""
    safe_pred = F.regexp_replace(
        sanitize_suffix_col(predicate), ":", "_")
    return F.concat(subject, F.lit("."), safe_pred,
                    F.lit(".Index:"), idx.cast("string"))


def _blank(df: DataFrame) -> DataFrame:
    """Null out provenance-optional columns absent from a partial frame."""
    for name in TRIPLE_COLS:
        if name not in df.columns:
            df = df.withColumn(name, F.lit(None))
    return df.select(
        F.col("subject").cast("string"),
        F.col("predicate").cast("string"),
        F.col("object").cast("string"),
        F.col("object_is_iri").cast("boolean"),
        F.col("datatype").cast("string"),
        F.col("lang").cast("string"),
        F.col("idx").cast("int"),
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("int"),
    )


def to_rdf_collection(triples: DataFrame,
                      predicates: list[str] | None = None) -> DataFrame:
    """Rewrite idx-encoded ordered lists as RDF collections.

    Rows with a non-null idx (optionally restricted to `predicates`)
    are replaced by:
      (subject, predicate, cons_0)            -- list head
      (cons_i, rdf:first, object_i)           -- member, literal attrs kept
      (cons_i, rdf:rest,  cons_{i+1} | rdf:nil)
    Everything else passes through unchanged. The only exchange is the
    (subject, predicate) window ordering members by idx — same key as
    the list itself, so at 10^12 turns it shuffles each list once."""
    triples = _blank(triples)  # tolerate partial frames (e.g. read_ttl)
    is_list = F.col("idx").isNotNull()
    if predicates is not None:
        is_list = is_list & F.col("predicate").isin(predicates)
    lists = triples.where(is_list)
    rest = triples.where(~F.coalesce(is_list, F.lit(False)))

    w = Window.partitionBy("subject", "predicate").orderBy("idx")
    cons = _cons_iri(F.col("subject"), F.col("predicate"), F.col("idx"))
    nxt = F.lead("idx").over(w)
    annotated = lists.select(
        *TRIPLE_COLS,
        cons.alias("_cons"),
        F.when(nxt.isNull(), F.lit(RDF_NIL))
        .otherwise(_cons_iri(F.col("subject"), F.col("predicate"), nxt))
        .alias("_next"),
        F.row_number().over(w).alias("_rn"),
    )

    heads = _blank(annotated.where(F.col("_rn") == 1).select(
        "subject", "predicate", F.col("_cons").alias("object"),
        F.lit(True).alias("object_is_iri"), "conv_id", "turn_idx"))
    firsts = _blank(annotated.select(
        F.col("_cons").alias("subject"), F.lit(RDF_FIRST).alias("predicate"),
        "object", "object_is_iri", "datatype", "lang", "conv_id", "turn_idx"))
    rests = _blank(annotated.select(
        F.col("_cons").alias("subject"), F.lit(RDF_REST).alias("predicate"),
        F.col("_next").alias("object"), F.lit(True).alias("object_is_iri"),
        "conv_id", "turn_idx"))
    return (_blank(rest.select(*TRIPLE_COLS))
            .unionByName(heads).unionByName(firsts).unionByName(rests))


def unroll_collections(triples: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Inverse walk: collection-form triples -> idx-encoded triples.

    Structure-only (no Index-suffix parsing): a cons cell's position is
    its distance from the chain head, computed by pointer doubling over
    REVERSED rdf:rest edges — each round a node inherits its ancestor's
    resolved distance, so L-long chains resolve in ceil(log2 L) rounds.
    The reference walks the same chain recursively on one core
    (convert.js:28-46); this is that walk as O(log L) self-joins.

    max_rounds bounds the loop (2^40 list members is beyond any input);
    a cycle in rdf:rest would otherwise loop forever — raise instead."""
    # tolerate partial frames: a graph loaded via sources.ttl.read_ttl
    # carries only the 6 core columns; provenance/idx null-fill here
    triples = _blank(triples)
    firsts = triples.where(F.col("predicate") == RDF_FIRST)
    rest_edges = (triples.where((F.col("predicate") == RDF_REST)
                                & (F.col("object") != RDF_NIL))
                  .select(F.col("subject").alias("prev"),
                          F.col("object").alias("node")))
    cons_nodes = firsts.select(F.col("subject").alias("node")).distinct()

    # pointer doubling: state (node, anc, d) — anc = furthest known
    # ancestor along reversed rdf:rest, d = distance to it. Heads
    # anchor at themselves (anc=node, d=0); each round folds the
    # ancestor's own state in, so after k rounds anc is 2^k steps up.
    # Fixpoint: every node's ancestor is a head (contributes d2=0).
    state = (cons_nodes.join(rest_edges, on="node", how="left")
             .select("node", F.coalesce("prev", "node").alias("anc"),
                     F.when(F.col("prev").isNull(), F.lit(0)).otherwise(1)
                     .alias("d"))
             .localCheckpoint())
    for _ in range(max_rounds):
        up = state.select(F.col("node").alias("anc"),
                          F.col("anc").alias("anc2"), F.col("d").alias("d2"))
        j = state.join(up, on="anc").localCheckpoint()
        if j.where(F.col("d2") > 0).isEmpty():
            state = j.select("node", "anc", "d")
            break
        state = j.select("node", F.col("anc2").alias("anc"),
                         (F.col("d") + F.col("d2")).alias("d"))
    else:
        raise ValueError("rdf:rest chain did not resolve "
                         f"in {max_rounds} rounds (cycle?)")
    # now anc = chain head, d = 0-based position within the list

    # heads: (list subject, predicate, head cons) = rows pointing at a
    # cons node with a predicate that is not part of the chain itself
    heads = (triples.where(~F.col("predicate").isin(RDF_FIRST, RDF_REST))
             .join(cons_nodes.withColumnRenamed("node", "object"), on="object")
             .select(F.col("subject").alias("list_subject"),
                     F.col("predicate").alias("list_predicate"),
                     F.col("object").alias("head")))

    members = (firsts.withColumnRenamed("subject", "node")
               .join(state.select("node", F.col("anc").alias("head"), "d"),
                     on="node")
               .join(heads, on="head")
               .select(
                   F.col("list_subject").alias("subject"),
                   F.col("list_predicate").alias("predicate"),
                   "object", "object_is_iri", "datatype", "lang",
                   F.col("d").cast("int").alias("idx"),
                   "conv_id", "turn_idx"))

    chain_subjects = cons_nodes.withColumnRenamed("node", "subject")
    passthrough = (triples
                   .where(~F.col("predicate").isin(RDF_FIRST, RDF_REST))
                   .join(chain_subjects, on="subject", how="left_anti")
                   .join(cons_nodes.withColumnRenamed("node", "object"),
                         on="object", how="left_anti"))
    return _blank(passthrough.select(*TRIPLE_COLS)).unionByName(
        _blank(members.select(*TRIPLE_COLS)))


def sequence_member_elements(triples: DataFrame,
                             predicates: list[str] | None = None) -> DataFrame:
    """ElementList member minting (triplifier.js:260-277): each ordered
    IRI member becomes its own per-index sequence element
    `mms-artifact:<Type>.Element:<subject-id>.Index:<i>` typed
    `mms-class:<Type>` with an mms-ontology:path back-pointer to the
    original member; the list row is rewritten to point at it.
    Pure projection — no shuffle."""
    is_member = (F.col("idx").isNotNull() & F.col("object_is_iri")
                 & F.col("object").startswith("mms-artifact:"))
    if predicates is not None:
        is_member = is_member & F.col("predicate").isin(predicates)
    members = triples.where(is_member)
    rest = triples.where(~F.coalesce(is_member, F.lit(False)))

    art_type = F.regexp_extract("object", r"^mms-artifact:([^.]+)\.", 1)
    self_id = F.regexp_replace("subject", r"^mms-element:", "")
    seq = F.concat(F.lit("mms-artifact:"), art_type, F.lit(".Element:"),
                   self_id, F.lit(".Index:"), F.col("idx").cast("string"))

    rewritten = members.withColumn("_seq", seq)
    list_rows = _blank(rewritten.select(
        "subject", "predicate", F.col("_seq").alias("object"),
        F.lit(True).alias("object_is_iri"), "idx", "conv_id", "turn_idx"))
    type_rows = _blank(rewritten.select(
        F.col("_seq").alias("subject"), F.lit("rdf:type").alias("predicate"),
        F.concat(F.lit("mms-class:"), art_type).alias("object"),
        F.lit(True).alias("object_is_iri"), "conv_id", "turn_idx"))
    path_rows = _blank(rewritten.select(
        F.col("_seq").alias("subject"),
        F.lit("mms-ontology:path").alias("predicate"),
        "object", F.lit(True).alias("object_is_iri"), "conv_id", "turn_idx"))
    return (_blank(rest.select(*TRIPLE_COLS)).unionByName(list_rows)
            .unionByName(type_rows).unionByName(path_rows))
