"""Graph materialization: canonical SPO tables + LPG view.

Mirrors the reference's two outputs:
  - the RDF graph (Turtle -> triplestore; reference triplifier.js
    ttl_write + src/action/update.js) => partitioned SPO parquet/
    Iceberg tables, predicate-partitioned + subject-bucketed so
    BGP-style lookups prune partitions and subject self-joins co-locate;
  - the LPG view (Neptune bulk CSVs; reference src/lpg/convert.js) =>
    nodes / edges DataFrames, including the Void stub nodes for
    dangling edge targets (convert.js:268-273) and the predicate
    classification pass (convert.js:86-107).

The reference needed a 64 GiB single-process heap for this
(emk.js:352); here each pass is a distributed job with no ceiling.

Canonical rewrite: mention-artifact objects are replaced by their
linked canonical entity IRI (the output of link+cc), and owl:sameAs
bridges are emitted so the original artifact IRIs remain queryable —
this is the KG-construction upgrade over the reference's exact-id
identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mms_rdf_spark.vocab import RDF_NIL

# predicates never projected into the LPG (the analog of the
# reference's fixed deny-set of internal predicates, convert.js:48-64)
LPG_DENY = ["mms-ontology:elementId"]


MENTION_IRI_PREFIX = "mms-artifact:Mention.ID:"


def rewrite_mentions_canonical(triples: DataFrame, entities: DataFrame) -> DataFrame:
    """Replace mention-artifact objects with canonical entity IRIs.

    entities: (surface, entity_id, canonical_iri) from link.entity_table.

    The join is scoped to the MENTION SLICE only: rows whose object
    starts with the mention-artifact prefix. At 10^12-turn scale the
    entity side (distinct surfaces) can exceed the broadcast threshold;
    scoping means the shuffled side is the mention subset (typically
    <1% of the graph — one ordered-list entry per detected mention),
    not the full 10^12-row triples table. The non-mention remainder is
    a pure filter that never touches a join (asserted in
    tests/test_plans.py) and unions back column-aligned."""
    ent = entities.select(
        F.concat(F.lit(MENTION_IRI_PREFIX),
                 F.col("surface")).alias("mention_iri"),
        "canonical_iri",
    ).distinct()
    is_mention = F.col("object").startswith(MENTION_IRI_PREFIX)
    mention_rows = triples.where(is_mention)
    rest = triples.where(~is_mention | F.col("object").isNull())
    rewritten = (
        mention_rows.join(ent, mention_rows.object == ent.mention_iri, "left")
        .withColumn("object",
                    F.coalesce(F.col("canonical_iri"), F.col("object")))
        .drop("mention_iri", "canonical_iri")
    )
    return rest.unionByName(rewritten.select(*rest.columns))


def entity_triples(entities: DataFrame) -> DataFrame:
    """Canonical entity elements: type + surfaceForm triples + sameAs
    bridges from each mention artifact IRI (schema = TRIPLE_SCHEMA)."""
    ent = entities.select("surface", "canonical_iri").distinct()
    base = lambda df: (  # noqa: E731
        df.withColumn("datatype", F.lit(None).cast("string"))
        .withColumn("lang", F.lit(None).cast("string"))
        .withColumn("idx", F.lit(None).cast("int"))
        .withColumn("conv_id", F.lit(None).cast("string"))
        .withColumn("turn_idx", F.lit(None).cast("int"))
    )
    types = base(
        ent.select(F.col("canonical_iri").alias("subject")).distinct()
        .withColumn("predicate", F.lit("rdf:type"))
        .withColumn("object", F.lit("mms-class:Entity"))
        .withColumn("object_is_iri", F.lit(True))
    )
    surfaces = base(
        ent.select(
            F.col("canonical_iri").alias("subject"),
            F.lit("mms-property:surfaceForm").alias("predicate"),
            F.col("surface").alias("object"),
            F.lit(False).alias("object_is_iri"),
        )
    ).withColumn("datatype", F.lit("xsd:string"))
    same_as = base(
        ent.select(
            F.concat(F.lit("mms-artifact:Mention.ID:"), F.col("surface"))
            .alias("subject"),
            F.lit("owl:sameAs").alias("predicate"),
            F.col("canonical_iri").alias("object"),
            F.lit(True).alias("object_is_iri"),
        )
    )
    cols = ["subject", "predicate", "object", "object_is_iri",
            "datatype", "lang", "idx", "conv_id", "turn_idx"]
    return types.select(cols).unionByName(surfaces.select(cols)) \
        .unionByName(same_as.select(cols))


def write_spo(triples: DataFrame, path: str, buckets: int = 64) -> None:
    """Persist the graph as predicate-partitioned parquet (the Iceberg
    stand-in). Predicates are low-cardinality (vocab-bounded) so
    partition pruning turns per-predicate scans into direct directory
    reads; subjects are repartitioned within predicate so subject
    self-joins read co-located files."""
    safe_pred = F.regexp_replace("predicate", "[^A-Za-z0-9_.-]", "_")
    (
        triples.withColumn("pred_part", safe_pred)
        .repartition(buckets, "pred_part", "subject")
        .write.mode("overwrite")
        .partitionBy("pred_part")
        .parquet(path)
    )


def write_spo_bucketed(triples: DataFrame, table: str,
                       buckets: int = 64) -> None:
    """Persist the graph as a subject-BUCKETED catalog table.

    The directory layout from `write_spo` gives partition pruning per
    predicate; bucketing adds the other half of the BGP story: a
    subject self-join (every `?s p1 ?a . ?s p2 ?b` pattern, SURVEY
    §2.10) between bucketed tables is planned WITHOUT any Exchange —
    both sides are already hash-distributed and sorted on subject at
    write time, so the join cost at 10^12 triples is a per-bucket
    merge, not a full-graph shuffle (asserted in
    tests/test_plans.py::test_bucketed_spo_self_join_shuffle_free).
    On Iceberg the same declaration is a `bucket(N, subject)`
    partition transform — `tables.write_table` emits exactly that when
    the Iceberg runtime is present (the adapter seam), Spark bucketBy
    otherwise."""
    from mms_rdf_spark.tables import write_table

    return write_table(triples, table, bucket_by="subject",
                       buckets=buckets, sort_by=["subject"])


# ----------------------------------------------------------------- LPG view
def classify_predicates(triples: DataFrame) -> DataFrame:
    """Pass 1 of the LPG projection (A3): one row per predicate with
    object-kind flags deciding property-column vs edge treatment
    (reference convert.js:86-107 as a groupBy instead of a Set scan)."""
    return (
        triples.where(~F.col("predicate").isin(LPG_DENY))
        .groupBy("predicate")
        .agg(
            F.max((~F.col("object_is_iri")).cast("int")).alias("has_literal"),
            F.max((F.col("object_is_iri")
                   & (F.col("object") != RDF_NIL)).cast("int")).alias("has_edge"),
        )
    )


def lpg_nodes(triples: DataFrame) -> DataFrame:
    """Pass 2a: one row per subject that has an rdf:type; one column per
    literal-bearing predicate, multi-values ';'-joined (reference
    convert.js:170-192 pivot). Pivot values are computed from the data
    (predicate classification), not hardcoded."""
    classes = (
        triples.where((F.col("predicate") == "rdf:type"))
        .select(F.col("subject").alias("~id"), F.col("object").alias("~label"))
        .groupBy("~id").agg(F.min("~label").alias("~label"))
    )
    prop_preds = [
        r["predicate"]
        for r in classify_predicates(triples)
        .where((F.col("has_literal") == 1) & (F.col("predicate") != "rdf:type"))
        .collect()  # vocab-bounded small list — driver-side by design
    ]
    props = (
        triples.where(F.col("predicate").isin(prop_preds) if prop_preds
                      else F.lit(False))
        .where(~F.col("object_is_iri"))
        .groupBy(F.col("subject").alias("~id"))
        .pivot("predicate", prop_preds)
        .agg(F.concat_ws(";", F.sort_array(F.collect_list("object"))))
    )
    return classes.join(props, on="~id", how="left")


def lpg_edges(triples: DataFrame) -> DataFrame:
    """Pass 2b: object-property triples (object an IRI != rdf:nil) as
    LPG edges with deterministic edge ids (hash of from/label/to/idx —
    stable under repartitioning AND resumable, unlike the reference's
    driver-side e<N> counter, convert.js:73)."""
    e = (
        triples.where(F.col("object_is_iri") & (F.col("object") != RDF_NIL)
                      & (F.col("predicate") != "rdf:type")
                      & ~F.col("predicate").isin(LPG_DENY))
        .select(
            F.col("subject").alias("~from"),
            F.col("predicate").alias("~label"),
            F.col("object").alias("~to"),
            F.coalesce(F.col("idx"), F.lit(-1)).alias("_idx"),
        )
        .distinct()
    )
    return e.withColumn(
        "~id",
        F.concat(F.lit("e"),
                 F.sha2(F.concat_ws("", F.col("~from"), F.col("~label"), F.col("~to"),
                                    F.col("_idx").cast("string")), 256)
                 .substr(1, 16)),
    ).select("~id", "~label", "~from", "~to", F.col("_idx").alias("idx"))


def lpg_void_nodes(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Edge targets with no node row -> ~label: Void stubs (J8;
    reference convert.js:214,246-248,268-273). A left-anti join."""
    return (
        edges.select(F.col("~to").alias("~id")).distinct()
        .join(nodes.select("~id"), on="~id", how="left_anti")
        .withColumn("~label", F.lit("Void"))
    )


def rdfs_entailment(triples: DataFrame, tbox: DataFrame,
                    max_iterations: int = 20) -> DataFrame:
    """RDFS forward-chaining materialization: the inferred-triple DELTA
    for rules rdfs7 (subPropertyOf), rdfs2 (domain), rdfs3 (range) and
    rdfs9 (subClassOf type inheritance) over an instance graph, given
    a TBox of rdfs:subClassOf / rdfs:subPropertyOf / rdfs:domain /
    rdfs:range triples (the shape vocab.vocab_triples_pdf emits — the
    reference keeps exactly this TBox in its vocabulary named graph,
    emk.js:109,233, and hand-runs the subClassOf* closure inside its
    queries, triplifier.js:453-477; this operator materializes the
    entailment once so downstream queries are plain lookups).

    Rule composition (one pass each, fixpoint-free by construction):
    domain/range declarations are first extended through the REFLEXIVE
    subPropertyOf closure (p <= q, q domain C  =>  p domain C), so
    rdfs2/3 fire for specialized predicates; rdfs9 runs over asserted
    types UNION the rdfs2/3-derived ones, through the STRICT
    subClassOf closure. rdfs3 fires only for IRI objects (literals
    have no class membership) — rows where `object_is_iri` is false
    are excluded when the column exists.

    Returns the DISTINCT inferred (subject, predicate, object) rows
    NOT already asserted (left-anti on all three columns).

    Scale shape: the TBox is schema-sized (KBs against a 10^12-row
    instance graph), so both closures run over a frame of dozens of
    rows and every rule join is a BROADCAST against the fact stream —
    the facts are scanned a bounded number of times and never
    shuffled until the final distinct + anti-join exchange. No
    iteration touches the instance side (the closure fixpoint lives
    entirely in the TBox).
    """
    from mms_rdf_spark.plans.closure import transitive_closure

    spo = ["subject", "predicate", "object"]
    facts = triples.select(*spo, *(
        [F.col("object_is_iri")] if "object_is_iri" in triples.columns
        else [F.lit(True).alias("object_is_iri")]))

    def _tbox_edges(pred: str) -> DataFrame:
        return (tbox.where(F.col("predicate") == pred)
                .select(F.col("subject").alias("sub"),
                        F.col("object").alias("sup")).distinct())

    subprop_strict = transitive_closure(
        _tbox_edges("rdfs:subPropertyOf"),
        max_iterations=max_iterations, reflexive=False)
    # reflexive extension for domain/range: every predicate also
    # carries its own declarations
    preds = (tbox.select(F.col("subject").alias("sub")).distinct()
             .select("sub", F.col("sub").alias("sup")))
    subprop_refl = subprop_strict.unionByName(preds).distinct()
    dom_eff = (subprop_refl
               .join(_tbox_edges("rdfs:domain")
                     .select(F.col("sub").alias("sup"),
                             F.col("sup").alias("cls")),
                     on="sup")
               .select(F.col("sub").alias("p"), "cls").distinct())
    rng_eff = (subprop_refl
               .join(_tbox_edges("rdfs:range")
                     .select(F.col("sub").alias("sup"),
                             F.col("sup").alias("cls")),
                     on="sup")
               .select(F.col("sub").alias("p"), "cls").distinct())
    subcls = transitive_closure(
        _tbox_edges("rdfs:subClassOf"),
        max_iterations=max_iterations, reflexive=False)

    # rdfs7: x p y, p subPropertyOf+ q  =>  x q y
    r7 = (facts.join(F.broadcast(subprop_strict
                                 .withColumnRenamed("sub", "predicate")),
                     on="predicate")
          .select("subject", F.col("sup").alias("predicate"), "object"))
    # rdfs2: x p y, p domain C  =>  x rdf:type C
    r2 = (facts.join(F.broadcast(dom_eff.withColumnRenamed("p", "predicate")),
                     on="predicate")
          .select("subject", F.lit("rdf:type").alias("predicate"),
                  F.col("cls").alias("object")))
    # rdfs3: x p y (y IRI), p range C  =>  y rdf:type C
    r3 = (facts.where(F.col("object_is_iri"))
          .join(F.broadcast(rng_eff.withColumnRenamed("p", "predicate")),
                on="predicate")
          .select(F.col("object").alias("subject"),
                  F.lit("rdf:type").alias("predicate"),
                  F.col("cls").alias("object")))
    # rdfs9: x rdf:type C, C subClassOf+ D  =>  x rdf:type D
    types_all = (facts.where(F.col("predicate") == "rdf:type")
                 .select("subject", F.col("object").alias("cls"))
                 .unionByName(r2.select("subject",
                                        F.col("object").alias("cls")))
                 .unionByName(r3.select("subject",
                                        F.col("object").alias("cls"))))
    r9 = (types_all.join(F.broadcast(subcls.withColumnRenamed("sub", "cls")),
                         on="cls")
          .select("subject", F.lit("rdf:type").alias("predicate"),
                  F.col("sup").alias("object")))

    inferred = (r7.unionByName(r2).unionByName(r3).unionByName(r9)
                .distinct())
    return inferred.join(facts.select(*spo), on=spo, how="left_anti")


def sameas_smush(triples: DataFrame, sameas_pred: str = "owl:sameAs",
                 **cc_kwargs) -> DataFrame:
    """owl:sameAs smushing: collapse every sameAs equivalence class to
    its canonical member (the lexicographic minimum IRI — the same
    total order connected_components already certifies) and rewrite
    all remaining triples' subjects/objects to the canonical IRI.

    This is the classic triplestore "smush" pass the reference never
    needed (its ids are globally unique by construction, emk.js), but
    which a KG built from linked mentions accrues immediately: the
    materialize stage emits owl:sameAs bridges (module docstring), and
    downstream consumers want ONE node per real-world entity.

    Semantics:
      - the sameAs rows themselves are consumed (dropped from the
        output) — the equivalence is now structural;
      - objects are rewritten only where `object_is_iri` (literals
        can't be entity aliases); subjects always;
      - output is DISTINCT over the input columns (smushing merges
        previously-distinct rows by design).

    Scale shape: the rewrite mapping is bounded by the nodes that
    appear in sameAs edges (entity-table-sized, orders of magnitude
    below the fact count), and identity rows (node == component) are
    dropped before the join, so both rewrite joins BROADCAST against
    the fact stream; the facts are scanned once and the only exchange
    is the final distinct. The CC fixpoint runs over the sameAs edge
    set only, never the facts (operators/cc.py's driver/distributed
    split applies as-is).
    """
    from mms_rdf_spark.operators.cc import connected_components

    sa = triples.where(F.col("predicate") == sameas_pred)
    facts = triples.where(F.col("predicate") != sameas_pred)
    comps = connected_components(
        sa.select(F.col("subject").alias("src"),
                  F.col("object").alias("dst")),
        **cc_kwargs)
    mapping = comps.where(F.col("node") != F.col("component"))

    cols = facts.columns
    has_flag = "object_is_iri" in cols
    out = (facts
           .join(F.broadcast(mapping
                             .withColumnRenamed("node", "subject")
                             .withColumnRenamed("component", "_cs")),
                 on="subject", how="left")
           .join(F.broadcast(mapping
                             .withColumnRenamed("node", "object")
                             .withColumnRenamed("component", "_co")),
                 on="object", how="left")
           .withColumn("subject", F.coalesce("_cs", "subject")))
    obj = (F.when(F.col("object_is_iri"), F.coalesce("_co", "object"))
           .otherwise(F.col("object")) if has_flag
           else F.coalesce("_co", "object"))
    return out.withColumn("object", obj).select(*cols).distinct()


def owl_property_entailment(triples: DataFrame, tbox: DataFrame,
                            max_iterations: int = 20) -> DataFrame:
    """OWL 2 RL property-rule materialization: the inferred-triple
    DELTA for prp-inv (owl:inverseOf), prp-symp (owl:SymmetricProperty)
    and prp-trp (owl:TransitiveProperty) over an instance graph —
    the OWL companion to rdfs_entailment, covering the property axioms
    the reference's vocabulary ontology declares but its notebook
    queries must hand-expand (the same pattern as triplifier.js:453-477
    hand-running subClassOf*).

    TBox rows understood: (p, owl:inverseOf, q), (p, rdf:type,
    owl:SymmetricProperty), (p, rdf:type, owl:TransitiveProperty).
    Rules apply to OBJECT properties only: rows with object_is_iri
    false are excluded when the column exists (a literal can never
    move to the subject position).

    No fact-side fixpoint loop. inverseOf/symmetric act UNIFORMLY per
    predicate, so their joint closure is computed once at the
    PREDICATE level: a reachability closure R over 2·|preds| states
    (pred, orientation) where inverseOf edges switch pred and toggle
    orientation and symmetric edges toggle orientation in place.
    Because every transition is an involution, R is symmetric —
    after one R-expansion of the facts, any two predicates in the
    same class hold exactly equal (or exactly transposed) edge sets.
    Transitive closure per transitive predicate (predicate-tagged
    path doubling, so one closure call covers all of them without
    cross-predicate joins) therefore yields already-R-consistent
    sets up to one final R-expansion of the closure output: that
    three-step chain IS the global fixpoint of all three rules.

    Scale shape: R lives on the schema-sized TBox (broadcast); the
    fact stream is scanned once and only the ACTIVE slice (predicates
    named by any rule) is ever shuffled; the path-doubling closure is
    confined to the transitive predicates' edges. The final distinct +
    anti-join is the only full-width exchange.
    """
    from mms_rdf_spark.plans.closure import transitive_closure

    sep = "\x1f"
    spo = ["subject", "predicate", "object"]
    facts_all = triples.select(*spo)
    facts = triples.select(*spo, *(
        [F.col("object_is_iri")] if "object_is_iri" in triples.columns
        else [F.lit(True).alias("object_is_iri")]))
    facts = facts.where(F.col("object_is_iri")).select(*spo)

    inv = (tbox.where(F.col("predicate") == "owl:inverseOf")
           .select(F.col("subject").alias("p"),
                   F.col("object").alias("q")).distinct())
    inv2 = inv.unionByName(inv.select(F.col("q").alias("p"),
                                      F.col("p").alias("q")))
    sym = (tbox.where((F.col("predicate") == "rdf:type")
                      & (F.col("object") == "owl:SymmetricProperty"))
           .select(F.col("subject").alias("p")).distinct())
    trans_preds = (tbox.where((F.col("predicate") == "rdf:type")
                              & (F.col("object")
                                 == "owl:TransitiveProperty"))
                   .select(F.col("subject").alias("p")).distinct())

    def _st(pcol, flip: str):
        return F.concat(pcol, F.lit(sep), F.lit(flip))

    state_edges = (
        inv2.select(_st(F.col("p"), "0").alias("sub"),
                    _st(F.col("q"), "1").alias("sup"))
        .unionByName(inv2.select(_st(F.col("p"), "1").alias("sub"),
                                 _st(F.col("q"), "0").alias("sup")))
        .unionByName(sym.select(_st(F.col("p"), "0").alias("sub"),
                                _st(F.col("p"), "1").alias("sup")))
        .unionByName(sym.select(_st(F.col("p"), "1").alias("sub"),
                                _st(F.col("p"), "0").alias("sup"))))
    r_states = transitive_closure(state_edges,
                                  max_iterations=max_iterations,
                                  reflexive=False)
    rewrite = (r_states
               .where(F.element_at(F.split("sub", sep), 2) == "0")
               .select(
                   F.element_at(F.split("sub", sep), 1).alias("src_p"),
                   F.element_at(F.split("sup", sep), 1).alias("dst_p"),
                   (F.element_at(F.split("sup", sep), 2) == "1")
                   .alias("flip"))
               .distinct())

    def _expand(df: DataFrame) -> DataFrame:
        joined = df.join(F.broadcast(rewrite),
                         df["predicate"] == rewrite["src_p"])
        return joined.select(
            F.when(F.col("flip"), F.col("object"))
            .otherwise(F.col("subject")).alias("subject"),
            F.col("dst_p").alias("predicate"),
            F.when(F.col("flip"), F.col("subject"))
            .otherwise(F.col("object")).alias("object"))

    expanded = _expand(facts)
    base = facts.unionByName(expanded).distinct()

    tedges = (base.join(F.broadcast(trans_preds),
                        base["predicate"] == trans_preds["p"],
                        "left_semi")
              .select(F.concat("predicate", F.lit(sep), "subject")
                      .alias("sub"),
                      F.concat("predicate", F.lit(sep), "object")
                      .alias("sup")))
    closed = transitive_closure(tedges, max_iterations=max_iterations,
                                reflexive=False)
    closure_out = closed.select(
        F.element_at(F.split("sub", sep), 2).alias("subject"),
        F.element_at(F.split("sub", sep), 1).alias("predicate"),
        F.element_at(F.split("sup", sep), 2).alias("object"))

    inferred = (expanded.unionByName(closure_out)
                .unionByName(_expand(closure_out)).distinct())
    return inferred.join(facts_all, on=spo, how="left_anti")
