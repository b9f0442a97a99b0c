"""Triple extraction: transcripts DataFrame -> triples DataFrame.

The Spark restatement of the reference's conversion pipeline
(src/class/triplifier.js convert_object/process_property, see
SURVEY.md §3.1): one input row (a turn) fans out to N triple rows,
driven by the broadcast vocabulary.

Three equivalent formulations, all oracle-tested (P/R = 1.0):
  - `extract_triples` (primary): FUSED single-scan plan — the static
    vocabulary folds into one projection emitting array<triple struct>
    per turn, exploded in place. One scan, zero joins, zero shuffles
    for turn-level triples (asserted in tests/test_plans.py); the only
    exchange in the full plan is the per-conversation ordered-turns
    window (W1), keyed by conv_id and ordered by turn_idx — order from
    data, never partition iteration, so repartition-stable.
  - `extract_triples_joined`: the literal J1 restatement — unpivot ->
    broadcast vocabulary join -> column dispatch. The broadcast join
    replaces the reference's per-element SPARQL round-trips + memo
    cache (triplifier.js:433-436) with zero per-row lookups.
  - `extract_turn_triples_arrow`: Arrow-batched mapInPandas — the UDF
    surface the north star names; vectorized pandas per batch, the
    template for extraction logic that outgrows column expressions
    (real NER models etc.).

Output schema (triples):
  subject, predicate, object: string
  object_is_iri: boolean
  datatype, lang: string (nullable)
  idx: int (nullable; ordered-list position, R9)
  conv_id: string, turn_idx: int (provenance, the analog of the
  reference's per-element provenance comment, triplifier.js:578)
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from mms_rdf_spark.functions import MENTION_KINDS
from mms_rdf_spark.functions.iri import (
    artifact_iri_col,
    element_iri_col,
    sanitize_suffix_col,
)
from mms_rdf_spark.vocab import (
    ENUM_CLASSES,
    RDF_NIL,
    ROLE_TO_TYPE,
    enum_lookup,
    enums_pdf,
    resolve_vocabulary,
    resolved_vocab_pdf,
)

TRIPLE_SCHEMA = StructType([
    StructField("subject", StringType()),
    StructField("predicate", StringType()),
    StructField("object", StringType()),
    StructField("object_is_iri", BooleanType()),
    StructField("datatype", StringType()),
    StructField("lang", StringType()),
    StructField("idx", IntegerType()),
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
])

TRIPLE_COLS = [f.name for f in TRIPLE_SCHEMA.fields]

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def _with_element_cols(turns: DataFrame) -> DataFrame:
    """Add element type (role dispatch), raw element id, subject IRI."""
    # normalize input types (guards against VOID-typed all-null columns
    # from schema inference; a real Iceberg scan always has these types)
    # ts normalizes to TIMESTAMP_NTZ: formatting/arithmetic on NTZ is
    # session-timezone-INDEPENDENT (a TZ-typed cast would shift wall
    # times around DST gaps when the consuming session isn't UTC).
    turns = turns.select(
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("int"),
        F.col("role").cast("string"),
        F.col("text").cast("string"),
        F.col("tool").cast("string"),
        F.col("ts").cast("timestamp_ntz").alias("ts"),
    )
    type_expr = F.lit(ROLE_TO_TYPE[None])
    for role, t in ROLE_TO_TYPE.items():
        if role is not None:
            type_expr = F.when(F.col("role") == role, F.lit(t)).otherwise(type_expr)
    raw_id = F.concat_ws(".", F.col("conv_id"), F.lit("Turn"),
                         F.col("turn_idx").cast("string"))
    return (
        turns
        .withColumn("el_type", type_expr)
        .withColumn("raw_id", raw_id)
        .withColumn("subject", element_iri_col(F.col("raw_id")))
    )


def _finish(df: DataFrame, *, idx=None) -> DataFrame:
    """Normalize a partial triple frame to TRIPLE_SCHEMA column set."""
    for name in TRIPLE_COLS:
        if name not in df.columns:
            df = df.withColumn(name, F.lit(None))
    if idx is not None:
        df = df.withColumn("idx", idx)
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


def extract_triples(spark: SparkSession, turns: DataFrame,
                    include_conversations: bool = True) -> DataFrame:
    """Primary extractor: single-scan fused plan.

    include_conversations=False restricts to the stateless turn-level
    subset (required for streaming input, where the per-conversation
    window cannot run — see streaming/incremental.py).

    The resolved vocabulary is STATIC at plan time, so the entire
    turn-level emission folds into one projection: each turn row
    computes an array<triple struct> (type + elementId + one entry per
    vocabulary key + mention entries with their positional idx via the
    2-arg transform lambda), which is exploded. One scan of the input,
    zero joins, everything inside whole-stage codegen. Two additional
    column-pruned passes (conv_id/turn_idx only) produce the
    per-conversation triples; the turns-list window is the plan's only
    shuffle.

    `extract_triples_joined` keeps the generic broadcast-join
    formulation (the literal J1 restatement) — equivalent results,
    tested against each other; the fused form is what you want in
    front of 100 TB because it reads the wide `text` column exactly
    once.
    """
    t = _with_element_cols(turns).withColumn(
        "ts_str", F.date_format("ts", _TS_FMT))

    vocab = resolve_vocabulary()
    enums = enum_lookup()
    el_types = sorted({et for (et, _k) in vocab if et in ROLE_TO_TYPE.values()})

    def _triple(predicate, obj, is_iri, datatype=None, lang=None, idx=None):
        return F.struct(
            predicate.alias("predicate") if isinstance(predicate, Column)
            else F.lit(predicate).alias("predicate"),
            obj.alias("object"),
            F.lit(is_iri).alias("object_is_iri"),
            (F.lit(datatype) if not isinstance(datatype, Column) else datatype)
            .cast("string").alias("datatype"),
            F.lit(lang).cast("string").alias("lang"),
            (F.lit(idx) if idx is None else idx).cast("int").alias("idx"),
        )

    def _key_triple(p, key):
        """One optional triple struct for (PropertyDef, input key)."""
        val = F.col("ts_str") if key == "ts" else F.col(key)
        if p.property_type in ("DatatypeProperty", "DerivedDatatypeProperty"):
            dt, lang = (None, p.lang) if p.lang else (p.range, None)
            return F.when(val.isNotNull(),
                          _triple(p.predicate, val, False, dt, lang))
        if p.range in ENUM_CLASSES:
            # NULL -> the enum's nil row; unknown literal -> no triple
            # (unmapped-value warn semantics, R11)
            expr = F.when(val.isNull(), F.lit(enums.get((p.range, None))))
            for (cls, v), iri in enums.items():
                if cls == p.range and v is not None:
                    expr = expr.when(val == v, F.lit(iri))
            return F.when(expr.isNotNull(), _triple(p.predicate, expr, True))
        art = p.range.split(":", 1)[1]
        obj = F.when(val == "", F.lit(RDF_NIL)).otherwise(
            F.concat(F.lit(f"mms-artifact:{art}.ID:"), sanitize_suffix_col(val)))
        return F.when(val.isNotNull(), _triple(p.predicate, obj, True))

    # per-el_type static triple array, dispatched by one CASE
    per_type_arrays = {}
    for et in el_types:
        entries = [
            _triple("rdf:type", F.lit(et), True),
            _triple("mms-ontology:elementId", F.col("raw_id"), False,
                    "xsd:string"),
        ]
        for key in ("role", "text", "tool", "ts"):
            p = vocab.get((et, key))
            if p is not None:
                entries.append(_key_triple(p, key))
        per_type_arrays[et] = F.filter(F.array(*entries),
                                       lambda x: x.isNotNull())
    base_arr = per_type_arrays[el_types[0]]
    for et in el_types[1:]:
        base_arr = F.when(F.col("el_type") == et,
                          per_type_arrays[et]).otherwise(base_arr)

    # mention triples with positional idx, same scan (2-arg transform);
    # one ordered list per mention kind (entity / url / email)
    for key, pattern, _art, guard_lit in MENTION_KINDS:
        defs = {et: vocab[(et, key)] for et in el_types
                if (et, key) in vocab}
        if not defs:
            continue
        some = next(iter(defs.values()))
        art = some.list_item_range.split(":", 1)[1]
        # sound contains() pre-guard: the regex cannot match without its
        # literal marker, and contains() is ~10x cheaper than the regex,
        # so rows without the marker skip the scan entirely
        text_nn = F.coalesce(F.col("text"), F.lit(""))
        surfaces = F.when(
            text_nn.contains(guard_lit),
            F.regexp_extract_all(text_nn, F.lit(pattern), F.lit(1)),
        ).otherwise(F.expr("CAST(array() AS array<string>)"))

        def _mk(pred: str, art_name: str):
            def build(m, i):
                return _triple(
                    pred,
                    F.concat(F.lit(f"mms-artifact:{art_name}.ID:"),
                             sanitize_suffix_col(m)),
                    True, idx=i)
            return build

        base_arr = F.concat(base_arr,
                            F.transform(surfaces, _mk(some.predicate, art)))

    turn_triples = (
        t.select("conv_id", "turn_idx", "subject",
                 F.explode(base_arr).alias("tr"))
        .select("conv_id", "turn_idx", "subject",
                "tr.predicate", "tr.object", "tr.object_is_iri",
                "tr.datatype", "tr.lang", "tr.idx")
    )
    turn_triples = _finish(turn_triples, idx=F.col("idx"))

    if not include_conversations:
        return turn_triples
    return turn_triples.unionByName(_conversation_triples(turns))


def _conversation_triples(turns: DataFrame) -> DataFrame:
    """Per-conversation element + ordered _turns list (W1): the one
    shuffle, keyed by conv_id, ordered by turn_idx (data-derived).

    Kept as THREE union branches with LITERAL predicate columns on
    purpose (round-6 lesson): a fused explode emitting all three kinds
    from one windowed pass was measurably equivalent but made the
    branch non-statically-prunable — every `predicate == ...` consumer
    then ran the window at runtime instead of pruning the branch at
    plan time, and under ANSI mode a downstream expression that is
    only valid on turn subjects (kg_sparql_graph's conv-number cast)
    became reachable on conversation rows and crashed. Literal
    predicates let Catalyst fold the filter per branch and delete dead
    subtrees; the two extra scans here are narrow (conv_id only)."""
    t = _with_element_cols(turns)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    conv_turns = (
        t.select("conv_id", "turn_idx", F.col("subject").alias("turn_subject"))
        .withColumn("idx", (F.row_number().over(w) - F.lit(1)).cast("int"))
        .withColumn("subject", element_iri_col(F.col("conv_id")))
    )
    turns_list_triples = _finish(
        conv_turns.select(
            "conv_id", "turn_idx", "subject",
            F.lit("mms-property:turns").alias("predicate"),
            F.col("turn_subject").alias("object"),
            F.lit(True).alias("object_is_iri"), "idx"),
        idx=F.col("idx"),
    )
    convs = turns.select("conv_id").distinct() \
        .withColumn("subject", element_iri_col(F.col("conv_id")))
    conv_type_triples = _finish(
        convs.select("conv_id", "subject",
                     F.lit("rdf:type").alias("predicate"),
                     F.lit("mms-class:Conversation").alias("object"),
                     F.lit(True).alias("object_is_iri"))
    )
    conv_id_triples = _finish(
        convs.select("conv_id", "subject",
                     F.lit("mms-ontology:elementId").alias("predicate"),
                     F.col("conv_id").alias("object"),
                     F.lit(False).alias("object_is_iri"),
                     F.lit("xsd:string").alias("datatype"))
    )
    return turns_list_triples.unionByName(conv_type_triples) \
        .unionByName(conv_id_triples)


def unmapped_keys(spark: SparkSession, turns: DataFrame) -> DataFrame:
    """Warn-once side output (A6, reference triplifier.js:10-16,
    540-545): distinct (el_type, key) pairs present in the input that
    the vocabulary does not map. O(distinct) like the reference's
    Set-guarded warnings — a distinct over two tiny columns, not a log
    stream. Unknown keys degrade to this side table, never to errors."""
    t = _with_element_cols(turns)
    present = t.select("el_type").distinct().crossJoin(
        spark.createDataFrame([(k,) for k in ("role", "text", "tool", "ts")],
                              ["key"]))
    vocab = spark.createDataFrame(resolved_vocab_pdf()).select(
        F.col("type").alias("el_type"), "key")
    return present.join(vocab, on=["el_type", "key"], how="left_anti")


def extract_triples_joined(spark: SparkSession, turns: DataFrame) -> DataFrame:
    """Generic broadcast-join extractor (the literal J1 restatement)."""
    vocab = F.broadcast(spark.createDataFrame(resolved_vocab_pdf()))
    enums = F.broadcast(
        spark.createDataFrame(enums_pdf()).withColumnsRenamed(
            {"value": "enum_value", "iri": "enum_iri"})
    )
    t = _with_element_cols(turns)

    # ---- R2/R3: type + elementId triples (no shuffle)
    type_triples = _finish(
        t.select("conv_id", "turn_idx", "subject",
                 F.lit("rdf:type").alias("predicate"),
                 F.col("el_type").alias("object"),
                 F.lit(True).alias("object_is_iri"))
    )
    id_triples = _finish(
        t.select("conv_id", "turn_idx", "subject",
                 F.lit("mms-ontology:elementId").alias("predicate"),
                 F.col("raw_id").alias("object"),
                 F.lit(False).alias("object_is_iri"),
                 F.lit("xsd:string").alias("datatype"))
    )

    # ---- generic vocabulary-driven key processing (J1 as broadcast join)
    # Unpivot the fixed input keys to (key, value) rows; NULLs survive
    # the unpivot so the enum branch can map NULL -> rdf:nil (R4 exc).
    kv = t.withColumn("ts_str", F.date_format("ts", _TS_FMT)).select(
        "conv_id", "turn_idx", "subject", "el_type",
        F.expr(
            "stack(4, 'role', role, 'text', text, 'tool', tool, 'ts', ts_str) "
            "as (key, value)"
        ),
    )
    kv = kv.join(vocab, (kv.el_type == vocab.type) & (kv.key == vocab.key), "inner")

    is_dt = F.col("property_type").isin("DatatypeProperty", "DerivedDatatypeProperty")
    is_enum = F.col("range").isin(*sorted(ENUM_CLASSES))

    dt_triples = _finish(
        kv.where(is_dt & F.col("value").isNotNull())
        .select(
            "conv_id", "turn_idx", "subject", "predicate",
            F.col("value").alias("object"),
            F.lit(False).alias("object_is_iri"),
            F.when(F.col("lang").isNull(), F.col("range")).alias("datatype"),
            F.col("lang"),
        )
    )

    enum_triples = _finish(
        kv.where(~is_dt & is_enum)
        .join(enums, (F.col("range") == F.col("enum_class"))
              & F.col("value").eqNullSafe(F.col("enum_value")), "inner")
        .select("conv_id", "turn_idx", "subject", "predicate",
                F.col("enum_iri").alias("object"),
                F.lit(True).alias("object_is_iri"))
    )

    artifact_type = F.regexp_extract(F.col("range"), r"^mms-class:(.*)$", 1)
    obj_triples = _finish(
        kv.where(~is_dt & ~is_enum & F.col("value").isNotNull())
        .select(
            "conv_id", "turn_idx", "subject", "predicate",
            F.when(F.col("value") == "", F.lit(RDF_NIL))  # R5
            .otherwise(F.concat(F.lit("mms-artifact:"), artifact_type,
                                F.lit(".ID:"), sanitize_suffix_col(F.col("value"))))
            .alias("object"),
            F.lit(True).alias("object_is_iri"),
        )
    )

    # ---- R9: derived ordered mentions, one branch per kind
    # (posexplode keeps match order)
    mention_parts = []
    for key, pattern, _art, guard_lit in MENTION_KINDS:
        mention_vocab = vocab.where(F.col("key") == key).select(
            "type", "predicate",
            F.regexp_extract("list_item_range",
                             r"^mms-class:(.*)$", 1).alias("m_type"))
        hits = (
            t.where(F.col("text").contains(guard_lit))  # sound pre-guard
            .select("conv_id", "turn_idx", "subject", "el_type",
                    F.posexplode(
                        F.regexp_extract_all("text", F.lit(pattern),
                                             F.lit(1))).alias("pos", "surface"))
            .join(F.broadcast(mention_vocab),
                  F.col("el_type") == F.col("type"), "inner")
        )
        mention_parts.append(_finish(
            hits.select(
                "conv_id", "turn_idx", "subject", "predicate",
                F.concat(F.lit("mms-artifact:"), F.col("m_type"), F.lit(".ID:"),
                         sanitize_suffix_col(F.col("surface"))).alias("object"),
                F.lit(True).alias("object_is_iri"),
                F.col("pos").cast("int").alias("idx"),
            ),
            idx=F.col("idx"),
        ))
    mention_triples = mention_parts[0]
    for mp in mention_parts[1:]:
        mention_triples = mention_triples.unionByName(mp)

    # ---- per-conversation element + ordered _turns list (the one
    # shuffle: window keyed by conv_id, ordered by turn_idx — W1)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    conv_turns = (
        t.select("conv_id", "turn_idx", F.col("subject").alias("turn_subject"))
        .withColumn("idx", (F.row_number().over(w) - F.lit(1)).cast("int"))
        .withColumn("subject", element_iri_col(F.col("conv_id")))
    )
    turns_list_triples = _finish(
        conv_turns.select(
            "conv_id", "turn_idx", "subject",
            F.lit("mms-property:turns").alias("predicate"),
            F.col("turn_subject").alias("object"),
            F.lit(True).alias("object_is_iri"), "idx"),
        idx=F.col("idx"),
    )
    convs = turns.select("conv_id").distinct() \
        .withColumn("subject", element_iri_col(F.col("conv_id")))
    conv_type_triples = _finish(
        convs.select("conv_id", "subject",
                     F.lit("rdf:type").alias("predicate"),
                     F.lit("mms-class:Conversation").alias("object"),
                     F.lit(True).alias("object_is_iri"))
    )
    conv_id_triples = _finish(
        convs.select("conv_id", "subject",
                     F.lit("mms-ontology:elementId").alias("predicate"),
                     F.col("conv_id").alias("object"),
                     F.lit(False).alias("object_is_iri"),
                     F.lit("xsd:string").alias("datatype"))
    )

    parts = [type_triples, id_triples, dt_triples, enum_triples, obj_triples,
             mention_triples, turns_list_triples, conv_type_triples,
             conv_id_triples]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# Arrow-batched variant: the mapInPandas UDTF surface (SURVEY.md §2.9) —
# one Arrow batch of turns -> many triple rows. All pandas ops are
# column-vectorized (str.replace / extractall / masked assignment);
# the resolved vocabulary is captured in the closure and serialized once
# per task (the broadcast-equivalent), never consulted per row.
# --------------------------------------------------------------------------
def _sanitize_series(s: pd.Series) -> pd.Series:
    return (s.str.replace(r"\s+", "_", regex=True)
             .str.replace("<", "-").str.replace(">", "-"))


def _convert_turn_batch(pdf: pd.DataFrame, vocab, enums) -> pd.DataFrame:
    cols = ["subject", "predicate", "object", "object_is_iri",
            "datatype", "lang", "idx", "conv_id", "turn_idx"]
    base = pd.DataFrame({
        "conv_id": pdf["conv_id"],
        "turn_idx": pdf["turn_idx"].astype("int32"),
    })
    role = pdf["role"]
    base["el_type"] = role.map(
        {k: v for k, v in ROLE_TO_TYPE.items() if k is not None}
    ).where(role.notna(), ROLE_TO_TYPE[None]).fillna(ROLE_TO_TYPE[None])
    base["raw_id"] = pdf["conv_id"] + ".Turn." + base["turn_idx"].astype(str)
    base["subject"] = "mms-element:" + _sanitize_series(base["raw_id"])

    frames: list[pd.DataFrame] = []

    def emit(mask, predicate, obj, is_iri, datatype=None, lang=None):
        ix = base.index if mask is None else base.index[mask]
        if len(ix) == 0:
            return
        f = pd.DataFrame(index=ix)
        f["subject"] = base.loc[ix, "subject"]
        f["predicate"] = predicate
        f["object"] = obj.loc[ix] if isinstance(obj, pd.Series) else obj
        f["object_is_iri"] = is_iri
        f["datatype"] = datatype
        f["lang"] = lang
        f["idx"] = None
        f["conv_id"] = base.loc[ix, "conv_id"]
        f["turn_idx"] = base.loc[ix, "turn_idx"]
        frames.append(f)

    emit(None, "rdf:type", base["el_type"], True)
    emit(None, "mms-ontology:elementId", base["raw_id"], False, "xsd:string")

    values = {
        "role": role,
        "text": pdf["text"],
        "tool": pdf["tool"],
        "ts": pd.to_datetime(pdf["ts"]).dt.strftime("%Y-%m-%dT%H:%M:%SZ"),
    }
    for (el_type, key), p in vocab.items():
        if key.startswith("_"):
            continue
        tmask = base["el_type"] == el_type
        if not tmask.any():
            continue
        val = values[key]
        if p.property_type in ("DatatypeProperty", "DerivedDatatypeProperty"):
            m = tmask & val.notna()
            if p.lang:
                emit(m, p.predicate, val, False, None, p.lang)
            else:
                emit(m, p.predicate, val, False, p.range)
        elif p.range in ENUM_CLASSES:
            mapped = val.map({v: i for (c, v), i in enums.items()
                              if c == p.range and v is not None})
            mapped = mapped.where(val.notna(), enums.get((p.range, None)))
            emit(tmask & mapped.notna(), p.predicate, mapped, True)
        else:
            art = p.range.split(":", 1)[1]
            m = tmask & val.notna()
            obj = ("mms-artifact:" + art + ".ID:" + _sanitize_series(val.fillna(""))
                   ).where(val != "", RDF_NIL)
            emit(m, p.predicate, obj, True)

    # mentions: vectorized extractall -> (row, match#) multi-index (R9),
    # one pass per mention kind
    text = pdf["text"].fillna("")
    for key, pattern, _art, guard_lit in MENTION_KINDS:
        # sound contains() pre-guard (see MENTION_KINDS)
        candidates = text[text.str.contains(guard_lit, regex=False)]
        hits = candidates.str.extractall(pattern) if len(candidates) \
            else pd.DataFrame()
        if len(hits) == 0:
            continue
        hits = hits.reset_index()
        hits.columns = ["row", "match", "surface"]
        for el_type in hits["row"].map(base["el_type"]).unique():
            p = vocab.get((el_type, key))
            if p is None:
                continue
            hm = hits[hits["row"].map(base["el_type"]) == el_type]
            art = p.list_item_range.split(":", 1)[1]
            frames.append(pd.DataFrame({
                "subject": hm["row"].map(base["subject"]).values,
                "predicate": p.predicate,
                "object": ("mms-artifact:" + art + ".ID:"
                           + _sanitize_series(hm["surface"])).values,
                "object_is_iri": True,
                "datatype": None, "lang": None,
                "idx": hm["match"].astype("int32").values,
                "conv_id": hm["row"].map(base["conv_id"]).values,
                "turn_idx": hm["row"].map(base["turn_idx"]).values,
            }))

    out = pd.concat(frames, ignore_index=True)[cols]
    out["object_is_iri"] = out["object_is_iri"].astype(bool)
    return out


def extract_turn_triples_arrow(spark: SparkSession, turns: DataFrame) -> DataFrame:
    """Turn-level triples via mapInPandas (conversation-level list
    triples need the global (conv_id, turn_idx) window and stay in the
    relational plan — compose with `conversation_triples`)."""
    from mms_rdf_spark.vocab import enum_lookup, resolve_vocabulary

    vocab = resolve_vocabulary()
    enums = enum_lookup()

    def convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _convert_turn_batch(pdf, vocab, enums)

    return turns.mapInPandas(convert, schema=TRIPLE_SCHEMA)
