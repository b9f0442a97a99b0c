"""Composite curation pipeline over `documents` — the end-to-end
training-data pass that the individual operators exist to serve:

    keep a document iff
      - it is not an exact duplicate of an earlier document
        (canonical-survivor policy: min doc_id per content hash wins),
      - its heuristic quality score clears a floor,
      - language-ID says English.

Plan shape (the 100 TB contract, pinned in tests/test_plans.py):
every signal — quality score, language-ID, repetition, split — is a
pure column expression stamped in ONE projection of one scan
(textstats *_expr builders), and exact dedup is a row_number window
over md5(text), so `curate` runs with exactly ONE exchange (the
window's hash partitioning on a uniform 32-char digest — unskewable by
construction). `curate_full` adds only the decontamination branch:
gram-digest broadcast join + per-doc groupBy, then one anti-join of
the (small) contaminated id set. No per-signal doc_id re-joins
anywhere — the round-2 formulation computed each signal as a separate
projection and joined them back, 3-4 whole-corpus shuffles this
version deletes.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mms_rdf_spark.operators.dedup import decontaminate
from mms_rdf_spark.operators.packing import split_expr
from mms_rdf_spark.operators.textstats import (
    dup_ratio_expr,
    lang_pred_expr,
    quality_score_expr,
    stop_ratio_expr,
)


def _dedup_window():
    """Exact-dedup survivor rule shared by curate / curate_full: first
    doc_id per content digest wins — identical semantics to
    dedup.exact_duplicates (min doc_id canonical) but expressed as ONE
    window over the digest instead of groupBy + join-back (one
    exchange, not two, and no join of the whole id space)."""
    return Window.partitionBy("_ch").orderBy("doc_id")


def curate(docs: DataFrame, min_score: float = 0.0,
           lang: str = "en") -> DataFrame:
    """(doc_id, score, stop_ratio) for documents surviving curation,
    deterministic under any partitioning. One scan, one exchange."""
    from mms_rdf_spark.operators.skew import spread_input

    docs = spread_input(docs)
    sig = docs.select(
        "doc_id",
        F.md5("text").alias("_ch"),
        quality_score_expr().alias("score"),
        stop_ratio_expr().alias("stop_ratio"),
        lang_pred_expr().alias("lang_pred"),
    )
    return (
        sig.withColumn("_rn", F.row_number().over(_dedup_window()))
        .where((F.col("_rn") == 1) & (F.col("score") > min_score)
               & (F.col("lang_pred") == lang))
        .select("doc_id", "score", "stop_ratio")
    )


def curate_full(docs: DataFrame, benchmark: DataFrame | None = None,
                min_score: float = 0.0, lang: str = "en",
                dup_threshold: float = 0.3,
                include_tokens: bool = False) -> DataFrame:
    """The complete corpus-curation recipe, composed from the suite:

        keep a document iff
          - not an exact duplicate (canonical survivor wins),
          - quality score clears the floor and language-ID matches,
          - its duplicate-n-gram ratio is under the boilerplate bar,
          - it shares no 5-gram with the benchmark corpus
            (decontamination; skipped when `benchmark` is None),
        then stamp its deterministic train/valid/test split.

    Returns (doc_id, score, stop_ratio, dup_ratio, split). Shuffle
    inventory at 100 TB: ONE dedup-window exchange on the content
    digest, plus — only when a benchmark is given — the decontamination
    gram groupBy (+ broadcast of benchmark grams) and one anti-join of
    the contaminated id set. Every filter signal and the split stamp
    are column math fused into the scan projection. This is the
    one-call entry a user points at a raw crawl.

    The fused projection is the heaviest per-row stage in the suite
    (quality + dup-ratio grams + split hash per doc), so a
    narrow-partitioned input scan is spread across cores first
    (skew.spread_input; measured 2.9 s -> 1.7 s at sf0.1; no-op when
    the source already scans wide)."""
    from mms_rdf_spark.operators.skew import spread_input

    docs = spread_input(docs)
    sig = docs.select(
        "doc_id",
        F.md5("text").alias("_ch"),
        quality_score_expr().alias("score"),
        stop_ratio_expr().alias("stop_ratio"),
        lang_pred_expr().alias("lang_pred"),
        dup_ratio_expr().alias("dup_ratio"),
        # split is a pure function of doc_id — stamped in the same
        # projection, never a join
        split_expr().alias("split"),
        # token count rides the same projection when a downstream
        # packer needs it (prepare_pretraining_corpus) — never a
        # join-back of the id space
        F.size(F.filter(F.split("text", " "), lambda t: t != ""))
        .alias("n_tokens"),
    )
    out = (
        sig.withColumn("_rn", F.row_number().over(_dedup_window()))
        .where((F.col("_rn") == 1) & (F.col("score") > min_score)
               & (F.col("lang_pred") == lang)
               & (F.col("dup_ratio") <= dup_threshold))
    )
    if benchmark is not None:
        contaminated = decontaminate(docs, benchmark).select("doc_id")
        out = out.join(contaminated, on="doc_id", how="left_anti")
    cols = ["doc_id", "score", "stop_ratio", "dup_ratio", "split"]
    if include_tokens:
        cols.append("n_tokens")
    return out.select(*cols)


def curate_semantic(docs: DataFrame, embeddings: DataFrame,
                    benchmark: DataFrame | None = None,
                    min_score: float = 0.0, lang: str = "en",
                    dup_threshold: float = 0.3,
                    sim_threshold: float = 0.95,
                    planes: int = 8, bands: int = 2,
                    policy: str = "greedy") -> DataFrame:
    """curate_full + SEMANTIC dedup — the last stage of the standard
    pretraining recipe (SemDeDup-style): after the textual filters, a
    document is also dropped if its embedding is a near-duplicate
    (cosine >= sim_threshold within a multi-band LSH bucket) of a
    canonical document. `embeddings.vec_id` keys `docs.doc_id`.

    Survivor policies (both deterministic under any partitioning):
      - "greedy" (default): the smaller-id member of every near-dup
        PAIR wins — consistent with exact dedup's canonical rule. A
        doc whose only near-dup was itself dropped still loses (pairs
        (1,2) + (2,3) keep only 1).
      - "cluster": transitive — connected components over the pair
        edges (similarity.neardup_clusters); exactly ONE survivor
        (the min id) per semantic cluster (pairs (1,2) + (2,3) keep 1,
        and 3 is dropped as part of cluster 1). Costs one CC pass over
        the PAIR set, not the corpus.

    Shuffle inventory on top of curate_full: the (capped, multi-band)
    near-dup bucket joins over SIGNATURES and one anti-join of the
    loser id set — the embedding matrix itself never joins the text
    corpus."""
    from mms_rdf_spark.operators.similarity import (
        embedding_near_duplicates_mb,
        neardup_clusters,
    )

    base = curate_full(docs, benchmark=benchmark, min_score=min_score,
                       lang=lang, dup_threshold=dup_threshold)
    if policy == "greedy":
        losers = (
            embedding_near_duplicates_mb(embeddings,
                                         threshold=sim_threshold,
                                         planes=planes, bands=bands)
            .select(F.col("b_id").alias("doc_id")).distinct()
        )
    elif policy == "cluster":
        losers = (
            neardup_clusters(embeddings, threshold=sim_threshold,
                             planes=planes, bands=bands)
            .where(F.col("vec_id") != F.col("cluster_id"))
            .select(F.col("vec_id").alias("doc_id"))
        )
    else:
        raise ValueError(f"unknown survivor policy: {policy!r}")
    return base.join(losers, on="doc_id", how="left_anti")


def relative_quality_filter(docs: DataFrame,
                            pctl: float = 0.1) -> DataFrame:
    """Percentile-based quality cut (the Gopher-style RELATIVE rule):
    keep documents whose quality score clears the corpus `pctl`
    quantile, instead of an absolute floor — robust to corpus-wide
    score drift between crawls, which is why production curation uses
    distribution cuts. Returns (doc_id, score, cutoff).

    Composition of the existing pieces: the score is the SAME fused
    quality_score_expr every other recipe stamps (one scan), the
    cutoff is one single-row exact-percentile aggregate (linear
    interpolation — the grouped_quantiles definition) broadcast back,
    and the filter compares round-6 values so the SQL oracle's
    quantile_cont agrees exactly. Two passes over the corpus, zero
    joins of the id space."""
    scored = docs.select("doc_id",
                         quality_score_expr().alias("score"))
    cut = scored.agg(
        F.round(F.percentile(F.col("score"), F.lit(pctl)), 6)
        .alias("cutoff"))
    return (scored.crossJoin(F.broadcast(cut))
            .where(F.col("score") >= F.col("cutoff"))
            .select("doc_id", "score", "cutoff"))


def prepare_pretraining_corpus(
    docs: DataFrame, benchmark: DataFrame | None = None,
    budget: int = 256, groups: int = 8,
) -> DataFrame:
    """The capstone one-call pipeline: raw documents in, packed
    training shards out.

        curate_full (dedup + quality + lang + repetition
                     [+ decontamination]) with n_tokens riding the
                     fused projection,
        then hash-lane offset packing of the SURVIVORS into
        token-budget shards (lane = doc_id % groups; shard = cumulative
        token offset / budget within the lane).

    Returns (doc_id, split, score, n_tokens, lane, shard_id,
    pos_in_shard). Shuffle inventory = curate_full's (one dedup window
    [+ decontamination branch]) plus the per-lane packing window —
    `groups` should be sized ~4x executors at scale (packing.py's
    documented knob). No join of the corpus id space anywhere: tokens
    are computed inside curation's scan, packing windows run over the
    (small) survivor set."""
    kept = curate_full(docs, benchmark, include_tokens=True)
    lane = F.pmod(F.col("doc_id"), F.lit(groups)).cast("int")
    w = Window.partitionBy("lane").orderBy("doc_id")
    packed = (kept.withColumn("lane", lane)
              .withColumn(
                  "_off",
                  F.sum("n_tokens").over(
                      w.rowsBetween(Window.unboundedPreceding, 0))
                  - F.col("n_tokens"))
              .withColumn("shard",
                          F.floor(F.col("_off") / budget).cast("int")))
    return packed.select(
        "doc_id", "split", "score", "n_tokens", "lane",
        F.concat_ws("#", "lane", "shard").alias("shard_id"),
        F.row_number().over(
            Window.partitionBy("lane", "shard").orderBy("doc_id"))
        .cast("int").alias("pos_in_shard"))


def normalize_text(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Curation-standard text normalization — the fix-the-bytes stage
    every pretraining pipeline runs before dedup/quality so that
    byte-different-but-canonically-equal texts hash together:

      1. Unicode NFC (composed form: 'e' + U+0301 -> 'é'),
      2. C0/DEL control chars -> space,
      3. whitespace runs collapsed to one space, ends trimmed.

    Returns (id_col, text_norm, changed); `changed` is null-safe so
    NULL inputs read as unchanged (text_norm NULL). Scale shape: steps
    2-3 are JVM regexp codegen in the one scan projection; NFC is the
    single Python lane — Spark has no NFC builtin, so it runs as ONE
    Arrow-vectorized pandas UDF (batch transfer, never per-row
    Python), the same UDF surface contract as the multimodal decoders.
    Cross-engine: DuckDB's nfc_normalize implements the same Unicode
    canonical composition, so outputs hash-match (kg contract row
    text_normalize).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata
        return s.map(lambda v: None if v is None
                     else unicodedata.normalize("NFC", v))

    cleaned = F.trim(F.regexp_replace(
        F.regexp_replace(_nfc(F.col(text_col)),
                         "[\\x00-\\x1F\\x7F]", " "),
        "\\s+", " "))
    return docs.select(
        F.col(id_col),
        cleaned.alias("text_norm"),
        (~F.col(text_col).eqNullSafe(cleaned)).alias("changed"))
