"""Composite curation pipeline over `documents` — the end-to-end
training-data pass that the individual operators exist to serve:

    keep a document iff
      - it is not an exact duplicate of an earlier document
        (canonical-survivor policy: min doc_id per content hash wins),
      - its heuristic quality score clears a floor,
      - language-ID says English.

One narrow scan + one dedup groupBy; the quality/langid signals are
pure column math fused into the same stage. This is the shape a 100 TB
curation pass takes: the dedup hash groupBy is the only shuffle, and
its key is a 32-char digest (uniform, unskewable by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mms_rdf_spark.operators.dedup import decontaminate, exact_duplicates
from mms_rdf_spark.operators.packing import split_expr
from mms_rdf_spark.operators.textstats import (
    detect_language,
    quality_score,
    repetition_stats,
)


def curate(docs: DataFrame, min_score: float = 0.0,
           lang: str = "en") -> DataFrame:
    """(doc_id, score, stop_ratio) for documents surviving curation,
    deterministic under any partitioning."""
    dupes = exact_duplicates(docs).select("doc_id")
    q = quality_score(docs).select("doc_id", "score")
    lid = detect_language(docs).select("doc_id", "stop_ratio", "lang_pred")
    return (
        docs.select("doc_id")
        .join(dupes, on="doc_id", how="left_anti")
        .join(q, on="doc_id")
        .join(lid, on="doc_id")
        .where((F.col("score") > min_score) & (F.col("lang_pred") == lang))
        .select("doc_id", "score", "stop_ratio")
    )


def curate_full(docs: DataFrame, benchmark: DataFrame | None = None,
                min_score: float = 0.0, lang: str = "en",
                dup_threshold: float = 0.3) -> DataFrame:
    """The complete corpus-curation recipe, composed from the suite:

        keep a document iff
          - not an exact duplicate (canonical survivor wins),
          - quality score clears the floor and language-ID matches,
          - its duplicate-n-gram ratio is under the boilerplate bar,
          - it shares no 5-gram with the benchmark corpus
            (decontamination; skipped when `benchmark` is None),
        then stamp its deterministic train/valid/test split.

    Returns (doc_id, score, stop_ratio, dup_ratio, split). Shuffle
    inventory at 100 TB: the dedup digest groupBy, the decontamination
    gram groupBy (+ broadcast of benchmark grams), and the final
    doc_id joins — every filter signal itself is single-scan column
    math. This is the one-call entry a user points at a raw crawl."""
    base = curate(docs, min_score=min_score, lang=lang)
    rep = repetition_stats(docs, dup_threshold=dup_threshold) \
        .select("doc_id", "dup_ratio", "repetitive")
    out = (base.join(rep, on="doc_id")
           .where(~F.col("repetitive")))
    if benchmark is not None:
        contaminated = decontaminate(docs, benchmark).select("doc_id")
        out = out.join(contaminated, on="doc_id", how="left_anti")
    # split is a pure function of doc_id — stamped as a projection,
    # never a join (it would be one more whole-corpus shuffle)
    return out.select("doc_id", "score", "stop_ratio", "dup_ratio",
                      split_expr().alias("split"))
