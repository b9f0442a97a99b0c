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

from mms_rdf_spark.operators.dedup import exact_duplicates
from mms_rdf_spark.operators.textstats import detect_language, quality_score


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
