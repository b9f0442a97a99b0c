"""Reference-based text eval metrics over candidate/reference pairs.

ROUGE-N for generation eval at corpus scale: given a pairs table
(pair_id, candidate, reference), compute clipped n-gram overlap —
matches = sum_g min(count_cand(g), count_ref(g)) — and the standard
precision / recall / F1. All counts are exact integers, so P = m/nc,
R = m/nr and the count identity F1 = 2m/(nc+nr) are each ONE float
division of exact longs: bit-deterministic cross-engine (the exact
integer-moment recipe, NOTES.md).

Gram semantics are shared with dedup.word_ngrams (docs shorter than n
yield one truncated gram), so eval overlap can never drift from the
dedup/decontamination gram window.

Scale shape: both gram tables aggregate by (pair_id, gram) — the
clipped-match join hits the SAME keys, so Spark reuses the exchange
(groupBy output partitioning satisfies the join); per-pair totals are
computed from array lengths WITHOUT exploding. No broadcast of
anything corpus-sized, no UDFs.

The reference repo has no eval ops; beyond-reference LLM-pipeline
suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mms_rdf_spark.operators.dedup import _tokens, word_ngrams


def rouge_n(pairs: DataFrame, n: int = 2) -> DataFrame:
    """(pair_id, candidate, reference) -> (pair_id, matches, n_cand,
    n_ref, precision, recall, f1), ROUGE-N with clipped counts."""
    cand_toks = _tokens(F.coalesce(F.col("candidate"), F.lit("")))
    ref_toks = _tokens(F.coalesce(F.col("reference"), F.lit("")))
    base = pairs.select(
        "pair_id",
        word_ngrams(cand_toks, n).alias("_cg"),
        word_ngrams(ref_toks, n).alias("_rg"))

    def counts(col: str, out: str) -> DataFrame:
        return (base.select("pair_id", F.explode(col).alias("gram"))
                .groupBy("pair_id", "gram")
                .agg(F.count(F.lit(1)).cast("long").alias(out)))

    matches = (
        counts("_cg", "_cc")
        .join(counts("_rg", "_rc"), ["pair_id", "gram"])
        .groupBy("pair_id")
        .agg(F.sum(F.least("_cc", "_rc")).cast("long").alias("matches")))

    totals = base.select(
        "pair_id",
        F.size("_cg").cast("long").alias("n_cand"),
        F.size("_rg").cast("long").alias("n_ref"))

    m = F.coalesce(F.col("matches"), F.lit(0)).cast("long")
    return (
        totals.join(matches, "pair_id", "left")
        .select(
            "pair_id", m.alias("matches"), "n_cand", "n_ref",
            F.round(m.cast("double") / F.col("n_cand"), 6).alias("precision"),
            F.round(m.cast("double") / F.col("n_ref"), 6).alias("recall"),
            F.round((2 * m).cast("double")
                    / (F.col("n_cand") + F.col("n_ref")), 6).alias("f1"))
    )


def doc_pairs(docs: DataFrame) -> DataFrame:
    """Deterministic eval pairing over the documents table: doc 2k is
    the candidate, doc 2k+1 its reference (pair_id = k). Stands in for
    a real (model output, gold) join, which would arrive pre-paired."""
    cand = docs.where(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("long").alias("pair_id"),
        F.col("text").alias("candidate"))
    ref = docs.where(F.col("doc_id") % 2 == 1).select(
        ((F.col("doc_id") - 1) / 2).cast("long").alias("pair_id"),
        F.col("text").alias("reference"))
    return cand.join(ref, "pair_id")


def rrf_fuse(a: DataFrame, b: DataFrame, k: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists: (doc_id, rank)
    frames -> (doc_id, rrf_score) with score = sum of 1/(k + rank)
    over the lists the doc appears in (absent list contributes 0 — the
    standard RRF treatment). The canonical way to merge heterogeneous
    retrieval signals (lexical BM25 x semantic / quality rankings)
    without score calibration.

    Scale shape: the inputs are top-k lists (k rows each, already
    reduced by TakeOrdered upstream) — the fusion join is trivially
    broadcastable and never sees the corpus.
    """
    sa = a.select("doc_id", F.col("rank").alias("_ra"))
    sb = b.select("doc_id", F.col("rank").alias("_rb"))

    def term(c: str) -> F.Column:
        return F.when(F.col(c).isNotNull(),
                      F.lit(1.0) / (F.lit(k) + F.col(c))) \
            .otherwise(F.lit(0.0))

    return (sa.join(sb, "doc_id", "full_outer")
            .select("doc_id",
                    F.round(term("_ra") + term("_rb"), 9)
                    .alias("rrf_score")))
