"""DSIR-style data selection: hashed n-gram importance weights.

Data Selection via Importance Resampling (Xie et al. 2023): score every
raw-corpus document by how much more likely its hashed n-gram features
are under a small TARGET corpus (the domain you want more of) than
under the raw corpus itself — log w(x) = Σ_g [ln p̂(b(g)) − ln q̂(b(g))]
over the doc's unigram+bigram occurrences, with p̂/q̂ add-α-smoothed
bucket frequencies and b(·) a hash into `n_buckets` buckets. Documents
with high log w are target-like; selection is then a top-k or weighted
sample (packing.weighted_sample pairs naturally).

Scale shape (the reason hashed DSIR beats LM-perplexity scoring at
100 TB): both feature distributions collapse to a bucket table of AT
MOST `n_buckets` rows — a broadcastable constant regardless of corpus
size. One pass over the target (small), one counting pass over the raw
corpus (map-side-combined bucket counts), one scoring pass (explode →
bucket → broadcast-join the n_buckets-row ratio table → per-doc sum);
no joins of the id space, no model state. The raw corpus is read twice
(count then score) — inherent to self-normalized importance weights;
cache/localCheckpoint the gram projection to make it one physical read.

Determinism recipe (cross-engine hash-match): the per-BUCKET log ratio
rounds once to integer micro-units in the ratio table (ln parity at
6 dp — the BM25 precedent); the per-doc score is then an EXACT long sum
of micro-units with one final division (the NOTES.md grid-aligned-sum
rule: float Σ over a doc's grams would be order-dependent). Token,
gram, and truncated-short-doc semantics are shared with
dedup.word_ngrams so the features can never drift from the dedup /
decontamination measures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mms_rdf_spark.operators.dedup import _tokens, word_ngrams


def _gram_buckets(docs: DataFrame, id_col: str, text_col: str,
                  n_buckets: int) -> DataFrame:
    """(_d, _b): one row per unigram+bigram OCCURRENCE, bucketed by the
    first 24 bits of md5 (exact in a long, mirrored in SQL)."""
    toks = _tokens(F.col(text_col))
    grams = F.concat(word_ngrams(toks, 1), word_ngrams(toks, 2))
    g = docs.select(F.col(id_col).alias("_d"),
                    F.explode(grams).alias("_g"))
    b = (F.conv(F.substring(F.md5("_g"), 1, 6), 16, 10).cast("long")
         % n_buckets)
    return g.select("_d", b.alias("_b"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 8192,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, logw) for every raw document; logw > 0 means
    more target-like than raw-average. 6-dp rounded, engine-exact."""
    rb = _gram_buckets(raw, id_col, text_col, n_buckets)
    tb = _gram_buckets(target, id_col, text_col, n_buckets)
    q = rb.groupBy("_b").agg(F.count(F.lit(1)).alias("_q"))
    p = tb.groupBy("_b").agg(F.count(F.lit(1)).alias("_p"))
    # coalesce: an EMPTY corpus sums to null — degrade to pure
    # add-alpha smoothing (defined, null-free) instead of null weights
    qt = q.agg(F.coalesce(F.sum("_q"), F.lit(0)).alias("_qtot"))
    pt = p.agg(F.coalesce(F.sum("_p"), F.lit(0)).alias("_ptot"))
    ab = F.lit(alpha * n_buckets)
    ratio = (
        q.join(p, on="_b", how="left")
        .select("_b", "_q", F.coalesce(F.col("_p"), F.lit(0)).alias("_p"))
        .crossJoin(F.broadcast(qt)).crossJoin(F.broadcast(pt))
        .select(
            "_b",
            # per-bucket log ratio, rounded ONCE to micro-units — the
            # per-doc sum is then exact integer arithmetic
            F.round((F.log((F.col("_p") + F.lit(alpha))
                           / (F.col("_ptot") + ab))
                     - F.log((F.col("_q") + F.lit(alpha))
                             / (F.col("_qtot") + ab))) * 1e6)
            .cast("long").alias("_u")))
    return (rb.join(F.broadcast(ratio), on="_b")
            .groupBy("_d")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.round(F.sum("_u") / 1e6, 6).alias("logw"))
            .select(F.col("_d").alias(id_col), "n_grams", "logw"))


def dsir_top(
    raw: DataFrame,
    target: DataFrame,
    k: int = 100,
    n_buckets: int = 8192,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k most target-like documents (rank, doc_id, logw) — the
    selection step. orderBy().limit(k) plans as TakeOrderedAndProject
    (per-task bounded heaps); rank is a window over the k survivors
    only (the token_vocab round-4 pattern)."""
    from pyspark.sql.window import Window

    w = dsir_weights(raw, target, n_buckets, alpha, id_col, text_col)
    topk = w.orderBy(F.col("logw").desc(), id_col).limit(k)
    win = Window.orderBy(F.col("logw").desc(), id_col)
    return (topk.withColumn("rank",
                            F.row_number().over(win).cast("int"))
            .select("rank", id_col, "n_grams", "logw"))
