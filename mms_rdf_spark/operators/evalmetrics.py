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


def retrieval_metrics(ranked: DataFrame, qrels: DataFrame,
                      k: int = 10) -> DataFrame:
    """Per-query retrieval evaluation over a ranked run and graded
    relevance labels — the metrics a training-data pipeline uses to
    judge its retrievers (BM25 / ANN / fused) before mining hard
    negatives from them. Inputs: `ranked` (query, doc_id, rank —
    1-based) and `qrels` (query, doc_id, rel — integer grades, rel > 0
    means relevant). Returns per query:

        n_rel       total relevant docs in qrels
        mrr         1/rank of the first relevant hit (0 if none)
        ap          average precision @ k with the classic full-recall
                    denominator n_rel (sum of precision at each
                    relevant position / n_rel)
        p_at_k      relevant hits in the top k / k
        recall_at_k relevant hits in the top k / n_rel
        ndcg        DCG/IDCG @ k with the (2^rel - 1)/log2(rank + 1)
                    gain; IDCG from the rel-descending ideal ordering

    Determinism: each transcendental term (log2) rounds to 6dp and
    accumulates in exact micro-unit longs; every ratio is ONE division
    (ndcg divides the two micro-unit longs directly); ideal-order ties
    break by doc_id (numerically irrelevant — equal rel, equal term —
    but it keeps the window deterministic). The DuckDB oracle
    (text_retrieval_eval) mirrors every step.

    Scale shape: one join of the top-k run against qrels, one
    rank-ordered window per query (k rows each), two map-side-combined
    per-query aggregates, one broadcast-sized join of the per-query
    frames. Nothing corpus-sized shuffles; queries are the partition
    key throughout (a hot query still only owns k rows + its qrels).
    """
    from pyspark.sql.window import Window

    r = ranked.where(F.col("rank") <= k)
    j = (r.join(qrels, on=["query", "doc_id"], how="left")
         .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0))))
    w = Window.partitionBy("query").orderBy("rank")
    hit = (F.col("rel") > 0).cast("long")
    j = j.withColumn("_hits", F.sum(hit).over(w))
    gain = (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0)) \
        / F.log2(F.col("rank") + F.lit(1))
    prec = F.col("_hits") / F.col("rank")
    unit = 1e6
    per = j.groupBy("query").agg(
        F.sum(hit).alias("_hits_k"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("_first"),
        F.sum(F.when(F.col("rel") > 0,
                     F.round(F.round(prec, 6) * unit, 0).cast("long"))
              .otherwise(F.lit(0))).alias("_ap_u"),
        F.sum(F.round(F.round(gain, 6) * unit, 0).cast("long"))
        .alias("_dcg_u"))
    rel_only = qrels.where(F.col("rel") > 0)
    nrel = rel_only.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_rel"))
    wq = Window.partitionBy("query").orderBy(F.col("rel").desc(),
                                             "doc_id")
    igain = (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0)) \
        / F.log2(F.col("_irank") + F.lit(1))
    ideal = (rel_only.withColumn("_irank", F.row_number().over(wq))
             .where(F.col("_irank") <= k)
             .groupBy("query")
             .agg(F.sum(F.round(F.round(igain, 6) * unit, 0)
                        .cast("long")).alias("_idcg_u")))
    out = (per.join(nrel, on="query", how="left")
           .join(ideal, on="query", how="left"))
    n_rel = F.coalesce(F.col("n_rel"), F.lit(0))
    return out.select(
        "query", n_rel.cast("long").alias("n_rel"),
        F.when(F.col("_first").isNotNull(),
               F.round(F.lit(1.0) / F.col("_first"), 6))
        .otherwise(F.lit(0.0)).alias("mrr"),
        F.when(n_rel > 0,
               F.round((F.col("_ap_u") / F.lit(unit)) / n_rel, 6))
        .otherwise(F.lit(0.0)).alias("ap"),
        F.round(F.col("_hits_k") / F.lit(k), 6).alias("p_at_k"),
        F.when(n_rel > 0, F.round(F.col("_hits_k") / n_rel, 6))
        .otherwise(F.lit(0.0)).alias("recall_at_k"),
        F.when(F.coalesce(F.col("_idcg_u"), F.lit(0)) > 0,
               F.round(F.col("_dcg_u") / F.col("_idcg_u"), 6))
        .otherwise(F.lit(0.0)).alias("ndcg"))


def bcubed(assignments: DataFrame, gold: DataFrame,
           id_col: str = "id", cluster_col: str = "cluster",
           gold_col: str = "gold") -> DataFrame:
    """B³ (B-cubed) clustering evaluation — THE standard extrinsic
    metric for entity-resolution output (Bagga & Baldwin 1998): for
    each item, P_i = |C(i) ∩ G(i)| / |C(i)| and R_i = |C(i) ∩ G(i)| /
    |G(i)| where C(i)/G(i) are the item's predicted cluster and gold
    class; B³ precision/recall are the item means; F1 their harmonic
    mean. Evaluates the linker's canonicalization against labels
    without the pair-counting blowup of Rand-style metrics.

    Returns ONE row: (n, p_sum_micro, r_sum_micro, bcubed_p, bcubed_r,
    bcubed_f1). Per-item P/R are rounded to 6dp and summed as EXACT
    1e6 micro-unit longs (order-free means); the aggregates are single
    divisions of exact values, F1 one expression of the two rounded
    means (0.0 when both are 0).

    Scale shape: three aggregates (cluster sizes, gold sizes, overlap
    sizes) plus size joins back on their own group keys — every join
    key is an aggregation output key, so the exchanges are reused; the
    final mean is a scalar aggregate. Nothing quadratic: |C(i) ∩ G(i)|
    is a (cluster, gold) group count, never an item-pair join.
    """
    j = (assignments.select(F.col(id_col).alias("id"),
                            F.col(cluster_col).alias("c"))
         .join(gold.select(F.col(id_col).alias("id"),
                           F.col(gold_col).alias("g")), on="id"))
    c_size = j.groupBy("c").agg(F.count(F.lit(1)).alias("cn"))
    g_size = j.groupBy("g").agg(F.count(F.lit(1)).alias("gn"))
    o_size = j.groupBy("c", "g").agg(F.count(F.lit(1)).alias("on"))
    per = (j.join(o_size, on=["c", "g"])
           .join(c_size, on="c").join(g_size, on="g")
           .select(
               F.round(F.round(F.col("on") / F.col("cn"), 6) * 1e6)
               .cast("long").alias("p_micro"),
               F.round(F.round(F.col("on") / F.col("gn"), 6) * 1e6)
               .cast("long").alias("r_micro")))
    agg = per.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("p_micro").cast("long").alias("p_sum_micro"),
                  F.sum("r_micro").cast("long").alias("r_sum_micro"))
    bp = F.round(F.col("p_sum_micro") / 1e6 / F.col("n"), 6)
    br = F.round(F.col("r_sum_micro") / 1e6 / F.col("n"), 6)
    return (agg.where(F.col("n") > 0)
            .withColumn("bcubed_p", bp)
            .withColumn("bcubed_r", br)
            .withColumn(
                "bcubed_f1",
                F.when(F.col("bcubed_p") + F.col("bcubed_r") == 0,
                       F.lit(0.0))
                .otherwise(F.round(
                    2 * F.col("bcubed_p") * F.col("bcubed_r")
                    / (F.col("bcubed_p") + F.col("bcubed_r")), 6))))


def adjusted_rand(assignments: DataFrame, gold: DataFrame,
                  id_col: str = "id", cluster_col: str = "cluster",
                  gold_col: str = "gold") -> DataFrame:
    """Adjusted Rand Index (Hubert & Arabie 1985) — the chance-
    corrected pair-agreement metric, computed WITHOUT any pair join:
    every term is a sum of C(m, 2) over contingency-table counts
    (overlaps n_ij, row sums a_i, column sums b_j), all exact longs;
    the index itself is one float expression of those exact sums.

    Returns ONE row: (n, sum_comb_nij, sum_comb_a, sum_comb_b, ari).
    ARI = (Σij C(n_ij,2) − E) / (M − E) with
    E = ΣC(a_i,2)·ΣC(b_j,2)/C(n,2), M = (ΣC(a_i,2)+ΣC(b_j,2))/2;
    1.0 when the denominator is 0 (both partitions all-singletons or
    one cluster — identical by construction there), rounded 6dp.

    Scale shape: identical to bcubed — three group-count aggregates
    and scalar folds; the C(n,2)-sized pair space is never
    materialized.
    """
    j = (assignments.select(F.col(id_col).alias("id"),
                            F.col(cluster_col).alias("c"))
         .join(gold.select(F.col(id_col).alias("id"),
                           F.col(gold_col).alias("g")), on="id"))

    def _comb2(col):
        return (F.col(col) * (F.col(col) - 1) / 2).cast("long")

    nij = (j.groupBy("c", "g").agg(F.count(F.lit(1)).alias("m"))
           .agg(F.sum(_comb2("m")).cast("long").alias("s_nij")))
    ai = (j.groupBy("c").agg(F.count(F.lit(1)).alias("m"))
          .agg(F.sum(_comb2("m")).cast("long").alias("s_a")))
    bj = (j.groupBy("g").agg(F.count(F.lit(1)).alias("m"))
          .agg(F.sum(_comb2("m")).cast("long").alias("s_b")))
    n = j.agg(F.count(F.lit(1)).cast("long").alias("n"))
    out = (n.crossJoin(nij).crossJoin(ai).crossJoin(bj)
           .where(F.col("n") > 0))
    cn2 = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    # s_a * s_b is ~n^4: compute the expectation in double (the final
    # ratio is rounded 6dp; both engines do the same IEEE ops)
    e = F.col("s_a").cast("double") * F.col("s_b") / cn2
    m = (F.col("s_a") + F.col("s_b")) / 2.0
    return out.select(
        "n",
        F.col("s_nij").alias("sum_comb_nij"),
        F.col("s_a").alias("sum_comb_a"),
        F.col("s_b").alias("sum_comb_b"),
        F.when(m - e == 0, F.lit(1.0))
        .otherwise(F.round((F.col("s_nij") - e) / (m - e), 6))
        .alias("ari"))


def normalized_mutual_info(assignments: DataFrame, gold: DataFrame,
                           id_col: str = "id",
                           cluster_col: str = "cluster",
                           gold_col: str = "gold") -> DataFrame:
    """NMI (max normalization): I(C;G) / max(H(C), H(G)) — completes
    the clustering-eval triple with bcubed and adjusted_rand from the
    SAME three group-count aggregates. Mutual information and both
    entropies are computed as exact nano-unit long sums of per-cell
    terms (each term's ln(...) rounded 9dp before scaling — the repo's
    transcendental recipe), so the sums are order-free and a SQL
    oracle is bit-exact; only the final ratio is a float division.

    I(C;G)  = Σ_ij (n_ij/n)·ln(n·n_ij/(a_i·b_j))
    H(C)    = −Σ_i (a_i/n)·ln(a_i/n)
    Returns ONE row: (n, mi_nano, hc_nano, hg_nano, nmi) with nmi
    rounded 6dp, and 1.0 when both entropies are 0 (single cluster ==
    single class). Never a pair join; ~|C|·|G| cells at most.
    """
    j = (assignments.select(F.col(id_col).alias("id"),
                            F.col(cluster_col).alias("c"))
         .join(gold.select(F.col(id_col).alias("id"),
                           F.col(gold_col).alias("g")), on="id"))
    n = j.agg(F.count(F.lit(1)).cast("long").alias("n"))
    nij = j.groupBy("c", "g").agg(F.count(F.lit(1)).alias("m"))
    ai = j.groupBy("c").agg(F.count(F.lit(1)).alias("a"))
    bj = j.groupBy("g").agg(F.count(F.lit(1)).alias("b"))

    def _nano(x):
        return F.round(F.round(x, 9) * 1e9).cast("long")

    mi = (nij.join(ai, on="c").join(bj, on="g").crossJoin(n)
          .select(_nano((F.col("m") / F.col("n"))
                        * F.log(F.col("n").cast("double") * F.col("m")
                                / (F.col("a") * F.col("b"))))
                  .alias("t"))
          .agg(F.sum("t").cast("long").alias("mi_nano")))

    def _entropy(sizes: DataFrame, col: str, out: str) -> DataFrame:
        return (sizes.crossJoin(n)
                .select(_nano(-(F.col(col) / F.col("n"))
                              * F.log(F.col(col) / F.col("n")))
                        .alias("t"))
                .agg(F.sum("t").cast("long").alias(out)))

    hc = _entropy(ai, "a", "hc_nano")
    hg = _entropy(bj, "b", "hg_nano")
    out = (n.crossJoin(mi).crossJoin(hc).crossJoin(hg)
           .where(F.col("n") > 0))
    return out.select(
        "n", "mi_nano", "hc_nano", "hg_nano",
        F.when(F.greatest("hc_nano", "hg_nano") == 0, F.lit(1.0))
        .otherwise(F.round(F.col("mi_nano")
                           / F.greatest("hc_nano", "hg_nano")
                           .cast("double"), 6)).alias("nmi"))


def cohens_kappa(a: DataFrame, b: DataFrame, id_col: str = "id",
                 label_a: str = "label", label_b: str = "label"
                 ) -> DataFrame:
    """Cohen's kappa — chance-corrected inter-annotator agreement
    (Cohen 1960), the standard QC metric for label pipelines (human
    vs human, model vs gold, two model raters): kappa =
    (p_o − p_e) / (1 − p_e) with p_o the observed agreement rate and
    p_e = Σ_l (n_a,l/n)(n_b,l/n) the chance agreement from the two
    raters' marginals.

    Returns ONE row (n, n_agree, po, pe, kappa): n/n_agree exact
    longs; p_o one division; p_e from exact marginal products summed
    in double over the label set (|labels| terms — tiny); kappa one
    expression rounded 6dp, defined 1.0 when p_e == 1 (both raters
    constant and equal — agreement is perfect by construction there;
    otherwise the 0/0 form).

    Scale shape: one id join + three group counts; the marginal
    product sum is a |labels|-row fold. Nothing pairwise.
    """
    j = (a.select(F.col(id_col).alias("id"),
                  F.col(label_a).alias("la"))
         .join(b.select(F.col(id_col).alias("id"),
                        F.col(label_b).alias("lb")), on="id"))
    n = j.agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum((F.col("la") == F.col("lb")).cast("long"))
              .cast("long").alias("n_agree"))
    ma = j.groupBy(F.col("la").alias("l")).agg(
        F.count(F.lit(1)).alias("na"))
    mb = j.groupBy(F.col("lb").alias("l")).agg(
        F.count(F.lit(1)).alias("nb"))
    pe = (ma.join(mb, on="l")
          .agg(F.sum(F.col("na").cast("double") * F.col("nb"))
               .alias("_s")))
    out = n.crossJoin(pe).where(F.col("n") > 0) \
        .na.fill({"_s": 0.0})
    po = F.col("n_agree") / F.col("n")
    pe_v = F.col("_s") / (F.col("n").cast("double") * F.col("n"))
    return out.select(
        "n", "n_agree",
        F.round(po, 6).alias("po"),
        F.round(pe_v, 6).alias("pe"),
        F.when(pe_v == 1.0, F.lit(1.0))
        .otherwise(F.round((po - pe_v) / (1.0 - pe_v), 6))
        .alias("kappa"))


def classification_report(pred: DataFrame, gold: DataFrame,
                          id_col: str = "id",
                          label_col: str = "label") -> DataFrame:
    """Per-class precision / recall / F1 — the sklearn-style
    classification report, fully in-engine: one id join, one
    (pred, gold) contingency aggregate (|classes|² rows max), then
    pure column math. Returns (label, tp, fp, fn, precision, recall,
    f1) for every label present in either rater; macro/micro
    averages are one tiny aggregate away from this frame.

    Determinism: tp/fp/fn are exact longs; precision and recall are
    single divisions of those longs rounded 6dp; f1 is computed FROM
    THE ROUNDED p and r (identical doubles in both engines) — the
    cohens_kappa discipline. Zero-denominator classes report 0.0 (the
    sklearn zero_division=0 convention)."""
    j = (pred.select(F.col(id_col).alias("_id"),
                     F.col(label_col).alias("_p"))
         .join(gold.select(F.col(id_col).alias("_id"),
                           F.col(label_col).alias("_g")), on="_id"))
    cells = j.groupBy("_p", "_g").agg(F.count(F.lit(1)).alias("c"))
    per_pred = (cells.groupBy(F.col("_p").alias("label"))
                .agg(F.sum("c").alias("n_pred"),
                     F.sum(F.when(F.col("_p") == F.col("_g"),
                                  F.col("c")).otherwise(0))
                     .alias("tp_p")))
    per_gold = (cells.groupBy(F.col("_g").alias("label"))
                .agg(F.sum("c").alias("n_gold")))
    m = per_pred.join(per_gold, on="label", how="full_outer")
    tp = F.coalesce("tp_p", F.lit(0)).cast("long")
    n_pred = F.coalesce("n_pred", F.lit(0)).cast("long")
    n_gold = F.coalesce("n_gold", F.lit(0)).cast("long")
    prec = F.when(n_pred > 0, F.round(tp / n_pred, 6)) \
        .otherwise(F.lit(0.0))
    rec = F.when(n_gold > 0, F.round(tp / n_gold, 6)) \
        .otherwise(F.lit(0.0))
    scored = m.select("label", tp.alias("tp"),
                      (n_pred - tp).alias("fp"),
                      (n_gold - tp).alias("fn"),
                      prec.alias("precision"), rec.alias("recall"))
    p, r = F.col("precision"), F.col("recall")
    return scored.withColumn(
        "f1", F.when(p + r > 0, F.round(2 * p * r / (p + r), 6))
        .otherwise(F.lit(0.0)))


def mcnemar_test(pred_a: DataFrame, pred_b: DataFrame,
                 gold: DataFrame, id_col: str = "id",
                 label_col: str = "label") -> DataFrame:
    """McNemar's paired test between two classifiers on the same
    items (McNemar 1947; the Dietterich 1998 recommendation for
    comparing models on one test set): counts the DISCORDANT items —
    n01 = A wrong, B right; n10 = A right, B wrong — and the
    continuity-corrected statistic (|n01−n10|−1)²/(n01+n10), which is
    χ²(1df) under "both models have the same error rate". Returns ONE
    row (n, n01, n10, statistic); statistic is 0.0 when no item
    discords (the degenerate-case convention). Two id joins + one
    aggregate; the counts are exact longs, the statistic one division
    of longs rounded 6dp."""
    j = (pred_a.select(F.col(id_col).alias("_id"),
                       F.col(label_col).alias("_a"))
         .join(pred_b.select(F.col(id_col).alias("_id"),
                             F.col(label_col).alias("_b")), on="_id")
         .join(gold.select(F.col(id_col).alias("_id"),
                           F.col(label_col).alias("_g")), on="_id"))
    a_ok = (F.col("_a") == F.col("_g")).cast("long")
    b_ok = (F.col("_b") == F.col("_g")).cast("long")
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((1 - a_ok) * b_ok).alias("n01"),
        F.sum(a_ok * (1 - b_ok)).alias("n10"))
    d = F.col("n01") + F.col("n10")
    num = (F.abs(F.col("n01") - F.col("n10")) - 1)
    return agg.select(
        "n", "n01", "n10",
        F.when(d > 0, F.round(num * num / d, 6))
        .otherwise(F.lit(0.0)).alias("statistic"))


def roc_auc(scored: DataFrame, score_col: str = "prob",
            label_col: str = "y") -> DataFrame:
    """Exact tie-corrected ROC-AUC over a scored frame: the
    probability that a uniformly random positive outscores a
    uniformly random negative, ties counting 1/2 — the standard
    threshold-free classifier metric (and the missing third of the
    eval triple next to classification_report and calibration_error).

    AUC is algebraically the Mann-Whitney statistic of the positive
    class over scores, AUC = U_+ / (n_pos * n_neg), so this reuses
    the exact-long rank discipline of analytics.mann_whitney_u:
    per DISTINCT score the frame carries (cnt, cnt_pos); the
    inclusive global cumsum of cnt gives the tie class's max rank;
    the DOUBLED tied rank-sum 2R_+ = sum(cnt_pos*(2*cum - cnt + 1))
    and 2U_+ = 2R_+ - n_pos*(n_pos+1) are exact longs; the single
    float op is the final division, rounded 6dp. Ranks never exist
    as floats, so both engines agree bit-for-bit.

    Returns one row (n_pos, n_neg, auc); auc is NULL when a class is
    empty; empty input yields an empty frame. Scale shape: one
    map-side-combined aggregate collapses the corpus to |distinct
    scores| rows, the cumsum is the distributed two-phase scan
    (prefix.global_cumsum — no single-partition window), finale is a
    1-row aggregate. analytics.mann_whitney_auc is the same statistic
    on the two-sample seam (its cumulative pass is a global window);
    equivalence is pinned in tests/test_ranking_eval.py.
    """
    from mms_rdf_spark.operators.prefix import global_cumsum

    sub = scored.select(F.col(score_col).alias("_v"),
                        F.col(label_col).cast("long").alias("_isp"))
    per = sub.groupBy("_v").agg(F.count(F.lit(1)).alias("_cnt"),
                                F.sum("_isp").alias("_cp"))
    cum = global_cumsum(per, "_v", "_v", "_cnt")
    st = cum.agg(
        F.sum("_cp").cast("long").alias("n1"),
        F.sum(F.col("_cnt") - F.col("_cp")).cast("long").alias("n0"),
        F.sum(F.col("_cp") * (2 * F.col("cum") - F.col("_cnt") + 1))
        .cast("long").alias("r2p"))
    u2 = F.col("r2p") - F.col("n1") * (F.col("n1") + 1)
    auc = F.round(
        u2 / (F.lit(2.0) * F.col("n1") * F.col("n0")), 6)
    return (st.where(F.col("n1").isNotNull())
            .select(F.col("n1").alias("n_pos"),
                    F.col("n0").alias("n_neg"),
                    F.when((F.col("n1") > 0) & (F.col("n0") > 0), auc)
                    .alias("auc")))


def pr_curve(scored: DataFrame, score_col: str = "prob",
             label_col: str = "y") -> DataFrame:
    """Precision-recall curve: one row per DISTINCT score threshold t
    (predict positive iff score >= t) with exact confusion counts —
    the threshold-sweep companion of roc_auc (pick the operating
    point; AUC only says the ranking is good). Returns
    (threshold, tp, fp, fn, precision, recall, f1) ordered by any
    consumer's choice; f1 is computed FROM the rounded p/r so engines
    divide identical doubles (the classification_report rule).

    Exact arithmetic: per distinct score the frame carries (cnt,
    cnt_pos); two distributed cumsums (prefix.global_cumsum — no
    single-partition window) give inclusive counts at-or-below each
    score, so tp = total_pos - cum_pos + cnt_pos and
    fp = (total - cum) + cnt - tp are exact longs. Scale shape: one
    map-side aggregate to |distinct scores| rows (6dp-gridded probs
    bound it at ~1e6), two two-phase scans, a broadcast 1-row total.
    """
    from mms_rdf_spark.operators.prefix import global_cumsum

    sub = scored.select(F.col(score_col).alias("_v"),
                        F.col(label_col).cast("long").alias("_isp"))
    per = sub.groupBy("_v").agg(F.count(F.lit(1)).alias("_cnt"),
                                F.sum("_isp").alias("_cp"))
    c1 = global_cumsum(per, "_v", "_v", "_cnt") \
        .withColumnRenamed("cum", "_cumn")
    c2 = global_cumsum(c1, "_v", "_v", "_cp") \
        .withColumnRenamed("cum", "_cump")
    tot = c2.agg(F.sum("_cnt").cast("long").alias("_tn"),
                 F.sum("_cp").cast("long").alias("_tp"))
    j = c2.crossJoin(F.broadcast(tot))
    tp = (F.col("_tp") - F.col("_cump") + F.col("_cp")).cast("long")
    pos_pred = (F.col("_tn") - F.col("_cumn") + F.col("_cnt")) \
        .cast("long")
    fp = (pos_pred - tp).cast("long")
    fn = (F.col("_tp") - tp).cast("long")
    prec = F.round(tp / pos_pred, 6)
    rec = F.when(F.col("_tp") > 0,
                 F.round(tp / F.col("_tp"), 6))
    f1 = F.when((prec + rec) > 0,
                F.round(2 * prec * rec / (prec + rec), 6)) \
        .otherwise(F.lit(0.0))
    return j.select(
        F.col("_v").alias("threshold"), tp.alias("tp"),
        fp.alias("fp"), fn.alias("fn"), prec.alias("precision"),
        rec.alias("recall"),
        F.when(rec.isNotNull(), f1).alias("f1"))


def krippendorff_alpha(ratings: DataFrame, item_col: str = "item",
                       label_col: str = "label") -> DataFrame:
    """Krippendorff's alpha (nominal) — the inter-annotator agreement
    coefficient that, unlike cohens_kappa, handles ANY number of
    raters and MISSING ratings (Krippendorff 2004): the standard QC
    gate when transcript labels come from several imperfect sources.
    Input is one row per rating (item, label) — rater identity is
    irrelevant to the statistic; NULL labels are ignored; items with
    fewer than 2 ratings carry no disagreement information and are
    excluded per the definition.

      D_o = sum_i (m_i^2 - sum_c n_ic^2) / (m_i - 1)   observed
      D_e = (n^2 - sum_c n_c^2) / (n - 1)              expected
      alpha = 1 - D_o / D_e

    Exact arithmetic: each item's rational D_o term rounds to 9dp and
    rides as a nano long, so the cross-item sum is exact and
    order-free; the marginals n_c / n are exact longs over the KEPT
    items only; D_e and alpha are fixed-order float expressions over
    those longs, mirrored textually by the SQL oracle. alpha is NULL
    when D_e degenerates (all ratings one label).

    Returns one row (n_items, n_ratings, d_o_nano, alpha); d_o_nano
    pins the whole observed-disagreement sum in the hash. Scale
    shape: one (item, label) aggregate, one per-item fold, one
    label-marginal aggregate over kept items, a 1-row finale.
    """
    r = (ratings.where(F.col(label_col).isNotNull())
         .select(F.col(item_col).alias("_i"),
                 F.col(label_col).alias("_l")))
    nic = (r.groupBy("_i", "_l")
           .agg(F.count(F.lit(1)).cast("long").alias("_nic")))
    per = (nic.groupBy("_i")
           .agg(F.sum("_nic").cast("long").alias("_m"),
                F.sum(F.col("_nic") * F.col("_nic")).cast("long")
                .alias("_s2"))
           .where(F.col("_m") >= 2))
    t = F.round(F.round(
        (F.col("_m") * F.col("_m") - F.col("_s2"))
        / (F.col("_m") - 1), 9) * 1e9, 0).cast("long")
    do = per.agg(F.count(F.lit(1)).cast("long").alias("n_items"),
                 F.sum(t).cast("long").alias("d_o_nano"))
    marg = (nic.join(per.select("_i"), on="_i", how="left_semi")
            .groupBy("_l")
            .agg(F.sum("_nic").cast("long").alias("_nc")))
    tot = marg.agg(F.sum("_nc").cast("long").alias("_n"),
                   F.sum(F.col("_nc") * F.col("_nc")).cast("long")
                   .alias("_sc"))
    j = do.crossJoin(F.broadcast(tot)) \
        .where(F.col("n_items").isNotNull() & (F.col("n_items") > 0))
    de = (F.col("_n").cast("double") * F.col("_n") - F.col("_sc")) \
        / (F.col("_n") - 1)
    alpha = F.round(1 - (F.col("d_o_nano") / 1e9) / de, 6)
    return j.select(
        "n_items", F.col("_n").alias("n_ratings"), "d_o_nano",
        F.when(de > 0, alpha).alias("alpha"))


def fleiss_kappa(ratings: DataFrame, item_col: str = "item",
                 label_col: str = "label", m: int = 3) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) — multi-rater chance-corrected
    agreement for a FIXED panel size m: the committee-of-equals
    complement to krippendorff_alpha (which tolerates variable /
    missing panels but weighs items unevenly to get there). Input is
    one row per rating (item, label); rater identity is irrelevant;
    NULL labels are ignored; items whose rating count differs from m
    are excluded (the statistic is undefined for them).

      P_i   = (sum_j n_ij^2 - m) / (m(m-1))    per-item agreement
      P_bar = mean_i P_i
      P_e   = sum_j (c_j / (N m))^2            chance agreement
      kappa = (P_bar - P_e) / (1 - P_e)

    Exact arithmetic: EVERYTHING before the final division is exact
    long math — P_bar's numerator telescopes to S2 - N*m with
    S2 = sum_i sum_j n_ij^2, and P_e's to sum_j c_j^2 over (N m)^2 —
    so unlike alpha no per-item rounding is ever needed; the SQL
    oracle mirrors the two fixed-order float divisions textually.
    kappa is NULL when P_e degenerates to 1 (every rating one label).

    Returns one row (n_items, m, p_bar, p_e, kappa). Scale shape: one
    (item, label) aggregate, one per-item fold, one label-marginal
    aggregate over kept items, a 1-row finale.
    """
    if m < 2:
        raise ValueError("fleiss_kappa requires a panel of m >= 2")
    r = (ratings.where(F.col(label_col).isNotNull())
         .select(F.col(item_col).alias("_i"),
                 F.col(label_col).alias("_l")))
    nic = (r.groupBy("_i", "_l")
           .agg(F.count(F.lit(1)).cast("long").alias("_nic")))
    per = (nic.groupBy("_i")
           .agg(F.sum("_nic").cast("long").alias("_m"),
                F.sum(F.col("_nic") * F.col("_nic")).cast("long")
                .alias("_s2"))
           .where(F.col("_m") == m))
    st = per.agg(F.count(F.lit(1)).cast("long").alias("n_items"),
                 F.sum("_s2").cast("long").alias("_ss"))
    marg = (nic.join(per.select("_i"), on="_i", how="left_semi")
            .groupBy("_l")
            .agg(F.sum("_nic").cast("long").alias("_nc")))
    tot = marg.agg(F.sum(F.col("_nc") * F.col("_nc")).cast("long")
                   .alias("_sc"))
    j = st.crossJoin(F.broadcast(tot)) \
        .where(F.col("_ss").isNotNull() & (F.col("n_items") > 0))
    ni = F.col("n_items")
    pbar = (F.col("_ss") - ni * m).cast("double") / (ni * m * (m - 1))
    pe = F.col("_sc").cast("double") / (ni * m) / (ni * m)
    return j.select(
        "n_items", F.lit(m).cast("long").alias("m"),
        F.round(pbar, 6).alias("p_bar"),
        F.round(pe, 6).alias("p_e"),
        F.when(pe < 1, F.round((pbar - pe) / (1 - pe), 6))
        .alias("kappa"))


def brier_decomposition(scored: DataFrame, score_col: str = "prob",
                        label_col: str = "y") -> DataFrame:
    """Brier score with the Murphy (1973) decomposition — the proper
    scoring rule that completes the classifier-eval set: roc_auc
    measures ranking, pr_curve the operating points, and this the
    probability QUALITY, split into reliability (calibration, lower
    better), resolution (sharpness, higher better) and uncertainty
    (the data's irreducible base-rate variance):

      brier = mean (p - y)^2 = REL - RES + UNC   (binned by distinct p)
      REL = (1/N) sum_k n_k (p_k - o_k)^2        o_k = bin event rate
      RES = (1/N) sum_k n_k (o_k - o_bar)^2
      UNC = o_bar (1 - o_bar)

    Exact arithmetic: probs grid to 6dp micro longs, so the raw Brier
    numerator sum_r (u - y*1e6)^2 is an exact long; per-bin REL/RES
    terms have exact-long numerators (n_k u - s_k 1e6 and
    s_k N - n_k S), are divided in fixed order as doubles, round to
    9dp and ride as nano longs so the cross-bin sums are order-free
    (the krippendorff_alpha recipe); the finale divides exact longs
    only. NULL scores/labels are excluded.

    Returns one row (n, n_bins, brier, reliability, resolution,
    uncertainty). Scale shape: one 1-row totals aggregate, one
    distinct-prob aggregate + broadcast of the totals, a 1-row fold.
    """
    s = (scored.where(F.col(score_col).isNotNull()
                      & F.col(label_col).isNotNull())
         .select(F.round(F.round(F.col(score_col), 6) * 1e6, 0)
                 .cast("long").alias("_u"),
                 F.col(label_col).cast("long").alias("_y")))
    dd = F.col("_u") - F.col("_y") * 1000000
    t0 = s.agg(F.count(F.lit(1)).cast("long").alias("_nn"),
               F.sum("_y").cast("long").alias("_ss"),
               F.sum(dd * dd).cast("long").alias("_qq"))
    per = (s.groupBy("_u")
           .agg(F.count(F.lit(1)).cast("long").alias("_n"),
                F.sum("_y").cast("long").alias("_s"))
           .crossJoin(F.broadcast(t0.where(F.col("_nn") > 0))))
    ar = (F.col("_n") * F.col("_u") - F.col("_s") * 1000000) / 1e6
    br = (F.col("_s") * F.col("_nn") - F.col("_n") * F.col("_ss")) \
        / F.col("_nn")
    trel = F.round(F.round(ar * ar / F.col("_n"), 9) * 1e9, 0) \
        .cast("long")
    tres = F.round(F.round(br * br / F.col("_n"), 9) * 1e9, 0) \
        .cast("long")
    ag = per.agg(F.max("_nn").alias("_nn"), F.max("_ss").alias("_ss"),
                 F.max("_qq").alias("_qq"),
                 F.count(F.lit(1)).cast("long").alias("n_bins"),
                 F.sum(trel).cast("long").alias("_rel"),
                 F.sum(tres).cast("long").alias("_res"))
    ag = ag.where(F.col("_nn").isNotNull() & (F.col("_nn") > 0))
    nn = F.col("_nn")
    obar = F.col("_ss").cast("double") / nn
    return ag.select(
        nn.alias("n"), "n_bins",
        F.round(F.col("_qq") / 1e12 / nn, 6).alias("brier"),
        F.round(F.col("_rel") / 1e9 / nn, 6).alias("reliability"),
        F.round(F.col("_res") / 1e9 / nn, 6).alias("resolution"),
        F.round(obar * (1 - obar), 6).alias("uncertainty"))


def matthews_corr(a: DataFrame, b: DataFrame, positive: str,
                  id_col: str = "id", label_a: str = "label",
                  label_b: str = "label") -> DataFrame:
    """Matthews correlation coefficient — the single binary-classifier
    number that survives class imbalance (unlike accuracy and F1,
    which classification_report already covers): the phi coefficient
    of the 2x2 confusion table between rater a (predictions) and
    rater b (gold), binarized on `positive`.

    MCC = (tp*tn - fp*fn) / sqrt((tp+fp)(tp+fn)(tn+fp)(tn+fn)).

    Exact arithmetic: the four cells come from ONE conditional
    aggregate over the id join (exact longs); the numerator products
    stay long; the denominator's 4-way product runs in double
    (fixed-order, mirrored in SQL) under one sqrt. MCC is NULL when
    any margin is empty (the denominator degenerates).

    Returns one row (n, tp, fp, fn, tn, mcc). Empty join: 0 rows.
    """
    j = (a.select(F.col(id_col).alias("id"),
                  (F.col(label_a) == positive).alias("pa"))
         .join(b.select(F.col(id_col).alias("id"),
                        (F.col(label_b) == positive).alias("pb")),
               on="id"))
    st = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("pa") & F.col("pb")).cast("long"))
        .cast("long").alias("tp"),
        F.sum((F.col("pa") & ~F.col("pb")).cast("long"))
        .cast("long").alias("fp"),
        F.sum((~F.col("pa") & F.col("pb")).cast("long"))
        .cast("long").alias("fn"),
        F.sum((~F.col("pa") & ~F.col("pb")).cast("long"))
        .cast("long").alias("tn"))
    st = st.where(F.col("n").isNotNull() & (F.col("n") > 0))
    tp, fp = F.col("tp"), F.col("fp")
    fn, tn = F.col("fn"), F.col("tn")
    den = (((tp + fp).cast("double") * (tp + fn))
           * ((tn + fp).cast("double") * (tn + fn)))
    mcc = (tp * tn - fp * fn) / F.sqrt(den)
    return st.select(
        "n", "tp", "fp", "fn", "tn",
        F.when(den > 0, F.round(mcc, 6)).alias("mcc"))


def krippendorff_alpha_interval(ratings: DataFrame,
                                item_col: str = "item",
                                value_col: str = "value"
                                ) -> DataFrame:
    """Krippendorff's alpha with the INTERVAL metric — the
    krippendorff_alpha sibling for NUMERIC ratings (quality scores,
    Likert scales): disagreement is (c - k)^2, so near-misses cost
    less than opposite calls. Same multi-rater missing-tolerant
    semantics: rater identity irrelevant, NULLs ignored, items with
    fewer than 2 ratings excluded.

    The pairwise sums collapse to moments — per item,
    sum_{c,k} n_c n_k (c-k)^2 = 2(m*Q - S^2) with S/Q the item's
    value sum / square sum — so nothing is ever pairwise:

      D_o = sum_i 2(m_i Q_i - S_i^2) / (m_i - 1)
      D_e = 2(n Q_tot - S_tot^2) / (n - 1)      over kept ratings
      alpha = 1 - D_o / D_e

    Exact arithmetic: values must be small exact integers (rating
    scales); m*Q - S^2 rides DECIMAL(38,0)/HUGEINT, each item's D_o
    term rounds to 9dp nano longs (order-free cross-item sum), the
    finale is one division. alpha NULL when D_e degenerates (all
    kept ratings identical). Returns (n_items, n_ratings, d_o_nano,
    alpha); 0 rows when nothing survives the m >= 2 filter.
    """
    r = (ratings.where(F.col(value_col).isNotNull())
         .select(F.col(item_col).alias("_i"),
                 F.col(value_col).cast("long").alias("_v")))
    per = (r.groupBy("_i")
           .agg(F.count(F.lit(1)).cast("long").alias("_m"),
                F.sum("_v").cast("long").alias("_s"),
                F.sum(F.col("_v").cast("decimal(38,0)") * F.col("_v"))
                .cast("decimal(38,0)").alias("_q"))
           .where(F.col("_m") >= 2))
    num = (F.col("_m").cast("decimal(38,0)") * F.col("_q")
           - F.col("_s").cast("decimal(38,0)") * F.col("_s"))
    t = F.round(F.round(
        2.0 * num.cast("double") / (F.col("_m") - 1), 9)
        * 1e9, 0).cast("long")
    do = per.agg(F.count(F.lit(1)).cast("long").alias("n_items"),
                 F.sum("_m").cast("long").alias("n_ratings"),
                 F.sum(t).cast("long").alias("d_o_nano"))
    kept = r.join(per.select("_i"), on="_i", how="left_semi")
    tot = kept.agg(
        F.sum(F.lit(1)).cast("long").alias("_n"),
        F.sum("_v").cast("long").alias("_ts"),
        F.sum(F.col("_v").cast("decimal(38,0)") * F.col("_v"))
        .cast("decimal(38,0)").alias("_tq"))
    j = do.crossJoin(F.broadcast(tot)) \
        .where(F.col("n_items").isNotNull() & (F.col("n_items") > 0))
    de_num = (F.col("_n").cast("decimal(38,0)") * F.col("_tq")
              - F.col("_ts").cast("decimal(38,0)") * F.col("_ts"))
    de = 2.0 * de_num.cast("double") / (F.col("_n") - 1)
    return j.select(
        "n_items", "n_ratings", "d_o_nano",
        F.when(de > 0,
               F.round(1.0 - (F.col("d_o_nano") / 1e9) / de, 6))
        .alias("alpha"))
