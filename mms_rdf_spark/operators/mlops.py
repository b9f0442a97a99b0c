"""In-engine distributed model training: full-batch logistic regression.

A quality-classifier trainer that runs INSIDE the engine as DataFrame
ops — the pattern for fitting small models (quality filters, language
scorers, reweighters) over a 100-TB corpus without exporting data:
full-batch gradient descent where each iteration is one map-side-
combinable aggregate over the feature frame, and the weight vector
lives in a broadcast 1-row frame (the cc.py no-collect rule).

Determinism / cross-engine parity (the pagerank iteration recipe):
features are 6dp-gridded at construction; each doc's sigmoid is
rounded to 9dp, each per-doc gradient term re-gridded at 9dp and
summed as EXACT 1e9 micro-unit longs (order-independent), and the
weight update is one division of exact-long-derived doubles rounded to
9dp — so a DuckDB oracle unrolling the same iterations as CTEs
hash-matches the trained weights.

Scale shape: the corpus is scanned once to build the checkpointed
feature frame; each of the (few) iterations is a single aggregate
producing 2k+1 longs — no shuffle wider than the partial-agg combine,
nothing corpus-sized ever moves. The transcendentals (exp) run
JVM-side in whole-stage codegen.

The reference has no training ops; beyond-reference LLM-pipeline suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mms_rdf_spark.operators.textstats import (
    punct_count_expr,
    stop_ratio_expr,
    upper_count_expr,
)

FEATURES = ["bias", "stop_ratio", "punct_ratio", "upper_ratio",
            "log_tokens"]


def doc_features(docs: DataFrame, label_lang: str = "en") -> DataFrame:
    """documents -> (doc_id, x0..x4, y): 6dp-gridded quality signals
    with an is-`label_lang` label. One corpus scan, all column math."""
    text = F.coalesce(F.col("text"), F.lit(""))
    toks = F.filter(F.split(text, " "), lambda t: t != "")
    chars = F.greatest(F.length(text), F.lit(1))
    return docs.select(
        "doc_id",
        F.lit(1.0).alias("x0"),
        stop_ratio_expr(text).alias("x1"),
        F.round(punct_count_expr(text) / chars, 6).alias("x2"),
        F.round(upper_count_expr(text) / chars, 6).alias("x3"),
        F.round(F.log(F.lit(1.0) + F.size(toks)), 6).alias("x4"),
        (F.col("lang") == label_lang).cast("int").alias("y"),
    )


def logreg_train(feats: DataFrame, iterations: int = 6,
                 lr: float = 1.0) -> DataFrame:
    """(doc_id, x0..x4, y) -> (feature, weight): full-batch GD from
    w = 0, `iterations` rounds, mean-gradient step of size `lr`."""
    k = len(FEATURES)
    feats = feats.localCheckpoint()
    w = feats.sparkSession.createDataFrame(
        [tuple([0.0] * k)], ", ".join(f"w{i} double" for i in range(k)))

    for _ in range(iterations):
        j = feats.crossJoin(F.broadcast(w))
        z = sum((F.col(f"w{i}") * F.col(f"x{i}") for i in range(1, k)),
                start=F.col("w0") * F.col("x0"))
        p9 = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)
        aggs = [
            F.sum(F.round(F.round((p9 - F.col("y")) * F.col(f"x{i}"), 9)
                          * 1e9).cast("long")).alias(f"s{i}")
            for i in range(k)
        ] + [F.count(F.lit(1)).alias("n")]
        g = j.agg(*aggs)
        w = (
            w.crossJoin(F.broadcast(g))
            .select(*[
                F.round(F.col(f"w{i}")
                        - lr * F.round((F.col(f"s{i}") / F.lit(1e9))
                                       / F.col("n"), 9), 9)
                .alias(f"w{i}")
                for i in range(k)])
            .localCheckpoint()
        )

    # tall output: one row per feature (stable, hash-checkable)
    cols = [
        F.struct(F.lit(name).alias("feature"),
                 F.col(f"w{i}").alias("weight"))
        for i, name in enumerate(FEATURES)
    ]
    return (w.select(F.explode(F.array(*cols)).alias("_f"))
            .select("_f.feature", "_f.weight"))


def logreg_score(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """Apply trained weights: (doc_id, prob, pred). The weight table
    (k rows) is folded into a broadcast 1-row frame; scoring is a pure
    projection over one corpus scan."""
    k = len(FEATURES)
    wide = weights.groupBy().pivot("feature", FEATURES).sum("weight") \
        .select(*[F.col(name).alias(f"w{i}")
                  for i, name in enumerate(FEATURES)])
    j = feats.crossJoin(F.broadcast(wide))
    z = sum((F.col(f"w{i}") * F.col(f"x{i}") for i in range(1, k)),
            start=F.col("w0") * F.col("x0"))
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return j.select("doc_id", prob.alias("prob"),
                    (prob >= 0.5).cast("int").alias("pred"), "y")


def calibration_error(scored: DataFrame, bins: int = 10) -> DataFrame:
    """Expected calibration error over (prob, y) scored rows: fixed
    equal-width probability bins, per-bin |mean(prob) - mean(y)|
    weighted by bin mass, plus the per-bin table — the reliability
    audit run before trusting a quality filter's threshold.

    Exact arithmetic: probs are 6dp-gridded at scoring, so per-bin
    sums ride exact 1e6 micro-unit longs; each mean is one division
    and ECE = sum(n_b * |gap_b|) / n with the absolute gaps re-gridded
    at 9dp (order-independent, hash-checkable). prob = 1.0 lands in
    the top bin (least(bins-1)).
    """
    b = F.least(F.floor(F.col("prob") * bins).cast("int"),
                F.lit(bins - 1)).alias("bin")
    per = (scored.select(
        b,
        F.round(F.col("prob") * 1e6).cast("long").alias("_pu"),
        F.col("y").cast("long").alias("_y"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("_pu").alias("_spu"), F.sum("_y").alias("_sy")))
    conf = (F.col("_spu") / 1e6) / F.col("n")
    acc = F.col("_sy").cast("double") / F.col("n")
    return per.select(
        "bin", "n",
        F.round(conf, 6).alias("mean_prob"),
        F.round(acc, 6).alias("frac_pos"),
        F.round(F.abs(F.round(conf, 6) - F.round(acc, 6)), 9)
        .alias("gap"))


def feature_hash(docs: DataFrame, n_features: int = 64,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Hashing-trick featurizer (Weinberger et al. 2009): sparse
    (doc_id, feature, value) triples where feature = md5(token) mod
    n_features and value = the SIGNED term count (sign from an
    independent md5 bit, the variance-reduction trick that makes
    hash-collision noise zero-mean). Exactly-zero buckets (signed
    cancellation) are dropped — the sparse contract.

    This is the fixed-dimension featurizer for training quality /
    language classifiers over an unbounded vocabulary at corpus scale:
    no vocabulary table, no fit step, no driver state — so it
    composes with train_logreg_features on 100 TB without a
    vocabulary broadcast. Shape: one corpus scan + one
    (doc_id, feature) aggregate (map-side combined, exact longs);
    both hashes are JVM md5 inside whole-stage codegen.

    Determinism: md5-derived bucket and sign, integer sums — the
    DuckDB oracle (text_feature_hash) is bit-exact.
    """
    from mms_rdf_spark.operators.dedup import _tokens

    toks = docs.select(
        id_col,
        F.explode(_tokens(F.coalesce(F.col(text_col), F.lit("")))
                  ).alias("token"))
    bucket = (F.conv(F.substring(F.md5("token"), 1, 6), 16, 10)
              .cast("long") % n_features)
    sign = F.when(
        F.substring(F.md5(F.concat(F.lit("s|"), F.col("token"))), 1, 1)
        .isin(*"01234567"), F.lit(1)).otherwise(F.lit(-1))
    return (toks.select(id_col, bucket.alias("feature"),
                        sign.alias("sgn"))
            .groupBy(id_col, "feature")
            .agg(F.sum("sgn").cast("long").alias("value"))
            .where(F.col("value") != 0))


def nb_train(docs: DataFrame, label_col: str = "lang",
             text_col: str = "text") -> tuple[DataFrame, DataFrame]:
    """Multinomial Naive Bayes trainer (the classic fastText-era
    quality / language filter for corpus curation) — fully in-engine,
    exact-integer deterministic.

    Returns (weights, meta):
      weights: (label, token, w_micro) — Laplace-smoothed per-class
        token log-likelihood ln((c+1)/(tot_l+V)), rounded 9dp and held
        as EXACT 1e9 micro-unit longs (the fs_scores recipe, so score
        sums are order-independent and a SQL oracle is bit-exact).
        SPARSE: only (label, token) pairs observed in that class.
      meta: (label, prior_micro, default_micro, tot, nd) —
        class log-prior ln(nd_l/n_docs) and the unseen-token default
        ln(1/(tot_l+V)), same micro-unit encoding.

    Scale shape: one corpus scan explodes tokens; the count aggregate
    is map-side combined on (label, token); V and the class totals are
    label-sized broadcast frames. Nothing corpus-sized is collected.
    """
    from mms_rdf_spark.operators.dedup import _tokens

    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(_tokens(F.coalesce(F.col(text_col), F.lit("")))
                  ).alias("token"))
    # materialize the (label, token, c) count table ONCE: V, the class
    # totals, and the weight table all derive from it, and without the
    # checkpoint each consumer re-ran the corpus token explode (the
    # text_nb_lang plan scanned `documents` 10x at sf0.1). counts is
    # the model's own size (sparse vocab x classes), never the corpus.
    counts = (toks.groupBy("label", "token")
              .agg(F.count(F.lit(1)).cast("long").alias("c"))
              .localCheckpoint())
    # V from the count table (identical set: a token appears in counts
    # iff it appears in the corpus), saving a second corpus explode
    vocab = counts.select("token").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("v"))
    tot = counts.groupBy("label").agg(F.sum("c").alias("tot"))
    nd = (docs.groupBy(F.col(label_col).alias("label"))
          .agg(F.count(F.lit(1)).cast("long").alias("nd")))
    # n_docs folded from the per-class doc counts (same number, one
    # scan of `docs` saved; the shared nd aggregate dedupes via
    # runtime exchange reuse)
    n_docs = nd.agg(F.sum("nd").cast("long").alias("n"))

    def _micro(x):
        return F.round(F.round(x, 9) * 1e9).cast("long")

    weights = (counts.join(F.broadcast(tot), on="label")
               .crossJoin(F.broadcast(vocab))
               .select("label", "token",
                       _micro(F.log((F.col("c") + 1.0)
                                    / (F.col("tot") + F.col("v"))))
                       .alias("w_micro")))
    meta = (nd.join(tot, on="label")
            .crossJoin(F.broadcast(vocab))
            .crossJoin(F.broadcast(n_docs))
            .select("label",
                    _micro(F.log(F.col("nd") / F.col("n")))
                    .alias("prior_micro"),
                    _micro(F.log(1.0 / (F.col("tot") + F.col("v"))))
                    .alias("default_micro"),
                    "tot", "nd"))
    return weights, meta


def nb_score(docs: DataFrame, weights: DataFrame, meta: DataFrame,
             id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Score docs with an nb_train model: per-doc argmax class.

    Returns (doc_id, pred, lp_micro): the winning label (ties broken
    by label ascending — deterministic) and its log-posterior in
    exact 1e9 micro-units.

    Unseen-token handling without a DENSE V×K weight table: per
    (doc, label), lp = prior + Σ_present cnt·w + (n_tok −
    matched_cnt)·default — so the token join stays against the SPARSE
    weights (1-to-≤K on token) and out-of-class tokens cost one
    arithmetic term instead of V×K join rows. The label spine is a
    broadcast cross join (K rows), the token aggregate is map-side
    combined; everything is long arithmetic end-to-end.
    """
    from pyspark.sql.window import Window

    from mms_rdf_spark.operators.dedup import _tokens

    # the doc-term table feeds BOTH the per-doc token totals and the
    # weight join; its aggregate exchange is identical in both subtrees
    # so AQE's runtime exchange reuse computes it once — an eager
    # checkpoint here measured NET-NEGATIVE (~+0.5 s at sf0.1) and
    # would materialize a corpus-sized table at scale
    dt = (docs.select(F.col(id_col).alias("doc_id"),
                      F.explode(_tokens(
                          F.coalesce(F.col(text_col), F.lit(""))))
                      .alias("token"))
          .groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    ntok = dt.groupBy("doc_id").agg(F.sum("cnt").alias("n_tok"))
    # docs with zero tokens still need a prediction row
    ntok = (docs.select(F.col(id_col).alias("doc_id"))
            .join(ntok, on="doc_id", how="left")
            .na.fill({"n_tok": 0}))

    part = (dt.join(weights, on="token")
            .groupBy("doc_id", "label")
            .agg(F.sum(F.col("cnt") * F.col("w_micro")).alias("wsum"),
                 F.sum("cnt").alias("matched")))
    labels = meta.select("label", "prior_micro", "default_micro")
    spine = ntok.crossJoin(F.broadcast(labels))
    lp = (spine.join(part, on=["doc_id", "label"], how="left")
          .na.fill({"wsum": 0, "matched": 0})
          .select("doc_id", "label",
                  (F.col("prior_micro") + F.col("wsum")
                   + (F.col("n_tok") - F.col("matched"))
                   * F.col("default_micro")).alias("lp_micro")))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("lp_micro").desc(), F.col("label").asc())
    return (lp.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("doc_id", F.col("label").alias("pred"),
                    "lp_micro"))


def ols2_train(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
) -> DataFrame:
    """Closed-form ordinary least squares with TWO features + an
    intercept — y ~ b0 + b1*x1 + b2*x2 — trained fully in-engine:
    the normal equations' nine moment sums come from ONE map-side-
    combined aggregate, and the 3x3 system solves by Cramer's rule in
    fixed-order float expressions over those exact sums (the
    multiple-regression sibling of analytics.grouped_ols_trend's
    simple slope and logreg_train's iterative fit). All columns must
    already be exact integers (counts or pre-scaled units).

    Exact arithmetic: x*x, x*y cross sums are exact longs, y*y rides
    DECIMAL(38,0)/HUGEINT; the determinants are textual mirrors in
    the SQL oracle; R^2 is computed FROM THE ROUNDED coefficients so
    both engines multiply identical doubles.

    Returns one row (n, b0, b1, b2, r2): coefficients NULL when the
    design matrix is singular (det = 0 — collinear or constant
    features); r2 additionally NULL when y is constant. Empty: 0
    rows.

    Scale shape: one aggregate, a 1-row fold. Two features is the
    Cramer sweet spot; for wider designs compose feature_hash +
    logreg-style iterations instead.

    Reference provenance: no analog in the reference (Node triple
    factory); beyond-reference in-engine training suite.
    """
    y = F.col(y_col).cast("long")
    x1 = F.col(x1_col).cast("long")
    x2 = F.col(x2_col).cast("long")
    st = (df.where(y.isNotNull() & x1.isNotNull() & x2.isNotNull())
          .agg(F.count(F.lit(1)).cast("long").alias("n"),
               F.sum(x1).cast("long").alias("_s1"),
               F.sum(x2).cast("long").alias("_s2"),
               F.sum(y).cast("long").alias("_sy"),
               F.sum(x1 * x1).cast("long").alias("_s11"),
               F.sum(x1 * x2).cast("long").alias("_s12"),
               F.sum(x2 * x2).cast("long").alias("_s22"),
               F.sum(x1 * y).cast("long").alias("_s1y"),
               F.sum(x2 * y).cast("long").alias("_s2y"),
               F.sum(y.cast("decimal(38,0)") * y)
               .cast("decimal(38,0)").alias("_syy")))
    st = st.where(F.col("n").isNotNull() & (F.col("n") > 0))
    a11 = F.col("n").cast("double")
    a12 = F.col("_s1").cast("double")
    a13 = F.col("_s2").cast("double")
    a22 = F.col("_s11").cast("double")
    a23 = F.col("_s12").cast("double")
    a33 = F.col("_s22").cast("double")
    c1 = F.col("_sy").cast("double")
    c2 = F.col("_s1y").cast("double")
    c3 = F.col("_s2y").cast("double")
    det = (a11 * (a22 * a33 - a23 * a23)
           - a12 * (a12 * a33 - a23 * a13)
           + a13 * (a12 * a23 - a22 * a13))
    det0 = (c1 * (a22 * a33 - a23 * a23)
            - a12 * (c2 * a33 - a23 * c3)
            + a13 * (c2 * a23 - a22 * c3))
    det1 = (a11 * (c2 * a33 - a23 * c3)
            - c1 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * c3 - c2 * a13))
    det2 = (a11 * (a22 * c3 - c2 * a23)
            - a12 * (a12 * c3 - c2 * a13)
            + c1 * (a12 * a23 - a22 * a13))
    b0 = F.round(det0 / det, 6)
    b1 = F.round(det1 / det, 6)
    b2 = F.round(det2 / det, 6)
    syy = F.col("_syy").cast("double")
    sst = syy - c1 * c1 / a11
    sse = syy - (b0 * c1 + b1 * c2 + b2 * c3)
    ok = det != 0.0
    return st.select(
        "n",
        F.when(ok, b0).alias("b0"),
        F.when(ok, b1).alias("b1"),
        F.when(ok, b2).alias("b2"),
        F.when(ok & (sst > 0),
               F.round(1.0 - sse / sst, 6)).alias("r2"))


def ols2_breusch_pagan(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
) -> DataFrame:
    """Breusch-Pagan heteroscedasticity test for the ols2_train fit:
    regress the squared residuals on the same two features and
    report BP = n * R^2_aux (chi-square, dof = 2 under the null of
    constant error variance) — the standard "can I trust my OLS
    standard errors?" diagnostic.

    Two exact passes: (1) ols2_train's one-aggregate fit; (2) a
    residual pass where e = y - (b0 + b1*x1 + b2*x2) uses the
    ROUNDED coefficients (identical doubles on both engines) and
    rounds to the integer unit grid, so e and e^2 are exact longs
    and the aux regression's moment sums ride exact
    longs/DECIMAL(38,0) (e^4 sums fit HUGEINT through cents-scale
    1e6-row data). The aux R^2 solves by the same Cramer mirror.

    Returns one row (n, bp, dof): bp NULL when the design is
    singular or the squared residuals are constant. Empty: 0 rows.

    Scale shape: two aggregates over the joined frame, 1-row folds.

    Reference provenance: no analog in the reference; beyond-
    reference diagnostics suite.
    """
    coefs = ols2_train(df, y_col, x1_col, x2_col).collect()
    if not coefs or coefs[0]["b0"] is None:
        return df.sparkSession.createDataFrame(
            [], "n long, bp double, dof int")
    c = coefs[0]
    y = F.col(y_col).cast("long")
    x1 = F.col(x1_col).cast("long")
    x2 = F.col(x2_col).cast("long")
    e = F.round(y - (F.lit(c["b0"]) + F.lit(c["b1"]) * x1
                     + F.lit(c["b2"]) * x2)).cast("long")
    d = (df.where(y.isNotNull() & x1.isNotNull() & x2.isNotNull())
         .select((e.cast("decimal(38,0)") * e)
                 .cast("decimal(38,0)").alias("_u"),
                 x1.alias("_x1"), x2.alias("_x2")))
    st = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_x1").cast("long").alias("_s1"),
        F.sum("_x2").cast("long").alias("_s2"),
        F.sum("_u").cast("decimal(38,0)").alias("_sy"),
        F.sum(F.col("_x1") * F.col("_x1")).cast("long").alias("_s11"),
        F.sum(F.col("_x1") * F.col("_x2")).cast("long").alias("_s12"),
        F.sum(F.col("_x2") * F.col("_x2")).cast("long").alias("_s22"),
        F.sum(F.col("_u") * F.col("_x1")).cast("decimal(38,0)")
        .alias("_s1y"),
        F.sum(F.col("_u") * F.col("_x2")).cast("decimal(38,0)")
        .alias("_s2y"),
        F.sum(F.col("_u") * F.col("_u")).cast("decimal(38,0)")
        .alias("_syy"))
    st = st.where(F.col("n").isNotNull() & (F.col("n") > 0))
    a11 = F.col("n").cast("double")
    a12 = F.col("_s1").cast("double")
    a13 = F.col("_s2").cast("double")
    a22 = F.col("_s11").cast("double")
    a23 = F.col("_s12").cast("double")
    a33 = F.col("_s22").cast("double")
    c1 = F.col("_sy").cast("double")
    c2 = F.col("_s1y").cast("double")
    c3 = F.col("_s2y").cast("double")
    det = (a11 * (a22 * a33 - a23 * a23)
           - a12 * (a12 * a33 - a23 * a13)
           + a13 * (a12 * a23 - a22 * a13))
    det0 = (c1 * (a22 * a33 - a23 * a23)
            - a12 * (c2 * a33 - a23 * c3)
            + a13 * (c2 * a23 - a22 * c3))
    det1 = (a11 * (c2 * a33 - a23 * c3)
            - c1 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * c3 - c2 * a13))
    det2 = (a11 * (a22 * c3 - c2 * a23)
            - a12 * (a12 * c3 - c2 * a13)
            + c1 * (a12 * a23 - a22 * a13))
    b0 = F.round(det0 / det, 6)
    b1 = F.round(det1 / det, 6)
    b2 = F.round(det2 / det, 6)
    syy = F.col("_syy").cast("double")
    sst = syy - c1 * c1 / a11
    sse = syy - (b0 * c1 + b1 * c2 + b2 * c3)
    r2 = 1.0 - sse / sst
    ok = (det != 0.0) & (sst > 0)
    return st.select(
        "n",
        F.when(ok, F.round(F.col("n") * r2, 6)).alias("bp"),
        F.when(ok, F.lit(2).cast("int")).alias("dof"))


def kfold_assign(docs: DataFrame, k: int = 5,
                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic k-fold assignment: fold = md5(id) mod k — the
    cross-validation splitter that needs no fit state, survives
    re-runs and re-partitioning bit-for-bit, and composes with
    split_leakage for contamination checks. Returns (id, fold).

    Same md5-bucket recipe as feature_hash (first 6 hex chars as an
    integer), so the DuckDB oracle is bit-exact.
    """
    if k < 2:
        raise ValueError("kfold_assign: k >= 2")
    fold = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")),
                               1, 6), 16, 10)
            .cast("long") % k).cast("int")
    return docs.select(F.col(id_col).alias("id"),
                       fold.alias("fold"))


def kfold_summary(docs: DataFrame, k: int = 5,
                  id_col: str = "doc_id",
                  strata_col: str = "lang") -> DataFrame:
    """Per-fold audit of a kfold_assign split: size and per-stratum
    counts — the "are my folds balanced?" table (md5 folds are
    binomially balanced, not exactly equal; this is the check).
    Returns (fold, stratum, n_docs) — exact longs."""
    f = kfold_assign(docs, k, id_col)
    j = docs.select(F.col(id_col).alias("id"),
                    F.col(strata_col).alias("stratum")).join(f, on="id")
    return (j.groupBy("fold", "stratum")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))


def spiegelhalter_z(scored: DataFrame) -> DataFrame:
    """Spiegelhalter's calibration Z-test over (prob, y) scored rows
    — calibration_error's INFERENTIAL companion: is the observed
    miscalibration larger than chance given these probabilities?
    Z = sum (y - p)(1 - 2p) / sqrt(sum (1-2p)^2 p (1-p)); |Z| > 2
    means the probabilities are statistically miscalibrated.

    Exact arithmetic: probs are 6dp-gridded at scoring, so with
    pu = p*1e6 every term is an exact integer — numerator units
    1e12, denominator units 1e24, summed as DECIMAL(38,0)/HUGEINT —
    and the finale is one fixed-order division + sqrt, with the
    two-sided p from analytics.normal_sf (same A&S mirror).

    Returns one row (n, z, p_two): NULL when the variance
    degenerates (all probs 0/1 or 1/2). Empty: 0 rows.
    """
    from mms_rdf_spark.operators.analytics import normal_sf

    pu = F.round(F.col("prob") * 1e6).cast("long")
    yu = F.col("y").cast("long") * 1000000
    d = scored.select(pu.alias("_pu"), yu.alias("_yu"))
    num = ((F.col("_yu") - F.col("_pu")).cast("decimal(38,0)")
           * (1000000 - 2 * F.col("_pu")))
    den = ((1000000 - 2 * F.col("_pu")).cast("decimal(38,0)")
           * (1000000 - 2 * F.col("_pu"))
           * F.col("_pu") * (1000000 - F.col("_pu")))
    st = d.agg(F.count(F.lit(1)).cast("long").alias("n"),
               F.sum(num).cast("decimal(38,0)").alias("_nu"),
               F.sum(den).cast("decimal(38,0)").alias("_de"))
    st = st.where(F.col("n").isNotNull() & (F.col("n") > 0))
    z = (F.col("_nu").cast("double") / 1e12) \
        / F.sqrt(F.col("_de").cast("double") / 1e24)
    ok = F.col("_de").cast("double") > 0
    return st.select(
        "n",
        F.when(ok, F.round(z, 6)).alias("z"),
        F.when(ok, F.round(2.0 * normal_sf(F.abs(z)), 6))
        .alias("p_two"))
