"""In-engine logistic regression + temperature mixture sampling."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _separable_docs(spark, n=40):
    """Label-1 docs drown in stopwords; label-0 docs have none — a
    corpus where the stop-ratio feature linearly separates 'en'."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            text = "the a of to in is the and or it " * 3 + f"w{i}"
            lang = "en"
        else:
            text = f"xyz qrs tuv wxy z{i} frob grault " * 3
            lang = "xx"
        rows.append((i, text, lang, "s0", len(text)))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


def test_logreg_learns_separable_signal(spark):
    from mms_rdf_spark.operators.mlops import (
        doc_features, logreg_score, logreg_train)

    feats = doc_features(_separable_docs(spark))
    w = logreg_train(feats, iterations=30, lr=2.0)
    scored = logreg_score(feats, w)
    acc = scored.agg(F.avg((F.col("pred") == F.col("y")).cast("int"))) \
        .collect()[0][0]
    assert acc >= 0.95
    weights = {r.feature: r.weight for r in w.collect()}
    assert weights["stop_ratio"] > 0  # the positive 'en' signal


def test_logreg_loss_decreases(spark):
    from mms_rdf_spark.operators.mlops import (
        doc_features, logreg_score, logreg_train)

    feats = doc_features(_separable_docs(spark))

    def loss(iters):
        w = logreg_train(feats, iterations=iters, lr=2.0)
        s = logreg_score(feats, w)
        eps = 1e-9
        return s.agg(F.avg(
            -(F.col("y") * F.log(F.col("prob") + eps)
              + (1 - F.col("y")) * F.log(1 - F.col("prob") + eps)))) \
            .collect()[0][0]

    # lr=2.0 overshoots on the very first step (loss briefly exceeds
    # the ln 2 start), so compare settled checkpoints
    l5, l30 = loss(5), loss(30)
    assert l30 < l5
    assert l30 < math.log(2)  # better than the w=0 start


def test_logreg_zero_weights_score_half(spark):
    from mms_rdf_spark.operators.mlops import (
        FEATURES, doc_features, logreg_score)

    feats = doc_features(_separable_docs(spark, n=6))
    zeros = spark.createDataFrame([(f, 0.0) for f in FEATURES],
                                  "feature string, weight double")
    probs = [r.prob for r in logreg_score(feats, zeros).collect()]
    assert all(p == 0.5 for p in probs)


def test_logreg_deterministic(spark):
    from mms_rdf_spark.operators.mlops import doc_features, logreg_train

    feats = doc_features(_separable_docs(spark))
    a = logreg_train(feats, iterations=6).orderBy("feature").toPandas()
    b = logreg_train(feats, iterations=6).orderBy("feature").toPandas()
    assert a.equals(b)


def test_temperature_mixture_flattens_head(spark):
    from mms_rdf_spark.operators.trajectory import temperature_mixture

    # 900 docs in the hot domain, 100 in the rare one
    rows = [(i, f"t{i}", "en", "hot" if i < 900 else "rare", 10)
            for i in range(1000)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")

    def shares(alpha):
        out = temperature_mixture(docs, alpha=alpha, budget=400) \
            .groupBy("source").count().collect()
        d = {r.source: r["count"] for r in out}
        return d.get("hot", 0), d.get("rare", 0)

    hot1, rare1 = shares(1.0)    # proportional: rare gets ~40
    hot5, rare5 = shares(0.5)    # flattened: rare share rises
    assert rare5 / max(hot5, 1) > rare1 / max(hot1, 1)
    # alpha=0: equal mass per domain; generous budget keeps ALL rare
    _, rare0 = shares(0.0)
    assert rare0 == 100
    # deterministic
    assert shares(0.5) == shares(0.5)


def test_calibration_error_bins(spark):
    from mms_rdf_spark.operators.mlops import calibration_error

    scored = spark.createDataFrame(
        [(0.05, 0), (0.08, 0),       # bin 0: mean .065, frac 0
         (0.55, 1), (0.55, 0),       # bin 5: mean .55, frac .5
         (1.0, 1)],                  # prob 1.0 -> top bin 9
        "prob double, y int")
    out = {r.bin: r for r in calibration_error(scored, bins=10).collect()}
    assert set(out) == {0, 5, 9}
    assert out[0].n == 2 and out[0].mean_prob == 0.065 \
        and out[0].frac_pos == 0.0 and out[0].gap == 0.065
    assert out[5].mean_prob == 0.55 and out[5].frac_pos == 0.5 \
        and abs(out[5].gap - 0.05) < 1e-9
    assert out[9].n == 1 and out[9].gap == 0.0


def test_feature_hash_signed_counts_and_sparsity(spark):
    from pyspark.sql import functions as F

    from mms_rdf_spark.operators.mlops import feature_hash

    docs = spark.createDataFrame(
        [(1, "alpha alpha beta"), (2, ""), (3, None), (4, "alpha")],
        "doc_id int, text string")
    out = feature_hash(docs, n_features=8).collect()
    rows = {(r.doc_id, r.feature): r.value for r in out}
    # empty / NULL docs emit nothing (sparse contract)
    assert not any(d in (2, 3) for d, _ in rows)
    # same token -> same bucket and sign everywhere: doc 1's alpha
    # bucket holds exactly 2x doc 4's single-alpha value
    (a_feat, a_val), = [(f, v) for (d, f), v in rows.items()
                        if d == 4]
    # (beta may collide into the same bucket, shifting by +-1)
    assert rows[(1, a_feat)] in (a_val * 2 - 1, a_val * 2,
                                 a_val * 2 + 1)
    # values are signed unit counts: |value| == term count
    assert abs(a_val) == 1
    # buckets within range
    assert all(0 <= f < 8 for _, f in rows)
    # deterministic across invocations
    again = {(r.doc_id, r.feature): r.value
             for r in feature_hash(docs, n_features=8).collect()}
    assert again == rows


def test_ols2_train_matches_numpy_lstsq(spark):
    import numpy as np

    from mms_rdf_spark.operators.mlops import ols2_train

    rows = [(3 + 2 * a + 5 * b + e, a, b) for a, b, e in
            [(1, 2, 1), (2, 1, -1), (3, 5, 2), (4, 2, 0),
             (5, 7, -2), (6, 3, 1), (2, 9, -1), (8, 4, 0)]]
    df = spark.createDataFrame(rows, "y long, x1 long, x2 long")
    r = ols2_train(df, "y", "x1", "x2").collect()[0]
    X = np.array([[1.0, a, b] for _, a, b in rows])
    yv = np.array([float(y) for y, _, _ in rows])
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    assert r.n == len(rows)
    assert abs(r.b0 - beta[0]) < 1e-5
    assert abs(r.b1 - beta[1]) < 1e-5
    assert abs(r.b2 - beta[2]) < 1e-5
    pred = X @ beta
    sst = ((yv - yv.mean()) ** 2).sum()
    r2 = 1 - ((yv - pred) ** 2).sum() / sst
    assert abs(r.r2 - r2) < 1e-4

    # collinear features -> singular -> NULL coefficients
    col = [(y, a, 2 * a) for y, a, _ in rows]
    df2 = spark.createDataFrame(col, "y long, x1 long, x2 long")
    r = ols2_train(df2, "y", "x1", "x2").collect()[0]
    assert r.b0 is None and r.r2 is None

    # constant y -> r2 NULL but fit exact; empty -> 0 rows
    cy = [(7, a, b) for _, a, b in rows]
    r = ols2_train(spark.createDataFrame(
        cy, "y long, x1 long, x2 long"), "y", "x1", "x2").collect()[0]
    assert r.r2 is None and r.b0 == 7.0 and r.b1 == 0.0
    assert ols2_train(df.where("y < 0"), "y", "x1", "x2").count() == 0


def test_matthews_corr_hand_cases(spark):
    from mms_rdf_spark.operators.evalmetrics import matthews_corr

    def _df(labels):
        return spark.createDataFrame(
            [(i, l) for i, l in enumerate(labels)],
            "id long, label string")

    # hand 2x2: tp=4 fp=1 fn=2 tn=3
    gold = _df(["p"] * 6 + ["n"] * 4)
    pred = _df(["p"] * 4 + ["n"] * 2 + ["p"] + ["n"] * 3)
    r = matthews_corr(pred, gold, positive="p").collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (4, 1, 2, 3)
    den = (5 * 6 * 4 * 5) ** 0.5
    assert r.mcc == round((4 * 3 - 1 * 2) / den, 6)

    # perfect prediction -> 1; inverted -> -1; constant pred -> NULL
    assert matthews_corr(gold, gold, positive="p") \
        .collect()[0].mcc == 1.0
    inv = _df(["n"] * 6 + ["p"] * 4)
    assert matthews_corr(inv, gold, positive="p") \
        .collect()[0].mcc == -1.0
    const = _df(["p"] * 10)
    assert matthews_corr(const, gold, positive="p") \
        .collect()[0].mcc is None
    # empty join -> 0 rows
    assert matthews_corr(pred.where("id < 0"), gold,
                         positive="p").count() == 0


def test_breusch_pagan_detects_heteroscedasticity(spark):
    import numpy as np

    from mms_rdf_spark.operators.mlops import ols2_breusch_pagan

    # deterministic pseudo-noise from a hash-free recurrence
    def noise(i):
        return ((i * 37 + 11) % 17) - 8  # in [-8, 8]

    # heteroscedastic: error magnitude grows with x1
    het = [(1000 + 20 * a + 3 * b + noise(i) * a, a, b)
           for i, (a, b) in enumerate(
               [(a, b) for a in range(1, 21) for b in range(1, 6)])]
    df = spark.createDataFrame(het, "y long, x1 long, x2 long")
    r_het = ols2_breusch_pagan(df, "y", "x1", "x2").collect()[0]

    # homoscedastic: same noise, constant scale
    hom = [(1000 + 20 * a + 3 * b + noise(i) * 8, a, b)
           for i, (a, b) in enumerate(
               [(a, b) for a in range(1, 21) for b in range(1, 6)])]
    df2 = spark.createDataFrame(hom, "y long, x1 long, x2 long")
    r_hom = ols2_breusch_pagan(df2, "y", "x1", "x2").collect()[0]

    assert r_het.dof == 2 and r_hom.dof == 2
    assert r_het.bp > 10.0          # strongly heteroscedastic
    assert r_hom.bp < r_het.bp / 2  # clearly separated

    # numpy cross-check of the same two-stage recipe (unrounded
    # coefficients; agreement within the rounding slack)
    X = np.array([[1.0, a, b] for _, a, b in het])
    yv = np.array([float(y) for y, _, _ in het])
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    e2 = np.round(yv - X @ np.round(beta, 6)) ** 2
    g, *_ = np.linalg.lstsq(X, e2, rcond=None)
    pred = X @ np.round(g, 6)
    r2 = 1 - ((e2 - pred) ** 2).sum() / ((e2 - e2.mean()) ** 2).sum()
    assert abs(r_het.bp - len(het) * r2) < 0.05

    # singular design -> empty frame
    col = [(y, a, 2 * a) for y, a, _ in het]
    df3 = spark.createDataFrame(col, "y long, x1 long, x2 long")
    assert ols2_breusch_pagan(df3, "y", "x1", "x2").count() == 0


def test_kfold_assign_deterministic_and_balanced(spark):
    import pytest as _pytest

    from mms_rdf_spark.operators.mlops import kfold_assign, kfold_summary

    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(500)],
        "doc_id long, lang string")
    a = {r.id: r.fold for r in kfold_assign(docs, k=5).collect()}
    b = {r.id: r.fold for r in kfold_assign(docs, k=5).collect()}
    assert a == b                       # rerun-stable
    assert set(a.values()) == {0, 1, 2, 3, 4}
    sizes = [list(a.values()).count(f) for f in range(5)]
    assert min(sizes) > 50              # binomially balanced

    s = kfold_summary(docs, k=5).collect()
    assert sum(r.n_docs for r in s) == 500
    assert {(r.fold, r.stratum) for r in s} <= {
        (f, l) for f in range(5) for l in ("en", "de")}
    with _pytest.raises(ValueError, match="k >= 2"):
        kfold_assign(docs, k=1)


def test_spiegelhalter_z_calibrated_vs_not(spark):
    from mms_rdf_spark.operators.mlops import spiegelhalter_z

    # perfectly calibrated by construction: p of the y=1 fraction
    rows = []
    for p, block in [(0.2, 10), (0.5, 10), (0.8, 10)]:
        ones = int(p * block)
        rows += [(p, 1)] * ones + [(p, 0)] * (block - ones)
    df = spark.createDataFrame(rows, "prob double, y int")
    r = spiegelhalter_z(df).collect()[0]
    assert abs(r.z) < 1.0 and r.p_two > 0.3

    # badly miscalibrated: p=0.9 but y mostly 0
    bad = [(0.9, 0)] * 18 + [(0.9, 1)] * 2
    r = spiegelhalter_z(
        spark.createDataFrame(bad, "prob double, y int")).collect()[0]
    # hand: num = sum (y-p)(1-2p); den = sum (1-2p)^2 p(1-p)
    num = sum((y - 0.9) * (1 - 1.8) for _, y in bad)
    den = sum((1 - 1.8) ** 2 * 0.9 * 0.1 for _ in bad)
    assert abs(r.z - num / den ** 0.5) < 1e-5
    assert r.z > 4.0 and r.p_two < 1e-4

    # degenerate: all probs at 1/2 -> weight 0 -> NULL
    half = [(0.5, 1), (0.5, 0)]
    r = spiegelhalter_z(
        spark.createDataFrame(half, "prob double, y int")).collect()[0]
    assert r.z is None
    assert spiegelhalter_z(
        df.where("prob < 0")).count() == 0
