from __future__ import annotations

import math

from mms_rdf_spark.operators.analytics import kaplan_meier, psi_drift


def test_km_textbook_curve(spark):
    # classic toy: deaths at t=1 (1 of 5), t=3 (2 of 3); censored at 2, 5
    rows = [(1, 1), (2, 0), (3, 1), (3, 1), (5, 0)]
    df = spark.createDataFrame(rows, "duration long, event long")
    got = {r["t"]: (r["n_at_risk"], r["d"], r["survival"])
           for r in kaplan_meier(df).collect()}
    assert got[1][:2] == (5, 1)
    assert got[2][:2] == (4, 0)
    assert got[3][:2] == (3, 2)

    def mu(x):
        return round(round(math.log(x), 6) * 1e6)

    s1 = round(math.exp(mu(1 - 1 / 5) / 1e6), 6)
    s3 = round(math.exp((mu(1 - 1 / 5) + mu(1 - 2 / 3)) / 1e6), 6)
    assert got[1][2] == s1
    assert got[2][2] == s1          # censoring doesn't move S
    assert got[3][2] == s3
    assert got[5][2] == s3


def test_km_risk_set_exhausted_goes_to_zero(spark):
    rows = [(1, 1), (2, 1)]  # last subject dies at t=2: d == n
    df = spark.createDataFrame(rows, "duration long, event long")
    got = {r["t"]: r["survival"] for r in kaplan_meier(df).collect()}
    assert got[2] == 0.0


def test_psi_identical_distributions_near_zero(spark):
    a = spark.createDataFrame([(float(i % 10),) for i in range(1000)],
                              "v double")
    out = psi_drift(a, a, "v", lo=0.0, hi=10.0, n_bins=10).collect()
    assert len(out) == 10
    assert all(r["term"] == 0.0 for r in out)
    assert all(abs(r["p"] - 0.1) < 0.01 for r in out)


def test_psi_shifted_distribution_positive(spark):
    a = spark.createDataFrame([(float(i % 5),) for i in range(1000)],
                              "v double")
    b = spark.createDataFrame([(5.0 + i % 5,) for i in range(1000)],
                              "v double")
    out = psi_drift(a, b, "v", lo=0.0, hi=10.0, n_bins=10).collect()
    total = sum(r["term"] for r in out)
    assert total > 0.2  # major drift


def test_psi_clamps_out_of_range(spark):
    a = spark.createDataFrame([(-5.0,), (50.0,)], "v double")
    out = {r["bin"]: r["p"] for r in
           psi_drift(a, a, "v", lo=0.0, hi=10.0, n_bins=5).collect()}
    # both rows land in edge bins, none dropped
    assert out[0] > 0.1 and out[4] > 0.1


def test_ks_identical_samples_zero(spark):
    from mms_rdf_spark.operators.analytics import ks_statistic
    a = spark.createDataFrame([(float(i % 7),) for i in range(70)],
                              "v double")
    r = ks_statistic(a, a, "v").collect()[0]
    assert r["ks"] == 0.0 and r["n_a"] == r["n_b"] == 70


def test_ks_disjoint_supports_is_one(spark):
    from mms_rdf_spark.operators.analytics import ks_statistic
    a = spark.createDataFrame([(float(i),) for i in range(5)], "v double")
    b = spark.createDataFrame([(100.0 + i,) for i in range(5)], "v double")
    assert ks_statistic(a, b, "v").collect()[0]["ks"] == 1.0


def test_ks_hand_computed_with_ties(spark):
    from mms_rdf_spark.operators.analytics import ks_statistic
    # a = {1,1,2}, b = {1,3,3}: after v=1 F_a=2/3, F_b=1/3 (gap 1/3);
    # after v=2 F_a=1, F_b=1/3 (gap 2/3); after v=3 gap 0
    a = spark.createDataFrame([(1.0,), (1.0,), (2.0,)], "v double")
    b = spark.createDataFrame([(1.0,), (3.0,), (3.0,)], "v double")
    assert ks_statistic(a, b, "v").collect()[0]["ks"] == round(2 / 3, 6)


def test_mann_whitney_separated_and_overlapping(spark):
    from mms_rdf_spark.operators.analytics import mann_whitney_auc
    lo = spark.createDataFrame([(float(i),) for i in range(5)], "v double")
    hi = spark.createDataFrame([(10.0 + i,) for i in range(5)], "v double")
    assert mann_whitney_auc(hi, lo, "v").collect()[0]["auc"] == 1.0
    assert mann_whitney_auc(lo, hi, "v").collect()[0]["auc"] == 0.0
    same = mann_whitney_auc(lo, lo, "v").collect()[0]
    assert same["auc"] == 0.5  # ties split evenly


def test_mann_whitney_hand_computed(spark):
    from mms_rdf_spark.operators.analytics import mann_whitney_auc
    # a={1,3}, b={2,3}: pairs (1>2)no (1>3)no (3>2)yes (3=3)tie
    # U = 1 + 0.5 = 1.5 of 4 -> auc 0.375
    a = spark.createDataFrame([(1.0,), (3.0,)], "v double")
    b = spark.createDataFrame([(2.0,), (3.0,)], "v double")
    assert mann_whitney_auc(a, b, "v").collect()[0]["auc"] == 0.375
