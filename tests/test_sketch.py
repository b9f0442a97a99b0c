from __future__ import annotations

from pyspark.sql import functions as F

from mms_rdf_spark.operators.sketch import (
    kmv_distinct,
    kmv_jaccard,
    kmv_merge,
    kmv_sketch,
)


def test_exact_below_k(spark):
    df = spark.range(40).select(F.col("id").alias("v"))
    row = kmv_distinct(df, "v", k=64).collect()[0]
    assert row["k_used"] == 40
    assert row["est_distinct"] == 40.0


def test_estimator_within_tolerance(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    true = ev.select("event_id").distinct().count()
    row = kmv_distinct(ev, "event_id", k=256).collect()[0]
    assert row["k_used"] == 256
    # rel err ~ 1/sqrt(k-2) ~ 6%; allow 3 sigma
    assert abs(row["est_distinct"] - true) / true < 0.20, row


def test_sketch_is_mergeable(spark):
    """bottom-k(A u B) == merge(sketch(A), sketch(B)) — the property
    that lets per-partition/per-day sketches roll up."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    whole = {r["h"] for r in kmv_sketch(ev, "event_id", 64).collect()}
    merged = {r["h"] for r in kmv_merge(kmv_sketch(a, "event_id", 64),
                                        kmv_sketch(b, "event_id", 64),
                                        64).collect()}
    assert whole == merged


def test_jaccard_exact_on_small_sets(spark):
    a = spark.createDataFrame([(i,) for i in range(10)], "v long")
    b = spark.createDataFrame([(i,) for i in range(5, 15)], "v long")
    row = kmv_jaccard(a, b, "v", k=64).collect()[0]
    # |A n B| = 5, |A u B| = 15 -> exact below k
    assert row["k_used"] == 15 and row["n_both"] == 5
    assert abs(row["jaccard"] - 5 / 15) < 1e-4


def test_sketch_plans_as_top_k_not_full_sort(spark):
    """orderBy+limit must compile to TakeOrderedAndProject (per-task
    top-k + driver merge), not a global Sort exchange."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = kmv_sketch(ev, "event_id", 64) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_grouped_quantiles_exact_values(spark):
    from mms_rdf_spark.operators.sketch import grouped_quantiles

    rows = [("a", float(v)) for v in range(1, 101)] + [("b", 5.0)]
    df = spark.createDataFrame(rows, "k string, value double")
    got = {r["k"]: r for r in
           grouped_quantiles(df, "k", "value").collect()}
    # (n-1)*p linear interpolation over 1..100
    assert got["a"]["q50"] == 50.5
    assert got["a"]["q90"] == 90.1
    assert abs(got["a"]["q99"] - 99.01) < 1e-9
    assert got["b"]["q50"] == got["b"]["q99"] == 5.0


def test_kth_smallest_median_and_extremes(spark):
    from mms_rdf_spark.operators.sketch import kth_smallest
    vals = [float(v) for v in [5, 1, 9, 3, 7, 2, 8, 4, 6, 10]]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = kth_smallest(df, "v", q=0.5).collect()[0]
    assert (r["n"], r["k"], r["kth"]) == (10, 5, 5.0)
    assert kth_smallest(df, "v", q=0.1).collect()[0]["kth"] == 1.0
    assert kth_smallest(df, "v", q=1.0).collect()[0]["kth"] == 10.0


def test_kth_smallest_with_duplicates_and_few_bins(spark):
    from mms_rdf_spark.operators.sketch import kth_smallest
    df = spark.createDataFrame(
        [(float(v),) for v in [1, 1, 1, 2, 2, 3]], "v double")
    # few bins force multiple values per bin; still exact
    r = kth_smallest(df, "v", q=0.5, n_bins=2).collect()[0]
    assert (r["k"], r["kth"]) == (3, 1.0)
    assert kth_smallest(df, "v", q=0.99, n_bins=2) \
        .collect()[0]["kth"] == 3.0


def test_kth_smallest_degenerate_all_equal(spark):
    from mms_rdf_spark.operators.sketch import kth_smallest
    df = spark.createDataFrame([(7.0,)] * 5, "v double")
    assert kth_smallest(df, "v").collect()[0]["kth"] == 7.0


def test_approx_quantiles_certified_within_rank_bound(spark):
    """Every approximate percentile must certify within its rank-error
    bound against the exact data (the exact operator is the oracle for
    its approximate companion), and the approx output schema must be a
    drop-in for grouped_quantiles."""
    from mms_rdf_spark.operators.sketch import (approx_grouped_quantiles,
                                                grouped_quantiles,
                                                quantile_rank_certificate)

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    cert = quantile_rank_certificate(ev, "event_type", "value").collect()
    assert cert and all(r["ok"] for r in cert), cert
    a = approx_grouped_quantiles(ev, "event_type", "value")
    e = grouped_quantiles(ev, "event_type", "value")
    assert a.columns == e.columns
    # at accuracy=10000 and sf0.01 group sizes, rank error < 1 row:
    # approximate values are within the adjacent-value gap of exact
    ae = {r["event_type"]: r for r in a.collect()}
    for r in e.collect():
        for c in ("q50", "q90", "q99"):
            assert abs(ae[r["event_type"]][c] - r[c]) <= 2.0, (r, c)


def test_hll_certificate_bounds_and_flags(spark):
    """HLL estimate must sit within 4 sigma of exact (cert ok), and a
    zero-sigma cushion must flag any genuinely-approximate group —
    proving the certificate can actually fail."""
    from mms_rdf_spark.operators.sketch import (hll_certificate,
                                                hll_distinct)

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    assert all(r["ok"] for r in
               hll_certificate(ev, "event_type", "user_id").collect())
    # large single group: HLL leaves exact sparse mode and truly errs
    import pyspark.sql.functions as F
    big = spark.range(200_000).select(
        F.lit("g").alias("k"), F.col("id"))
    [c] = hll_certificate(big, "k", "id", rsd=0.05).collect()
    assert c["ok"] and c["n_exact"] == 200_000
    [a] = hll_distinct(big, "k", "id", rsd=0.05).collect()
    err = abs(a["n_approx"] - 200_000)
    assert 0 < err <= 4 * 0.05 * 200_000, err
    [tight] = hll_certificate(big, "k", "id", rsd=0.05,
                              sigmas=0.0).collect()
    assert not tight["ok"]  # nonzero error vs the floor-only cushion


def test_cms_overestimates_only_and_merges(spark):
    """Count-min guarantees: est >= true for EVERY value; the error is
    bounded by collisions (tight here: few values vs width); merging
    per-half sketches equals the whole-corpus sketch cell-for-cell."""
    import pyspark.sql.functions as F

    from mms_rdf_spark.operators.sketch import (cms_build, cms_estimate,
                                                cms_merge)

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    cms = cms_build(ev, "event_type")
    probes = ev.select("event_type").distinct()
    est = {r["value"]: r["est"] for r in
           cms_estimate(cms, probes, "event_type").collect()}
    true = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type").agg(F.count("*").alias("n"))
            .collect()}
    assert set(est) == set(true)
    for v, t in true.items():
        assert est[v] >= t, (v, est[v], t)
        assert est[v] - t <= 2 * sum(true.values()) / 1024, (v, est[v], t)
    # absent value estimates only collision mass (0 here)
    ghost = spark.createDataFrame([("nope",)], "event_type string")
    [g] = cms_estimate(cms, ghost, "event_type").collect()
    assert g["est"] == 0
    # mergeability: sketch(half1) + sketch(half2) == sketch(all)
    h1 = cms_build(ev.where(F.col("event_id") % 2 == 0), "event_type")
    h2 = cms_build(ev.where(F.col("event_id") % 2 == 1), "event_type")
    merged = sorted(map(tuple, cms_merge(h1, h2).collect()))
    whole = sorted(map(tuple, cms.collect()))
    assert merged == whole


def test_cms_params_recovered_and_mismatch_fails_loudly(spark):
    """Round-4 advice: estimate/merge derive (depth, width) from the
    sketch itself — a caller can no longer probe the wrong cells and
    silently under-estimate."""
    import pytest

    from mms_rdf_spark.operators.sketch import (cms_build, cms_estimate,
                                                cms_merge)
    ev = spark.createDataFrame(
        [(i, f"t{i % 3}") for i in range(30)], "event_id long, t string")
    small = cms_build(ev, "t", depth=3, width=64)
    probes = ev.select("t").distinct()
    # estimates use the sketch's own (3, 64) — overestimate-only holds
    est = {r.value: r.est for r in
           cms_estimate(small, probes, "t").collect()}
    assert all(est[f"t{k}"] >= 10 for k in range(3))
    # explicit params validated against the sketch
    with pytest.raises(ValueError, match="depth"):
        cms_estimate(small, probes, "t", depth=4)
    with pytest.raises(ValueError, match="width"):
        cms_estimate(small, probes, "t", width=1024)
    # merging different widths is incomparable -> loud failure
    other = cms_build(ev, "t", depth=3, width=128)
    with pytest.raises(ValueError, match="widths"):
        cms_merge(small, other)


def test_mg_guarantee_on_skewed_stream(spark):
    from mms_rdf_spark.operators.sketch import (
        mg_certificate, mg_heavy_hitters)

    # zipf-ish: item i has ~N/i occurrences; k=8 guarantees items
    # with count > n/9
    rows = []
    for i in range(1, 40):
        rows += [(f"item{i}",)] * (2000 // i)
    df = spark.createDataFrame(rows, "v string").repartition(8)
    hh = {r.item: r.est_count
          for r in mg_heavy_hitters(df, "v", k=8).collect()}
    n = len(rows)
    from collections import Counter
    exact = Counter(v for (v,) in rows)
    for item, c in exact.items():
        if c > n / 9:
            assert item in hh, item
    for item, est in hh.items():
        assert exact[item] - n / 9 <= est <= exact[item], item
    cert = mg_certificate(df, "v", k=8).collect()[0]
    assert cert.ok and cert.n == n and cert.n_guaranteed >= 1


def test_mg_fewer_items_than_k_is_exact(spark):
    from mms_rdf_spark.operators.sketch import mg_heavy_hitters

    rows = [("a",)] * 5 + [("b",)] * 3
    df = spark.createDataFrame(rows, "v string").repartition(3)
    got = {r.item: r.est_count
           for r in mg_heavy_hitters(df, "v", k=8).collect()}
    assert got == {"a": 5, "b": 3}  # no overflow ever -> exact


def test_mg_empty(spark):
    from mms_rdf_spark.operators.sketch import (
        mg_certificate, mg_heavy_hitters)

    df = spark.createDataFrame([], "v string")
    assert mg_heavy_hitters(df, "v", k=4).count() == 0
    assert mg_certificate(df, "v", k=4).collect()[0].ok


def test_ams_f2_unbiased_mergeable_and_sane(spark):
    from pyspark.sql import functions as F

    from mms_rdf_spark.operators.sketch import ams_f2, ams_f2_estimate

    # single value, count 3: every seed's sketch is +-3, est = 9 = F2
    one = spark.createDataFrame([(7,)] * 3, "v long")
    rows = ams_f2(one, "v", seeds=5).collect()
    assert len(rows) == 5
    assert all(abs(r["sketch"]) == 3 and r["est"] == 9 for r in rows)
    assert ams_f2_estimate(ams_f2(one, "v", seeds=5)) \
        .collect()[0]["f2_est"] == 9

    # mergeability: per-seed sketches over two halves sum to the
    # whole-table sketch (then est re-derives)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    whole = {r["seed"]: r["sketch"]
             for r in ams_f2(ev, "user_id").collect()}
    pa = {r["seed"]: r["sketch"] for r in ams_f2(a, "user_id").collect()}
    pb = {r["seed"]: r["sketch"] for r in ams_f2(b, "user_id").collect()}
    assert whole == {s: pa.get(s, 0) + pb.get(s, 0) for s in whole}

    # the median estimate lands within a small factor of the exact
    # self-join size on real data (fixed data + fixed seeds ->
    # deterministic pass; the 2F2^2 variance bound makes 4x generous)
    exact = (ev.groupBy("user_id").count()
             .agg(F.sum(F.col("count") * F.col("count"))
                  .cast("long").alias("f2")).collect()[0]["f2"])
    est = ams_f2_estimate(ams_f2(ev, "user_id")) \
        .collect()[0]["f2_est"]
    assert exact / 4 <= est <= exact * 4, (est, exact)

    # empty input -> empty sketch and empty estimate
    e = spark.createDataFrame([], "v long")
    assert ams_f2(e, "v").count() == 0
    assert ams_f2_estimate(ams_f2(e, "v")).count() == 0


def test_cms_join_size_guarantees_and_zero_row(spark):
    from pyspark.sql import functions as F

    from mms_rdf_spark.operators.sketch import cms_build, cms_join_size

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    half_a = ev.where(F.col("event_id") % 2 == 0)
    half_b = ev.where(F.col("event_id") % 2 == 1)
    sa = cms_build(half_a, "user_id")
    sb = cms_build(half_b, "user_id")
    est = cms_join_size(sa, sb).collect()[0]["est"]
    exact = (half_a.groupBy("user_id").count()
             .withColumnRenamed("count", "na")
             .join(half_b.groupBy("user_id").count()
                   .withColumnRenamed("count", "nb"), on="user_id")
             .agg(F.sum(F.col("na") * F.col("nb")).cast("long")
                  .alias("j")).collect()[0]["j"])
    tot = half_a.count() * half_b.count()
    assert exact <= est <= tot, (exact, est, tot)

    # disjoint value sets: the true min-inner-product can be 0 and a
    # depth row with no shared cells must still count (width huge so
    # collisions are unlikely but the 0-row rule is what's pinned)
    xa = spark.createDataFrame([(f"a{i}",) for i in range(4)],
                               "v string")
    xb = spark.createDataFrame([(f"b{i}",) for i in range(4)],
                               "v string")
    est0 = cms_join_size(cms_build(xa, "v", width=65536),
                         cms_build(xb, "v", width=65536)) \
        .collect()[0]["est"]
    assert est0 == 0

    # shape mismatch fails loudly
    import pytest as _pt
    with _pt.raises(ValueError):
        cms_join_size(cms_build(xa, "v", width=512),
                      cms_build(xb, "v", width=1024))
