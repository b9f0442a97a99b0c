from __future__ import annotations

from pyspark.sql import functions as F

from mms_rdf_spark.operators.quality import (
    audit,
    check_not_null,
    check_range,
    check_ref_integrity,
    check_unique,
    profile,
)
from mms_rdf_spark.operators.skew import bloom_prejoin


def test_audit_counts_violations(spark):
    child = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, -1.0), (3, 99, None), (3, 10, 2.0)],
        "id long, fk long, v double")
    parent = spark.createDataFrame([(10,)], "pk long")
    rep = {r["check"]: r["violations"] for r in audit([
        check_unique(child, ["id"]),
        check_not_null(child, "v"),
        check_range(child, "v", 0.0, 100.0),
        check_ref_integrity(child, "fk", parent, "pk"),
    ]).collect()}
    assert rep == {"unique:id": 1, "not_null:v": 1,
                   "range:v": 1,       # -1.0 only; NULL not counted
                   "ref:fk": 1}        # fk=99 orphan


def test_audit_clean_table_all_zero(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    rep = audit([check_unique(df, ["id"]), check_not_null(df, "v"),
                 check_range(df, "v", 0.0, 10.0)]).collect()
    assert all(r["violations"] == 0 for r in rep)


def test_profile_one_pass_per_table(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "c")], "k long, s string")
    got = {r["column"]: (r["n_null"], r["n_distinct"], r["min_s"],
                         r["max_s"])
           for r in profile(df, ["k", "s"]).collect()}
    assert got["k"] == (0, 2, "1", "2")
    assert got["s"] == (1, 2, "a", "c")


def test_bloom_prejoin_never_drops_matches(spark):
    big = spark.createDataFrame([(i, i % 100) for i in range(1000)],
                                "id long, key long")
    small = spark.createDataFrame([(k,) for k in (3, 7, 42)], "key long")
    filtered = bloom_prejoin(big, small, "key")
    exact = filtered.join(small, on="key")
    want = big.join(small, on="key")
    assert exact.count() == want.count() == 30
    # the prefilter really filters (false-pass rate ~ load factor)
    assert filtered.count() < 1000


def test_bloom_prejoin_tiny_bitmap_still_correct(spark):
    # pathological 64-bit bloom: everything collides, nothing is lost
    big = spark.createDataFrame([(i, i) for i in range(50)],
                                "id long, key long")
    small = spark.createDataFrame([(7,), (13,)], "key long")
    filtered = bloom_prejoin(big, small, "key", n_bits=64)
    got = {r["key"] for r in filtered.join(small, on="key").collect()}
    assert got == {7, 13}


def test_bloom_prejoin_preserves_columns(spark):
    big = spark.createDataFrame([(1, 5, "x")], "id long, key long, p string")
    small = spark.createDataFrame([(5,)], "key long")
    out = bloom_prejoin(big, small, "key")
    assert set(out.columns) == {"id", "key", "p"}


def test_bloom_prejoin_plan_is_one_broadcast_join(spark):
    """The prefilter must not add a shuffle: the bitmap probes via a
    single broadcast hash join on the big side's scan."""
    big = spark.createDataFrame([(i, i % 10) for i in range(100)],
                                "id long, key long")
    small = spark.createDataFrame([(3,)], "key long")
    plan = bloom_prejoin(big, small, "key") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no exchange on the big side (only the bitmap build aggregates)
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_split_leakage_detects_cross_split_twins(spark):
    from mms_rdf_spark.operators.quality import split_leakage
    # many docs sharing a 3-token prefix: with ~98/1/1 hash splits at
    # n=400, at least one prefix family is guaranteed to straddle
    rows = [(i, f"shared prefix tokens tail{i}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    leaks = split_leakage(df).collect()
    assert len(leaks) == 1
    assert leaks[0]["n_docs"] == 400 and leaks[0]["n_splits"] >= 2


def test_split_leakage_clean_when_unique(spark):
    from mms_rdf_spark.operators.quality import split_leakage
    rows = [(i, f"u{i} v{i} w{i} x") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert split_leakage(df).count() == 0


def test_compression_ratio_signal(spark):
    from mms_rdf_spark.operators.quality import compression_ratio

    docs = spark.createDataFrame(
        [(0, "spam " * 200),                     # boilerplate
         (1, " ".join(f"w{i * 7919 % 1000}x{i}" for i in range(200))),
         (2, ""), (3, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in compression_ratio(docs).collect()}
    assert got[0].n_bytes == 1000
    # repetitive text compresses far better than varied text
    assert got[0].ratio < 0.1 < got[1].ratio
    assert got[1].ratio <= 1.0
    # n_compressed is a real zlib size, bounded and positive
    assert 0 < got[0].n_compressed < got[0].n_bytes
    # empty / NULL rows degrade to 0 bytes, NULL ratio
    assert got[2].n_bytes == 0 and got[2].ratio is None
    assert got[3].n_bytes == 0 and got[3].ratio is None
