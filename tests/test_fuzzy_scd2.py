from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mms_rdf_spark.operators.cdc import scd2_history
from mms_rdf_spark.operators.link import fuzzy_edit_pairs


def _ts(day):
    return dt.datetime(2024, 1, day)


def test_scd2_collapses_no_change_runs(spark):
    ch = spark.createDataFrame(
        [(1, "A", _ts(1), 1), (1, "A", _ts(2), 2), (1, "B", _ts(3), 3),
         (1, "B", _ts(4), 4), (1, "A", _ts(5), 5),
         (2, "X", _ts(1), 6)],
        "k long, status string, ts timestamp, oid long")
    rows = scd2_history(ch, "k", "status", tiebreak_col="oid").collect()
    got = {(r["k"], r["valid_from"]): (r["status"], r["valid_to"],
                                       r["is_current"])
           for r in rows}
    assert len(rows) == 4
    assert got[(1, _ts(1))] == ("A", _ts(3), False)
    assert got[(1, _ts(3))] == ("B", _ts(5), False)
    assert got[(1, _ts(5))] == ("A", None, True)
    assert got[(2, _ts(1))] == ("X", None, True)


def test_scd2_single_exchange(spark):
    ch = spark.createDataFrame(
        [(1, "A", _ts(1), 1)], "k long, status string, ts timestamp, "
                               "oid long")
    plan = scd2_history(ch, "k", "status", tiebreak_col="oid") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_fuzzy_edit_pairs_blocked_and_thresholded(spark):
    df = spark.createDataFrame(
        [(1, "small ring", "ring"), (2, "smal ring", "ring"),
         (3, "large ring", "ring"), (4, "small bolt", "bolt"),
         (5, "smalll bolt", "bolt")],
        "id long, name string, blk string")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in fuzzy_edit_pairs(df, "id", "name", "blk",
                                     max_dist=2).collect()}
    assert got[(1, 2)] == 1          # small/smal
    assert got[(4, 5)] == 1          # small/smalll
    assert (1, 3) not in got         # small->large dist 4
    assert (1, 4) not in got         # different block
    assert all(a < b for a, b in got)


def test_fuzzy_edit_pairs_max_block_drops_oversized(spark):
    df = spark.createDataFrame(
        [(i, f"x{i}", "hot") for i in range(10)]
        + [(100, "ab", "cold"), (101, "ac", "cold")],
        "id long, name string, blk string")
    got = fuzzy_edit_pairs(df, "id", "name", "blk", max_dist=2,
                           max_block=5).collect()
    # the 10-member hot block is dropped wholesale; cold survives
    assert {(r["id_a"], r["id_b"]) for r in got} == {(100, 101)}


def test_fuzzy_length_prefilter_semantics(spark):
    # |len diff| > max_dist can never be within edit distance; ensure
    # the pre-filter drops exactly those and nothing else
    df = spark.createDataFrame(
        [(1, "abc", "b"), (2, "abcdefgh", "b"), (3, "abcd", "b")],
        "id long, name string, blk string")
    got = {(r["id_a"], r["id_b"]) for r in
           fuzzy_edit_pairs(df, "id", "name", "blk", max_dist=2).collect()}
    assert got == {(1, 3)}
