"""Distributed prefix sum + nucleus vocabulary."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_global_cumsum_matches_single_window(spark):
    from pyspark.sql.window import Window

    from mms_rdf_spark.operators.prefix import global_cumsum

    rows = [(f"k{i:03d}", (i * 37) % 19, (i * 7) % 11 + 1)
            for i in range(500)]
    df = spark.createDataFrame(rows, "id string, o int, v long")
    got = global_cumsum(df, "o", "id", "v") \
        .orderBy("o", "id").toPandas()
    w = (Window.orderBy("o", "id")
         .rowsBetween(Window.unboundedPreceding, 0))
    ref = df.withColumn("cum", F.sum("v").over(w)) \
        .orderBy("o", "id").toPandas()
    assert got[["id", "cum"]].equals(ref[["id", "cum"]])


def test_global_cumsum_no_single_partition_window(spark):
    from mms_rdf_spark.operators.prefix import global_cumsum

    df = spark.createDataFrame(
        [(f"k{i}", i, 1) for i in range(100)], "id string, o int, v long")
    plan = global_cumsum(df, "o", "id", "v") \
        ._jdf.queryExecution().executedPlan().toString()
    # range repartition + per-partition windows; never SinglePartition
    # feeding a Window
    assert "rangepartitioning" in plan.lower()
    assert "Exchange SinglePartition" not in plan


def test_nucleus_vocab_smallest_covering_prefix(spark):
    from mms_rdf_spark.operators.prefix import nucleus_vocab

    # counts: a=50, b=30, c=15, d=5 (total 100). p=0.8 -> a,b needed
    # (80 exactly: mass before b is 50 < 80; mass before c is 80,
    # NOT < 80 -> c excluded)
    text = " ".join(["a"] * 50 + ["b"] * 30 + ["c"] * 15 + ["d"] * 5)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = {r.token: (r.n, r.cum)
           for r in nucleus_vocab(docs, p=0.8).collect()}
    assert got == {"a": (50, 50), "b": (30, 80)}
    # p=0.81 pulls in c
    got2 = set(r.token for r in nucleus_vocab(docs, p=0.81).collect())
    assert got2 == {"a", "b", "c"}


def test_oov_rate_against_nucleus(spark):
    from mms_rdf_spark.operators.prefix import oov_rate

    # corpus totals: a=81, b=16, c=5 (102). p=0.8 -> threshold 81.6:
    # mass before a (0) and before b (81) both < 81.6 -> nucleus {a,b};
    # mass before c (97) excluded
    docs = spark.createDataFrame(
        [(0, " ".join(["a"] * 80)),
         (1, " ".join(["b"] * 15 + ["c"] * 5)),
         (2, "a b"),
         (3, "")],
        "doc_id long, text string")
    out = {r.doc_id: (r.n_tokens, r.oov_rate)
           for r in oov_rate(docs, p=0.8).collect()}
    assert out[0] == (80, 0.0)
    assert out[1] == (20, 0.25)  # only the c tokens are OOV
    assert out[2] == (2, 0.0)
    assert out[3] == (0, 0.0)    # empty doc present, rate 0
