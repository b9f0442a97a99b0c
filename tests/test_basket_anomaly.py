from __future__ import annotations

import math

from mms_rdf_spark.operators.analytics import (
    grouped_ntiles,
    grouped_zscore_outliers,
)
from mms_rdf_spark.operators.basket import cooccurrence_similarity


def test_zscore_flags_only_outliers(spark):
    rows = [(i, "a", 10.0) for i in range(20)] + [(99, "a", 1000.0)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = grouped_zscore_outliers(df, "grp", "v", "id").collect()
    assert [r["id"] for r in got] == [99]
    # hand-check the z value from exact integer sums
    n, s1, s2 = 21, 20 * 1000 + 100000, 20 * 1000**2 + 100000**2
    mean = s1 / n
    std = math.sqrt(s2 / n - mean * mean)
    assert abs(got[0]["z"] - round((100000 - mean) / std, 4)) < 1e-9


def test_zscore_zero_variance_group_silent(spark):
    df = spark.createDataFrame([(1, "a", 5.0), (2, "a", 5.0)],
                               "id long, grp string, v double")
    assert grouped_zscore_outliers(df, "grp", "v", "id").count() == 0


def test_zscore_no_fact_table_shuffle(spark):
    df = spark.createDataFrame([(1, "a", 5.0)],
                               "id long, grp string, v double")
    plan = grouped_zscore_outliers(df, "grp", "v", "id") \
        ._jdf.queryExecution().executedPlan().toString()
    # only the tiny stats aggregate exchanges; fact side joins broadcast
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_ntiles_and_percent_rank(spark):
    rows = [(i, "g", float(i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = {r["id"]: (r["tile"], r["pct_rank"])
           for r in grouped_ntiles(df, "grp", "v", "id", n=5).collect()}
    assert got[1] == (1, 0.0)
    assert got[10] == (5, 1.0)
    assert got[5][0] == 3  # 10 rows / 5 tiles -> 2 per tile
    assert abs(got[5][1] - round(4 / 9, 6)) < 1e-9


def test_cooccurrence_cosine(spark):
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"),
            (3, "z")]  # dup item in basket 3 collapses
    df = spark.createDataFrame(rows, "bk long, item string")
    got = {(r["item_a"], r["item_b"]): (r["n_ab"], r["cosine"])
           for r in cooccurrence_similarity(df, "bk", "item").collect()}
    # x in 3 baskets, y in 2, z in 1; xy together twice
    assert got[("x", "y")] == (2, round(2 / math.sqrt(6), 6))
    assert got[("x", "z")] == (1, round(1 / math.sqrt(3), 6))
    assert ("y", "z") not in got


def test_cooccurrence_max_basket_drops(spark):
    rows = ([(1, f"i{k}") for k in range(8)]      # oversized basket
            + [(2, "a"), (2, "b")])
    df = spark.createDataFrame(rows, "bk long, item string")
    got = cooccurrence_similarity(df, "bk", "item", max_basket=5).collect()
    assert {(r["item_a"], r["item_b"]) for r in got} == {("a", "b")}
    # and totals are computed AFTER the drop: cosine is 1.0, not diluted
    assert got[0]["cosine"] == 1.0


def test_association_rules_metrics(spark):
    # 4 baskets: {x,y} x2, {x} x1, {z} x1
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (4, "z")]
    df = spark.createDataFrame(rows, "bk long, item string")
    got = {(r["antecedent"], r["consequent"]):
           (r["n_ab"], r["support"], r["confidence"], r["lift"])
           for r in cooccurrence_rules(df)}
    assert got[("x", "y")] == (2, 0.5, round(2 / 3, 6),
                               round(4 * 2 / (3 * 2), 6))
    assert got[("y", "x")] == (2, 0.5, 1.0, round(8 / 6, 6))


def cooccurrence_rules(df):
    from mms_rdf_spark.operators.basket import association_rules
    return association_rules(df, "bk", "item", min_pairs=1).collect()


def test_containment_directional(spark):
    from mms_rdf_spark.operators.dedup import containment_pairs
    # doc 2 is doc 1 plus extra text: 1 is CONTAINED in 2 (high
    # containment 1->2), but 2 is not contained in 1
    base = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, base), (2, base + " iota kappa lambda mu nu xi"),
         (3, "completely different words here with no overlap at all")],
        "doc_id long, text string")
    got = {(r["a_id"], r["b_id"]): r["containment"]
           for r in containment_pairs(df, threshold=0.5).collect()}
    assert got[(1, 2)] == 1.0
    assert (2, 1) not in got      # reverse direction diluted below 0.5
    assert not any(3 in p for p in got)


def test_containment_stopgram_cap_drops_hot_grams(spark):
    from mms_rdf_spark.operators.dedup import containment_pairs
    # the same boilerplate in every doc: with max_df below the corpus
    # size the boilerplate grams vanish and no pairs remain
    rows = [(i, "common boiler plate text across all docs " + str(i))
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert containment_pairs(df, threshold=0.3, max_df=5).count() == 0


def test_allpairs_cosine_matches_brute_force(spark):
    """The prefix filter must be LOSSLESS: compare against the
    quadratic join on the real synth corpus at two thresholds."""
    from pyspark.sql import functions as F

    from mms_rdf_spark.operators.dedup import (_tokens,
                                               allpairs_cosine_pairs)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(
        F.col("doc_id").alias("d"),
        F.explode(F.array_distinct(_tokens(F.col("text"))))
        .alias("tok"))
    sz = toks.groupBy("d").agg(F.count(F.lit(1)).alias("sz"))
    a = toks.withColumnRenamed("d", "a_id")
    b = toks.withColumnRenamed("d", "b_id")
    ov = (a.join(b, (a["tok"] == b["tok"])
                 & (F.col("a_id") < F.col("b_id")))
          .groupBy("a_id", "b_id").agg(F.count(F.lit(1)).alias("ov"))
          .join(sz.withColumnsRenamed({"d": "a_id", "sz": "a_sz"}),
                "a_id")
          .join(sz.withColumnsRenamed({"d": "b_id", "sz": "b_sz"}),
                "b_id")).cache()
    for t in (0.6, 0.85):
        T2 = int(round(t * t * 1e12))
        exp = {(r["a_id"], r["b_id"], r["ov"]) for r in ov.where(
            F.col("ov") * F.col("ov") * F.lit(10**12)
            >= F.lit(T2) * F.col("a_sz") * F.col("b_sz")).collect()}
        got = {(r["a_id"], r["b_id"], r["overlap"])
               for r in allpairs_cosine_pairs(docs, threshold=t)
               .collect()}
        assert got == exp and len(got) > 0, (t, len(got), len(exp))


def test_allpairs_prefix_actually_prunes(spark):
    """The candidate join must touch fewer (doc, token) rows than the
    full token table — i.e. the prefix really truncates. Two docs
    sharing only their rarest token ARE found (the prefix holds rare
    tokens); two docs sharing only hot tokens below threshold are
    not emitted."""
    from mms_rdf_spark.operators.dedup import allpairs_cosine_pairs

    rows = [(1, "rare1 a b c d e f g h"),
            (2, "rare1 p q r s t u v w"),
            (3, "a b c d e f g h p"),
            (4, "a b c d e f g h p")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {(r["a_id"], r["b_id"]): r["cosine"]
           for r in allpairs_cosine_pairs(df, threshold=0.95)
           .collect()}
    # 3/4 identical -> cosine 1.0; nothing else reaches 0.95
    assert got == {(3, 4): 1.0}
    # drop to 0.1: the (1,2) pair (shared rarest token only) appears
    low = {(r["a_id"], r["b_id"]) for r in
           allpairs_cosine_pairs(df, threshold=0.1).collect()}
    assert (1, 2) in low
