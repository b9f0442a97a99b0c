"""PageRank loop-plan contracts: the round-5 iterative-graph
restructure (static degree pre-joined onto edges, dangler set
precomputed, partition-preserving checkpoints, optional long-id
dictionary encoding) must keep results row-identical AND pin the
minimal per-iteration plan — one exchange (the dst aggregate), zero
exchanges on the E-row edge join."""

from __future__ import annotations

from pyspark.sql import functions as F


def _edges(spark):
    return spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
         ("e", "f"), ("f", "e"), ("c", "g")],
        "src string, dst string")


def test_pagerank_encode_row_identical(spark):
    from mms_rdf_spark.operators.pagerank import pagerank

    e = _edges(spark)
    plain = sorted(map(tuple, pagerank(e, iters=4).collect()))
    enc = sorted(map(tuple, pagerank(e, iters=4, encode=True).collect()))
    assert plain == enc


def test_partitioned_checkpoint_preserves_partitioning(spark):
    from mms_rdf_spark.operators.pagerank import partitioned_checkpoint

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = partitioned_checkpoint(
            spark.range(1000).select(
                (F.col("id") % 97).cast("string").alias("k"),
                F.col("id").alias("v")).repartition(16, "k"))
        b = partitioned_checkpoint(
            spark.range(500).select(
                (F.col("id") % 97).cast("string").alias("k2"),
                F.col("id").alias("w")).repartition(16, "k2"))
        j = a.join(b, a["k"] == b["k2"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan
        # and a PLAIN localCheckpoint under AQE loses it (the hazard
        # partitioned_checkpoint exists for) — if this ever starts
        # passing with 0, Spark fixed the capture and the helper can go
        c = (spark.range(500).select(
            (F.col("id") % 97).cast("string").alias("k3"),
            F.col("id").alias("x")).repartition(16, "k3")
            .localCheckpoint())
        j2 = a.join(c, a["k"] == c["k3"])
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert plan2.count("Exchange") >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_pagerank_iteration_single_exchange(spark):
    """The per-iteration contrib plan: zero exchanges on the edge join
    (both sides carry checkpointed hash partitioning), exactly one for
    the dst-keyed aggregate."""
    from mms_rdf_spark.operators.pagerank import (
        _shuffle_partitions,
        _with_degree,
        partitioned_checkpoint,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        e = spark.range(10000).select(
            (F.col("id") % 500).cast("string").alias("src"),
            ((F.col("id") * 7) % 500).cast("string").alias("dst")) \
            .localCheckpoint()
        p = _shuffle_partitions(e)
        ed, deg = _with_degree(e, p)
        nodes = partitioned_checkpoint(
            (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct()).repartition(p, "node"))
        nn = nodes.agg(F.count(F.lit(1)).alias("n"))
        ranks = partitioned_checkpoint(
            nodes.crossJoin(F.broadcast(nn))
            .select("node",
                    F.round(F.lit(1.0) / F.col("n"), 8).alias("r")))
        contrib = (ranks.join(ed, ranks["node"] == ed["src"])
                   .select("dst",
                           (F.col("r") / F.col("d")).alias("_c"))
                   .groupBy("dst").agg(F.sum("_c").alias("c")))
        plan = contrib._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cc_loop_edge_join_exchange_free(spark):
    """connected_components' per-round hash-min body: the E-row
    symmetric edge table joins the label frame with zero exchanges
    (both sides carry checkpointed co-partitioning on b); only the
    min-aggregate shuffles."""
    from mms_rdf_spark.operators.pagerank import (
        _shuffle_partitions,
        partitioned_checkpoint,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        e = spark.range(10000).select(
            (F.col("id") % 500).cast("string").alias("a"),
            ((F.col("id") * 7) % 500).cast("string").alias("b"))
        p = _shuffle_partitions(e)
        sym = partitioned_checkpoint(e.repartition(p, "b"))
        labels = partitioned_checkpoint(
            sym.select(F.col("a").alias("node")).distinct()
            .repartition(p, "node")) \
            .withColumn("component", F.col("node"))
        nbr = (sym.join(labels, sym["b"] == labels["node"])
               .groupBy(F.col("a").alias("node"))
               .agg(F.min("component").alias("nbr_component")))
        plan = nbr._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cc_distributed_matches_driver_after_restructure(spark):
    from mms_rdf_spark.operators.cc import connected_components

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f"), ("g", "h"),
         ("h", "i"), ("i", "g")],
        "src string, dst string")
    drv = sorted(map(tuple,
                     connected_components(e).collect()))
    dist = sorted(map(tuple,
                      connected_components(e, driver_threshold=0)
                      .collect()))
    assert drv == dist
    enc = sorted(map(tuple,
                     connected_components(e, driver_threshold=0,
                                          encode=True).collect()))
    assert drv == enc


def test_personalized_pagerank_unchanged_values(spark):
    """Restructure must not move values: hand-checkable 3-node chain
    seeded at its head."""
    from mms_rdf_spark.operators.pagerank import personalized_pagerank

    e = spark.createDataFrame([("a", "b"), ("b", "c")],
                              "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.rank
           for r in personalized_pagerank(e, seeds, iters=2).collect()}
    # r0=(1,0,0); iter1: a=0.15, b=0.85, c=0; iter2: a=0.15,
    # b=0.85*0.15, c=0.85*0.85 — mass piles at the chain sink
    assert got == {"a": 0.15, "b": 0.1275, "c": 0.7225}


def test_simrank_pair_join_reuses_static_edge_partitioning(spark):
    """SimRank's per-round first join (pairs x out-edges) must plan
    ZERO exchanges: the pair frame is repartitioned on its first key
    and the static e1 frame carries its checkpointed hash
    partitioning — only the fan-out pin and the (a, b) aggregate may
    shuffle per round."""
    from mms_rdf_spark.operators.pagerank import (
        _shuffle_partitions,
        partitioned_checkpoint,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        e = spark.range(5000).select(
            (F.col("id") % 300).cast("string").alias("src"),
            ((F.col("id") * 13) % 300).cast("string").alias("dst")) \
            .distinct().localCheckpoint()
        p = _shuffle_partitions(e)
        e1 = partitioned_checkpoint(
            e.select(F.col("src").alias("_u"), F.col("dst").alias("_a"))
            .repartition(p, "_u"))
        nodes = partitioned_checkpoint(
            (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct()).repartition(p, "node"))
        # the LAZY duplicate-alias projection (simrank's diag seed):
        # checkpointing it instead would canonicalize the captured
        # partitioning onto hash(b) and re-exchange this join
        s = nodes.select(F.col("node").alias("a"),
                         F.col("node").alias("b"),
                         F.lit(1.0).alias("s"))
        j = s.join(e1, s["a"] == F.col("_u"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
