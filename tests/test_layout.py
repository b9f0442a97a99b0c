from __future__ import annotations

from pyspark.sql import functions as F

from mms_rdf_spark.operators.layout import cluster_by_zorder, zorder_key


def test_interleave_known_values(spark):
    # domain 0..3 with bits=2 -> bucket == raw value, so zkey is the
    # plain Morton number: z(a,b) with a's bits at odd positions
    rows = [(i, a, b) for i, (a, b) in enumerate(
        [(0, 0), (0, 1), (1, 0), (1, 1), (3, 1), (0, 3), (3, 3)])]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {(r["a"], r["b"]): r["zkey"]
           for r in zorder_key(df, "a", "b", bits=2).collect()}
    assert got[(0, 0)] == 0
    assert got[(0, 1)] == 1    # b bit 0 -> position 0
    assert got[(1, 0)] == 2    # a bit 0 -> position 1
    assert got[(1, 1)] == 3
    assert got[(3, 1)] == 11   # a=0b11 -> 0b1010, b=0b01 -> 0b0001
    assert got[(0, 3)] == 5    # b=0b11 -> 0b0101
    assert got[(3, 3)] == 15


def test_constant_column_guard(spark):
    df = spark.createDataFrame([(1, 7, 5), (2, 7, 9)],
                               "id long, a long, b long")
    out = zorder_key(df, "a", "b", bits=4).collect()
    assert all(r["zkey"] >= 0 for r in out)  # no div-by-zero


def test_zorder_clusters_both_dimensions(spark):
    """The layout claim itself: after range-partitioning by zkey, the
    per-partition extent of BOTH dimensions shrinks vs ordering by one
    column (which leaves the other dimension's extent at full width).
    Tight per-file min/max on every z-ordered column is exactly what
    makes multi-dim predicate pruning work."""
    n = 32
    rows = [(i, i % n, i // n) for i in range(n * n)]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    def mean_extent(clustered, col):
        ext = (clustered
               .withColumn("p", F.spark_partition_id())
               .groupBy("p").agg((F.max(col) - F.min(col)).alias("e")))
        return ext.agg(F.avg("e")).collect()[0][0]

    z = cluster_by_zorder(df, "x", "y", bits=5, num_partitions=16)
    linear = df.repartitionByRange(16, "x")
    # linear layout: x tight but y spans the full 0..31 domain
    assert mean_extent(linear, "y") > 28
    # z-order: BOTH dimensions' extents collapse to ~a quadrant
    assert mean_extent(z, "x") <= 16
    assert mean_extent(z, "y") <= 16


def test_zkey_is_pure_expressions(spark):
    """No UDF/Python eval, and the corpus side never shuffles: the only
    exchanges are the single-row bounds aggregate (SinglePartition) and
    its broadcast back — the zkey itself is one JVM projection."""
    df = spark.createDataFrame([(1, 2, 3)], "id long, a long, b long")
    plan = zorder_key(df, "a", "b") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan, plan
    assert "shiftleft" in plan  # interleave stayed a column expression
    # corpus-side shuffle would appear as a hashpartitioning exchange
    assert "hashpartitioning" not in plan, plan


# ---- Hilbert curve


def _hilbert_py(x, y, bits):
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_python_twin(spark):
    from mms_rdf_spark.operators.layout import hilbert_key
    n = 8  # bits=3 -> bucket == raw value on the 0..7 domain
    rows = [(i, i % n, i // n) for i in range(n * n)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {(r["x"], r["y"]): r["hkey"]
           for r in hilbert_key(df, "x", "y", bits=3).collect()}
    assert got == {(x, y): _hilbert_py(x, y, 3)
                   for x in range(n) for y in range(n)}


def test_hilbert_consecutive_cells_are_adjacent(spark):
    """The property Morton lacks: walking the curve never jumps —
    consecutive keys differ by one step in exactly one dimension."""
    from mms_rdf_spark.operators.layout import hilbert_key
    n = 8
    rows = [(i, i % n, i // n) for i in range(n * n)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    inv = {r["hkey"]: (r["x"], r["y"])
           for r in hilbert_key(df, "x", "y", bits=3).collect()}
    assert sorted(inv) == list(range(n * n))  # a bijection
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_clusters_both_dimensions(spark):
    from mms_rdf_spark.operators.layout import cluster_by_hilbert
    n = 32
    rows = [(i, i % n, i // n) for i in range(n * n)]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    def mean_extent(clustered, col):
        ext = (clustered
               .withColumn("p", F.spark_partition_id())
               .groupBy("p").agg((F.max(col) - F.min(col)).alias("e")))
        return ext.agg(F.avg("e")).collect()[0][0]

    h = cluster_by_hilbert(df, "x", "y", bits=5, num_partitions=16)
    assert mean_extent(h, "x") <= 16
    assert mean_extent(h, "y") <= 16


def test_hilbert_constant_column_guard(spark):
    from mms_rdf_spark.operators.layout import hilbert_key
    df = spark.createDataFrame([(1, 7, 5), (2, 7, 9)],
                               "id long, a long, b long")
    out = hilbert_key(df, "a", "b", bits=4).collect()
    assert all(r["hkey"] >= 0 for r in out)
