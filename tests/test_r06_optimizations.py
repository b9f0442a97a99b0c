"""Round-6 optimization pins: task-layout changes must be
result-invariant.

Each test compares an optimized path against its reference
formulation on a fixture built to exercise the optimized branch
(wide LSH buckets for the triangle decomposition; a small graph with
dangling nodes and multi-edges for the pagerank driver fold).
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mms_rdf_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-r06-opt", cores=4, shuffle_partitions=8)
    yield s


def test_triangle_decomposition_pairs_identical(spark):
    # one boilerplate bucket far wider than parallel_bucket, plus
    # healthy buckets: the decomposed join must emit EXACTLY the
    # plain self-join's pair set (lossless, only task layout changes)
    from mms_rdf_spark.operators.dedup import capped_bucket_pairs

    rows = (
        # hot bucket: 50 ids share (band 0, key "hot")
        [(i, 0, "hot") for i in range(50)]
        # healthy buckets
        + [(100 + i, 0, f"k{i % 3}") for i in range(12)]
        + [(200 + i, 1, "other") for i in range(5)]
    )
    banded = spark.createDataFrame(rows, "doc_id long, band int, key string")
    got = capped_bucket_pairs(banded, max_bucket=None, parallel_bucket=8)
    ref = capped_bucket_pairs(banded, max_bucket=None, parallel_bucket=None)
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0
    # sanity: the hot bucket really decomposed into >1 group
    assert got.count() == ref.count() > 50 * 49 / 2 - 1


def test_triangle_decomposition_with_salting(spark):
    # buckets wider than max_bucket are salted AND decomposed; the
    # pair set must equal the salted-but-undecomposed reference
    from mms_rdf_spark.operators.dedup import capped_bucket_pairs

    rows = [(i, 0, "mega") for i in range(40)] + \
        [(1000 + i, 1, "ok") for i in range(6)]
    banded = spark.createDataFrame(rows, "doc_id long, band int, key string")
    got = capped_bucket_pairs(banded, max_bucket=16, parallel_bucket=4)
    ref = capped_bucket_pairs(banded, max_bucket=16, parallel_bucket=None)
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_pagerank_driver_fold_row_identical(spark):
    # dangling node (z has no out-edge), a multi-edge (a->b twice),
    # and a cycle: the driver fold must match the distributed loop
    # bit-for-bit (same per-iteration rounding)
    from mms_rdf_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "c"), ("c", "a"), ("a", "z"),
         ("q", "z")],
        "src string, dst string")
    fast = pagerank(edges, iters=3)
    slow = pagerank(edges, iters=3, driver_threshold=0)
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0
    # dangling mass keeps total rank ~1
    total = fast.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-3


def test_pagerank_driver_fold_null_edges_fall_back(spark):
    # a null endpoint must not break the fast path decision
    from mms_rdf_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), (None, "c"), ("b", None)],
        "src string, dst string")
    out = pagerank(edges, iters=2)
    slow = pagerank(edges, iters=2, driver_threshold=-1)
    assert out.exceptAll(slow).count() == 0
    assert slow.exceptAll(out).count() == 0


def test_simrank_driver_fold_row_identical(spark):
    # bipartite-ish graph with a hub: fold must match the frame loop
    # bit-for-bit (integer micro-unit t sums make this deterministic)
    from mms_rdf_spark.operators.pagerank import simrank

    edges = spark.createDataFrame(
        [("c1", "n1"), ("c2", "n1"), ("c3", "n1"), ("c4", "n2"),
         ("n1", "c1"), ("n1", "c2"), ("n1", "c3"), ("n2", "c4"),
         ("n1", "r1"), ("n2", "r1")],
        "src string, dst string")
    fast = simrank(edges, iters=2)
    slow = simrank(edges, iters=2, driver_threshold=-1)
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0
    capped_f = simrank(edges, iters=2, hub_cap=2)
    capped_s = simrank(edges, iters=2, hub_cap=2, driver_threshold=-1)
    assert capped_f.exceptAll(capped_s).count() == 0
    assert capped_s.exceptAll(capped_f).count() == 0


def test_candidate_edges_fused_blocking_multi_pass_recall(spark):
    # two norms sharing ONLY the suffix bigram block must still pair
    # (the fused exploded-key join keeps both blocking passes)
    from mms_rdf_spark.operators.link import candidate_edges

    surfaces = spark.createDataFrame(
        [("Alpha-Corp", "alphacorp"), ("Alphacorpx", "alphacorpx"),
         ("Zeta corp", "zetacorp")],
        "surface string, norm string")
    edges = candidate_edges(surfaces, jaccard_threshold=0.3)
    pairs = {(r["src"], r["dst"]) for r in edges.collect()}
    # alphacorp / alphacorpx share prefix 'al' and suffix bigrams
    assert any("Alpha-Corp" in p or "Alphacorpx" in p
               for pair in pairs for p in pair)
