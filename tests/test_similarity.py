"""Similarity-search operators: exactness of the brute-force baseline,
containment properties of the approximate paths."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from mms_rdf_spark.operators.similarity import (
    cosine_topk,
    embedding_near_duplicates,
    ivf_assign,
    lsh_buckets,
    topk_lsh,
)


def _emb_df(spark, n=120, dims=16, seed=7, with_dupes=True):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dims)).astype("float32")
    if with_dupes:
        v[1] = v[0] + rng.normal(scale=1e-3, size=dims).astype("float32")
        v[3] = v[2]
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": list(map(list, v))})
    return spark.createDataFrame(pdf)


def test_cosine_topk_exact(spark):
    e = _emb_df(spark)
    got = cosine_topk(e, k=3, n_queries=4).toPandas()
    # near-identical vector 1 must be vector 0's top neighbor
    top0 = got[(got.query_id == 0) & (got["rank"] == 1)].iloc[0]
    assert top0.neighbor_id == 1 and top0.score > 0.999
    assert set(got.groupby("query_id")["rank"].max()) == {3}


def test_near_duplicates_found(spark):
    e = _emb_df(spark)
    pairs = embedding_near_duplicates(e, threshold=0.99).toPandas()
    found = {(r.a_id, r.b_id) for r in pairs.itertuples()}
    assert (0, 1) in found and (2, 3) in found
    assert all(a < b for a, b in found)


def test_lsh_buckets_group_duplicates(spark):
    e = _emb_df(spark)
    b = {r["vec_id"]: r["bucket"] for r in lsh_buckets(e).collect()}
    assert b[2] == b[3]  # identical vectors share a bucket
    assert set(len(v) for v in b.values()) == {8}


def test_topk_lsh_subset_of_bucket(spark):
    e = _emb_df(spark)
    approx = topk_lsh(e, k=3, n_queries=4, planes=2).toPandas()
    buckets = {r["vec_id"]: r["bucket"]
               for r in lsh_buckets(e, planes=2).collect()}
    for r in approx.itertuples():
        assert buckets[r.neighbor_id] == buckets[r.query_id]
        assert r.neighbor_id != r.query_id


def test_ivf_assign_picks_nearest_centroid(spark):
    e = _emb_df(spark, n=120)
    got = ivf_assign(e, every_k=40).toPandas()  # centroids 0, 40, 80
    assert set(got.centroid_id) <= {0, 40, 80}
    assert len(got) == 120
    # a centroid is its own nearest centroid with score 1
    self_row = got[got.vec_id == 40].iloc[0]
    assert self_row.centroid_id == 40 and self_row.score == 1.0


def test_cosine_topk_arrow_matches_jvm(spark):
    """The Arrow/numpy matmul formulation must be bit-identical to the
    higher-order-function plan (raw scores, F.round on both sides)."""
    from mms_rdf_spark.operators.similarity import cosine_topk_arrow

    emb = _emb_df(spark, n=200, dims=32)
    jvm = {tuple(r) for r in cosine_topk(emb).collect()}
    arrow = {tuple(r) for r in cosine_topk_arrow(emb).collect()}
    assert arrow == jvm


def test_cosine_topk_arrow_empty_queries(spark):
    """No query rows (id space starts past n_queries) -> empty result,
    like cosine_topk, never a numpy axis error."""
    from mms_rdf_spark.operators.similarity import cosine_topk_arrow

    emb = _emb_df(spark, n=20).withColumn(
        "vec_id", F.col("vec_id") + 1000)
    assert cosine_topk_arrow(emb).count() == 0
    assert cosine_topk(emb).count() == 0


def test_embedding_bucket_stats(spark):
    from mms_rdf_spark.operators.similarity import embedding_bucket_stats

    vec = [float(i % 5) + 1.0 for i in range(16)]
    emb = spark.range(40).select(
        F.col("id").cast("int").alias("vec_id"),
        F.array(*[F.lit(v) for v in vec]).alias("embedding"))
    stats = embedding_bucket_stats(emb, planes=2, max_bucket=10).collect()
    assert stats and stats[0]["width"] == 40
    assert stats[0]["n_salts"] == 4
    assert 0 < stats[0]["est_dropped_pairs"] < 40 * 39 // 2


def test_ivf_train_converges_and_improves(spark):
    """Lloyd's loop sanity: (a) trained centroids move off the seeds,
    (b) mean assignment cosine (the spherical k-means objective) is
    non-decreasing over iterations, (c) every vector stays assigned."""
    from mms_rdf_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_trained,
        ivf_train,
    )

    emb = _emb_df(spark, n=150, dims=16, with_dupes=False)
    seeded = {r["centroid_id"]: list(r["c_emb"]) for r in
              ivf_train(emb, every_k=30, iters=0).collect()}
    trained = {r["centroid_id"]: list(r["c_emb"]) for r in
               ivf_train(emb, every_k=30, iters=2).collect()}
    assert set(trained) <= set(seeded)
    assert any(seeded[c] != trained[c] for c in trained), \
        "training must move at least one centroid"

    def mean_score(iters):
        df = (ivf_assign(emb, every_k=30) if iters == 0
              else ivf_assign_trained(emb, every_k=30, iters=iters))
        assert df.count() == 150
        return df.agg(F.avg("score")).collect()[0][0]

    scores = [mean_score(i) for i in (0, 1, 2)]
    # tiny tolerance: assignments use 6-decimal rounded cosines
    assert scores[1] >= scores[0] - 1e-6
    assert scores[2] >= scores[1] - 1e-6
    assert scores[2] > scores[0], "2 iterations must beat the raw seeds"


def test_cluster_policy_differs_from_greedy_where_it_should(spark):
    """Pairs (1,3) + (2,3) with NO (1,2) pair: greedy min-id drops only
    3 (the b-side of both pairs), keeping 1 AND 2; cluster policy
    canonicalizes the whole component {1,2,3} to min id 1. The
    geometry: v1,v2,v3 = base + d*u where u3 bisects u1,u2 —
    cos(1,3)=cos(2,3)=0.93 > thr=0.85 > cos(1,2)=0.77."""
    from mms_rdf_spark.operators.curate import curate_semantic
    from mms_rdf_spark.operators.similarity import (
        embedding_near_duplicates_mb,
        neardup_clusters,
    )

    b = np.ones(16) / 4.0
    u1 = np.zeros(16); u1[0] = 1.0
    u1 -= u1.dot(b) * b; u1 /= np.linalg.norm(u1)
    u2 = np.zeros(16); u2[1] = 1.0
    u2 -= u2.dot(b) * b + u2.dot(u1) * u1; u2 /= np.linalg.norm(u2)
    u3 = (u1 + u2) / np.sqrt(2)
    d = np.sqrt(0.3)
    vecs = {1: b + d * u1, 2: b + d * u2, 3: b + d * u3}
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": list(vecs), "embedding": [list(v) for v in vecs.values()]}))
    pairs = {(r["a_id"], r["b_id"]) for r in embedding_near_duplicates_mb(
        emb, threshold=0.85, planes=2, bands=2).collect()}
    assert pairs == {(1, 3), (2, 3)}, pairs

    clusters = {r["vec_id"]: r["cluster_id"] for r in
                neardup_clusters(emb, threshold=0.85, planes=2,
                                 bands=2).collect()}
    assert clusters == {1: 1, 2: 1, 3: 1}

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(vecs),
        "text": [f"the of to in is it doc {i}" for i in vecs]}))
    greedy = {r["doc_id"] for r in curate_semantic(
        docs, emb, sim_threshold=0.85, planes=2, bands=2).collect()}
    cluster = {r["doc_id"] for r in curate_semantic(
        docs, emb, sim_threshold=0.85, planes=2, bands=2,
        policy="cluster").collect()}
    assert greedy == {1, 2}
    assert cluster == {1}, "exactly one survivor per semantic cluster"


def test_ivf_broadcast_fold_matches_static(spark):
    """The distributed (crossJoin-broadcast argmax) fold must be
    row-identical to the driver-folded static path — same rounded
    cosine, same min-id tie rule — for both training and assignment
    (NOTES round-3 limitation: the static fold stops scaling past
    ~10^5 k*dims, so the broadcast path must be a drop-in)."""
    from mms_rdf_spark.operators.similarity import (
        ivf_assign_trained,
        ivf_train,
    )

    emb = _emb_df(spark, n=150, dims=16, with_dupes=False)
    t_static = {r["centroid_id"]: list(r["c_emb"]) for r in
                ivf_train(emb, every_k=30, iters=2).collect()}
    t_bcast = {r["centroid_id"]: list(r["c_emb"]) for r in
               ivf_train(emb, every_k=30, iters=2,
                         fold="broadcast").collect()}
    assert t_static == t_bcast

    a_static = {tuple(r) for r in
                ivf_assign_trained(emb, every_k=30, iters=2).collect()}
    a_bcast = {tuple(r) for r in
               ivf_assign_trained(emb, every_k=30, iters=2,
                                  fold="broadcast").collect()}
    assert a_static == a_bcast


def test_ivf_broadcast_fold_plan_has_no_collect_side_shuffle(spark):
    """The broadcast assign must plan as BroadcastNestedLoopJoin (tiny
    broadcast centroid side) + partial/final HashAggregate — no
    SortMergeJoin and no window sort over the n*k candidate rows."""
    from mms_rdf_spark.operators.similarity import (
        _as_double,
        _broadcast_argmax,
    )

    emb = _emb_df(spark, n=60, dims=8, with_dupes=False)
    e = emb.select("vec_id", _as_double(F.col("embedding")).alias("emb"))
    cents = (e.where(F.col("vec_id") % 20 == 0)
             .select(F.col("vec_id").alias("centroid_id"),
                     F.col("emb").alias("c_emb")))
    plan = _broadcast_argmax(e, cents) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Window" not in plan, plan


def test_pq_training_reduces_reconstruction_distance(spark):
    """Lloyd's per subspace must not worsen the quantization: mean
    encode distance after 1 iteration <= seeds-only (iters=0), and
    every (vec, subspace) gets exactly one code from that subspace's
    codebook."""
    import pytest

    from mms_rdf_spark.operators.similarity import pq_encode, pq_train

    emb = _emb_df(spark, n=150, dims=16, with_dupes=False)

    def mean_dist(iters):
        df = pq_encode(emb, m=4, every_k=30, iters=iters)
        assert df.count() == 150 * 4
        return df.agg(F.avg("dist")).collect()[0][0]

    assert mean_dist(1) <= mean_dist(0) + 1e-6
    books = pq_train(emb, m=4, every_k=30, iters=1)
    codes = pq_encode(emb, m=4, every_k=30, iters=1)
    valid = {(r["subspace"], r["centroid_id"]) for r in books.collect()}
    assert all((r["subspace"], r["code"]) in valid
               for r in codes.collect())
    with pytest.raises(ValueError):
        pq_train(emb, m=5)  # 16 dims not divisible


def test_standardize_zero_mean_unit_std_per_dim(spark):
    from mms_rdf_spark.operators.similarity import standardize_embeddings

    emb = _emb_df(spark, n=200, dims=8, with_dupes=False)
    z = standardize_embeddings(emb)
    stats = (z.groupBy("dim")
             .agg(F.avg("z").alias("m"), F.stddev_pop("z").alias("s"))
             .collect())
    assert len(stats) == 8
    for r in stats:
        assert abs(r["m"]) < 1e-3          # centered
        assert abs(r["s"] - 1.0) < 1e-2    # unit variance (round-4 z)


def test_mean_pool_exact_centroids(spark):
    from mms_rdf_spark.operators.similarity import mean_pool
    embs = spark.createDataFrame(
        [(1, [1.0, 2.0], "a"), (2, [3.0, 4.0], "a"),
         (3, [10.0, 20.0], "b")],
        "vec_id long, embedding array<float>, label string")
    got = {(r["label"], r["dim"]): (r["n"], r["mean"])
           for r in mean_pool(embs).collect()}
    assert got[("a", 0)] == (2, 2.0)
    assert got[("a", 1)] == (2, 3.0)
    assert got[("b", 0)] == (1, 10.0)
    assert got[("b", 1)] == (1, 20.0)


def test_mmr_diversifies_near_duplicates(spark):
    from mms_rdf_spark.operators.similarity import mmr_select
    # query [1,0]; two near-identical highly relevant vectors and one
    # diverse vector. With a diversity-heavy lambda the near-dup twin
    # (sim ~0.9996 to the first pick) must lose to the diverse one:
    # score2 = .3*.985 - .7*.9996 = -.404 < score3 = .3*.498 - .7*.615
    rows = [(0, [1.0, 0.0]),
            (1, [0.99, 0.14]),   # rel ~0.99
            (2, [0.98, 0.17]),   # near-dup of 1
            (3, [0.5, 0.87])]    # diverse, rel ~0.5
    embs = spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>")
    got = [r["vec_id"] for r in
           mmr_select(embs, query_id=0, n_candidates=3, k=2,
                      lam=0.3).orderBy("rank").collect()]
    assert got == [1, 3]


def test_mmr_lambda_one_is_pure_relevance(spark):
    from mms_rdf_spark.operators.similarity import mmr_select
    rows = [(0, [1.0, 0.0]), (1, [0.99, 0.14]), (2, [0.98, 0.17]),
            (3, [0.5, 0.87])]
    embs = spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>")
    got = [r["vec_id"] for r in
           mmr_select(embs, query_id=0, n_candidates=3, k=3,
                      lam=1.0).orderBy("rank").collect()]
    assert got == [1, 2, 3]  # relevance order, no diversity penalty


def test_top_component_recovers_dominant_axis(spark):
    from mms_rdf_spark.operators.similarity import top_component
    # variance concentrated on dim 0 (values +-1), noise on dim 1
    rows = [(i, [1.0 if i % 2 == 0 else -1.0, 0.01 * (i % 3 - 1)])
            for i in range(40)]
    embs = spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>")
    got = {r["dim"]: r["weight"] for r in top_component(embs).collect()}
    assert abs(got[0]) == 1.0        # dominant axis, max-normalized
    assert abs(got[1]) < 0.05        # noise axis nearly orthogonal


def test_top_component_deterministic(spark):
    from mms_rdf_spark.operators.similarity import top_component
    rows = [(i, [float(i % 5), float((i * 3) % 7), 1.0])
            for i in range(30)]
    embs = spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>")
    a = sorted(map(tuple, top_component(embs).collect()))
    b = sorted(map(tuple, top_component(embs).collect()))
    assert a == b


def test_project_component_orders_along_axis(spark):
    from mms_rdf_spark.operators.similarity import (
        project_component,
        top_component,
    )
    rows = [(i, [float(i) - 2.0, 0.0]) for i in range(5)]
    embs = spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>")
    comp = top_component(embs)
    got = {r["vec_id"]: r["score"]
           for r in project_component(embs, comp).collect()}
    # scores are monotone in the dominant coordinate
    order = [k for k, _ in sorted(got.items(), key=lambda kv: kv[1])]
    assert order == [0, 1, 2, 3, 4] or order == [4, 3, 2, 1, 0]


def test_mmr_batched_matches_sequential(spark):
    """mmr_select_batched must agree with mmr_select pick-for-pick and
    score-for-score (it is the same greedy, batched with a certified
    lazy accept) — on a generic corpus, on a near-duplicate-heavy
    corpus, and at k=20 — while using FEWER distributed rounds than
    the k the sequential version pays (round-3 verdict #5)."""
    from mms_rdf_spark.operators.similarity import (mmr_select,
                                                    mmr_select_batched)

    cases = [
        dict(embs=_emb_df(spark), n_candidates=20, k=5, lam=0.7),
        dict(embs=_emb_df(spark), n_candidates=40, k=20, lam=0.5),
        # adversarial: many identical vectors -> massive score ties
        dict(embs=_emb_df(spark, n=30, with_dupes=True), n_candidates=20,
             k=8, lam=0.3),
    ]
    for c in cases:
        embs = c.pop("embs")
        want = [tuple(r) for r in
                mmr_select(embs, query_id=0, **c)
                .orderBy("rank").collect()]
        stats = {}
        got = [tuple(r) for r in
               mmr_select_batched(embs, query_id=0, stats=stats, **c)
               .orderBy("rank").collect()]
        assert got == want, (c, got, want)
        assert stats["rounds"] < c["k"], (c, stats)


def test_mmr_batched_identical_vectors_ties(spark):
    """All-identical corpus: every score ties, so the certified accept
    must fall back to vec_id order exactly like the sequential greedy."""
    from mms_rdf_spark.operators.similarity import (mmr_select,
                                                    mmr_select_batched)

    rows = [(i, [1.0, 2.0, 3.0]) for i in range(25)]
    embs = spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>")
    kw = dict(query_id=0, n_candidates=15, k=6, lam=0.7)
    want = [tuple(r) for r in mmr_select(embs, **kw).orderBy("rank").collect()]
    got = [tuple(r) for r in
           mmr_select_batched(embs, **kw).orderBy("rank").collect()]
    assert got == want


def test_silhouette_separable_clusters_score_high(spark):
    from mms_rdf_spark.operators.similarity import silhouette_simplified

    # two tight orthogonal clusters; centroids at vec_id 0 and 10
    rows = []
    for i in range(10):
        rows.append((i, [10.0, float(i % 3), 0.0]))
        rows.append((10 + i, [0.0, float(i % 3), 10.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.centroid_id: r for r in
           silhouette_simplified(emb, every_k=10).collect()}
    assert set(out) == {0, 10}
    assert out[0].n == 10 and out[10].n == 10
    assert out[0].mean_s > 0.5 and out[10].mean_s > 0.5
    # exact-integer invariant: mean reconstructs from the micro sum
    assert out[0].mean_s == round(out[0].s_sum_micro / 1e6 / out[0].n, 6)


def test_silhouette_identical_centroids_scores_zero(spark):
    from mms_rdf_spark.operators.similarity import silhouette_simplified

    # both centroids are the SAME direction: a == b for every point
    # -> s == 0 everywhere (and max(a,b)==0 for the centroid itself)
    rows = [(0, [1.0, 0.0]), (10, [2.0, 0.0]),
            (1, [1.0, 1.0]), (11, [0.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = silhouette_simplified(emb, every_k=10).collect()
    assert all(r.s_sum_micro == 0 for r in out)
